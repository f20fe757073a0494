"""Per-stage timing spans — the instrumentation surface of the reference's
[Timing] log line (ref src/estimator/estimator.rs:108-122, 252-259), plus an
optional bridge to jax.profiler traces.

Usage:
    with profiling.span("patch_tracking"):
        ...
    log.debug(profiling.report())   # "patch_tracking 3.2ms | ..."
"""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict

_current: "OrderedDict[str, float]" = OrderedDict()


@contextlib.contextmanager
def span(name: str):
    t0 = time.time()
    try:
        yield
    finally:
        _current[name] = (time.time() - t0) * 1000.0


def report() -> str:
    out = " | ".join(f"{k} {v:.1f}ms" for k, v in _current.items())
    _current.clear()
    return out


@contextlib.contextmanager
def jax_trace(logdir: str):
    """Wrap a region in a jax.profiler trace (TensorBoard-viewable)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
