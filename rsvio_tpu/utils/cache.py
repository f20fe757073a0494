"""Persistent XLA compilation cache.

First compiles of the fused estimator step take tens of seconds (and go
through a remote compile service in some environments); the persistent cache
makes every later process start near-instant for unchanged programs. Called
by all entry points (CLI, bench, examples).
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "RSVIO_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Persist EVERY executable: under the remote (axon) compile service
        # even a trivial op costs a ~0.4 s round trip, so the default
        # min-compile-time threshold would re-pay dozens of RTTs per cold
        # process start (measured: startup 70 -> ~30 s once the small ops
        # hit the cache).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass  # cache is an optimization; never fatal
