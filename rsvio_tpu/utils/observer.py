"""Solver iteration observer: renders per-iteration LM metrics as a TSV
table — capability parity with the reference's TerminalObserver
(ref src/optimization/observer.rs:21-68: cost / damping / step-norm /
step-quality rows with a static header).

The metrics themselves are recorded on device by the solvers
(models.ba.BAResult.metrics); this module is pure host-side formatting.
"""

from __future__ import annotations

import numpy as np

HEADER = "iter\tcost\t\tlambda\t\tstep_norm\taccepted"


def format_metrics(metrics, iterations: int | None = None) -> str:
    """Render (max_iters, 4) [cost, lambda, step_norm, accepted] rows."""
    m = np.asarray(metrics)
    n = int(iterations) if iterations is not None else m.shape[0]
    lines = [HEADER]
    for i in range(min(n, m.shape[0])):
        cost, lam, step, acc = m[i]
        lines.append(f"{i}\t{cost:.6e}\t{lam:.3e}\t{step:.3e}\t"
                     f"{'yes' if acc > 0 else 'no'}")
    return "\n".join(lines)


def print_metrics(metrics, iterations: int | None = None) -> None:
    print(format_metrics(metrics, iterations))
