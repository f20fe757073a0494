"""Matmul-precision setup for TPU runs.

TPU matmuls truncate f32 inputs to bfloat16 by default. The estimator's
numerics — triangulation back-substitution, J^T J normal equations, Lie
retraction chains — lose enough precision under that default to corrupt the
solution (measured on a v5e chip: the synthetic e2e drifts 32% of traveled
distance with default-precision matmuls, 5% with fp32 matmuls; CPU f32 runs
of the identical code are exact to 0.0%). Every matmul in this pipeline is
tiny and latency-bound, so full-precision accumulation costs nothing
measurable.

This lives in a function (called by every entry point: CLI, bench, examples,
tools, the graft entry) instead of a package-import side effect so that
merely importing rsvio_tpu as a library never mutates process-global JAX
configuration for the embedding application.
"""

from __future__ import annotations

import os


def ensure_matmul_precision() -> None:
    """Set jax_default_matmul_precision to "highest" unless the embedding
    application already chose a value (non-None) or RSVIO_MATMUL_PRECISION
    is set to "default" (which keeps the raw hardware behavior)."""
    import jax

    prec = os.environ.get("RSVIO_MATMUL_PRECISION", "highest")
    if prec != "default" and jax.config.jax_default_matmul_precision is None:
        jax.config.update("jax_default_matmul_precision", prec)
