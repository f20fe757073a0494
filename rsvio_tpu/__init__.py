"""rsvio_tpu — a TPU-native stereo visual(-inertial) odometry engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
RS-VIO system (see SURVEY.md): multi-scale patch-based KLT feature tracking,
stereo matching, PnP motion tracking, keyframe selection, sliding-window bundle
adjustment with Schur-complement reduction, IMU preintegration, and a
distributed multi-chip BA mode — all expressed as pure functions over
fixed-shape device arrays so the whole per-frame step jit-compiles once.

Layout:
  ops/       device math: Lie groups, camera models, image sampling, pyramids,
             KLT patch tracking, feature detection, Pallas kernels
  models/    estimator logic: frontend tracker state machine, PnP, sliding
             window BA, IMU preintegration, per-frame estimator step
  parallel/  device meshes + sharded (multi-chip) bundle adjustment
  data/      dataset players (EuRoC / TUM-VI / 4Seasons), async prefetch
  utils/     config, timing, trajectory export + ATE evaluation
  viewers/   visualization (rerun SDK when available, no-op otherwise)
  cli/       command-line entry points per dataset
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# TPU matmuls truncate f32 inputs to bfloat16 by default. The estimator's
# numerics — triangulation back-substitution, J^T J normal equations, Lie
# retraction chains — lose enough precision under that default to corrupt
# the solution (measured on a v5e chip: the synthetic e2e drifts 32% of
# traveled distance with default-precision matmuls, 5% with fp32 matmuls;
# CPU f32 runs of the identical code are exact to 0.0%). Every matmul in
# this pipeline is tiny and latency-bound, so full-precision accumulation
# costs nothing measurable. Override with RSVIO_MATMUL_PRECISION=default
# to get the raw hardware behavior back. An explicit setting made by the
# embedding application BEFORE this import (jax_default_matmul_precision
# non-None) is respected and left untouched.
_prec = _os.environ.get("RSVIO_MATMUL_PRECISION", "highest")
if _prec != "default" and _jax.config.jax_default_matmul_precision is None:
    _jax.config.update("jax_default_matmul_precision", _prec)
