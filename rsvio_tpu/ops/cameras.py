"""Camera models: pinhole-radtan (OpenCV 5-coeff) and EUCM — pure jax.numpy.

Capability parity: the reference delegates to the external crate
`camera-intrinsic-model` (OpenCVModel5.unproject_one iterative undistortion,
EUCM closed-form unprojection — SURVEY.md §2.3, used at ref
src/estimator/frame.rs:107-134 and src/datasets/mod.rs:93-160). Here both
models are implemented natively as vmappable functions:

  project(params, p_cam[3]) -> (uv[2], valid)
  unproject(params, uv[2])  -> normalized camera coords (x, y) at z=1

Parameter packing (fixed width 10 so both models share one array layout and a
stereo pair is a single (2, 10) array):
  pinhole-radtan: [fx, fy, cx, cy, k1, k2, p1, p2, k3, 0]
  EUCM:           [fx, fy, cx, cy, alpha, beta, 0, 0, 0, 0]

The model kind is a static Python string at trace time (per-config constant),
so jit specializes without runtime dispatch.
"""

from __future__ import annotations

import jax.numpy as jnp

PINHOLE_RADTAN = "pinhole-radtan"
EUCM = "eucm"

PARAM_WIDTH = 10

# Iterations of fixed-point radtan undistortion. OpenCV's undistortPoints uses
# 5 by default; 8 converges to <1e-6 normalized units for EuRoC-level distortion.
_UNDISTORT_ITERS = 8


def pack_params(kind: str, intrinsics, distortion, dtype=jnp.float32):
    """Build a (PARAM_WIDTH,) parameter vector from config-style lists.

    (mirrors the defaulting behavior of ref src/datasets/mod.rs:101-160:
    missing distortion entries default to 0)
    """
    kind = kind.lower()
    p = [0.0] * PARAM_WIDTH
    p[:4] = [float(v) for v in intrinsics[:4]]
    d = [float(v) for v in distortion]
    if kind in (EUCM,):
        # [alpha, beta]
        p[4] = d[0] if len(d) > 0 else 0.5
        p[5] = d[1] if len(d) > 1 else 1.0
    else:
        # [k1, k2, p1, p2, k3]
        for i in range(min(5, len(d))):
            p[4 + i] = d[i]
    return jnp.asarray(p, dtype=dtype)


# ---------------------------------------------------------------------------
# pinhole-radtan (OpenCV model5)
# ---------------------------------------------------------------------------

def _radtan_distort(params, xy):
    """Apply radial-tangential distortion to normalized coords (x, y)."""
    k1, k2, p1, p2, k3 = params[4], params[5], params[6], params[7], params[8]
    x, y = xy[0], xy[1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd])


def radtan_project(params, p_cam):
    """3D camera-frame point -> pixel. valid = z > small positive."""
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    z = p_cam[2]
    valid = z > 1e-6
    z_safe = jnp.where(valid, z, 1.0)
    xy = jnp.stack([p_cam[0] / z_safe, p_cam[1] / z_safe])
    xd = _radtan_distort(params, xy)
    uv = jnp.stack([fx * xd[0] + cx, fy * xd[1] + cy])
    return uv, valid


def radtan_unproject(params, uv):
    """Pixel -> normalized camera coords at z=1 via fixed-point undistortion.

    x_{n+1} = (x_dist - tangential(x_n)) / radial(x_n); a fixed iteration count
    keeps the op jit-static (the reference's external crate iterates to
    tolerance — fixed 8 iterations reaches the same answer for real lenses).
    """
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    k1, k2, p1, p2, k3 = params[4], params[5], params[6], params[7], params[8]
    xd = (uv[0] - cx) / fx
    yd = (uv[1] - cy) / fy
    x, y = xd, yd
    for _ in range(_UNDISTORT_ITERS):
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (xd - dx) / radial
        y = (yd - dy) / radial
    return jnp.stack([x, y])


# ---------------------------------------------------------------------------
# EUCM (Extended Unified Camera Model)
# ---------------------------------------------------------------------------

def eucm_project(params, p_cam):
    """EUCM projection: d = sqrt(beta (x^2+y^2) + z^2); den = alpha d + (1-alpha) z."""
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    alpha, beta = params[4], params[5]
    x, y, z = p_cam[0], p_cam[1], p_cam[2]
    d = jnp.sqrt(beta * (x * x + y * y) + z * z)
    den = alpha * d + (1.0 - alpha) * z
    # Validity: den > 0 and point in front of the model's viable region.
    # w = alpha/(1-alpha) for alpha<=0.5 else (1-alpha)/alpha; valid if z > -w*d
    w = jnp.where(alpha <= 0.5, alpha / jnp.maximum(1.0 - alpha, 1e-6),
                  (1.0 - alpha) / jnp.maximum(alpha, 1e-6))
    valid = jnp.logical_and(den > 1e-6, z > -w * d)
    den_safe = jnp.where(den > 1e-6, den, 1.0)
    uv = jnp.stack([fx * x / den_safe + cx, fy * y / den_safe + cy])
    return uv, valid


def eucm_unproject(params, uv):
    """Closed-form EUCM unprojection -> normalized coords at z=1."""
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    alpha, beta = params[4], params[5]
    mx = (uv[0] - cx) / fx
    my = (uv[1] - cy) / fy
    r2 = mx * mx + my * my
    gamma = 1.0 - alpha
    inner = 1.0 - (2.0 * alpha - 1.0) * beta * r2
    inner = jnp.maximum(inner, 1e-9)
    mz = (1.0 - beta * alpha * alpha * r2) / (alpha * jnp.sqrt(inner) + gamma)
    mz_safe = jnp.where(jnp.abs(mz) > 1e-9, mz, 1e-9)
    return jnp.stack([mx / mz_safe, my / mz_safe])


# ---------------------------------------------------------------------------
# Static dispatch
# ---------------------------------------------------------------------------

def project(kind: str, params, p_cam):
    """(uv, valid) for a 3D camera-frame point. `kind` is trace-time static."""
    if kind.lower() == EUCM:
        return eucm_project(params, p_cam)
    return radtan_project(params, p_cam)


def unproject(kind: str, params, uv):
    """Pixel -> normalized coords (x, y) at z=1. `kind` is trace-time static."""
    if kind.lower() == EUCM:
        return eucm_unproject(params, uv)
    return radtan_unproject(params, uv)


def project_normalized(p_cam):
    """Pure pinhole normalization (x/z, y/z) with cheirality validity —
    the projection used inside the optimizer (ref src/optimization/factors.rs:136)."""
    z = p_cam[2]
    valid = z > 1e-6
    z_safe = jnp.where(valid, z, 1.0)
    return jnp.stack([p_cam[0] / z_safe, p_cam[1] / z_safe]), valid
