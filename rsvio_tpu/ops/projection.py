"""Reprojection residuals + analytic Jacobians shared by PnP and BA.

Capability parity (SURVEY.md §2 #16 — ref src/optimization/factors.rs):
  * residual r = proj_normalized(T_C_B · T_B_W · p_W) − obs  (2-vector,
    observations in undistorted normalized camera coordinates)
  * analytic Jacobians w.r.t. the landmark (2x3) and the pose (2x6, split
    parameterization: additive translation, right-multiplied rotation
    perturbation) matching ref factors.rs:412-445
  * cheirality guard: a point behind the camera contributes a constant large
    residual with zero Jacobian (ref factors.rs:391-403)
  * Huber robust loss δ=2.0 on every block (ref sliding_window.rs:295-296)

All functions are per-observation; callers vmap over (window × camera ×
landmark) so the whole linearization is one batched XLA computation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .lie import so3_hat

CHEIRALITY_RESIDUAL = 1e3  # bounded stand-in for the reference's 1e6 sentinel


class Linearization(NamedTuple):
    r: jnp.ndarray        # (2,) whitened residual (sqrt-Huber applied)
    J_pose: jnp.ndarray   # (2, 6) whitened d r / d [dt, dw] of T_B_W
    J_lm: jnp.ndarray     # (2, 3) whitened d r / d p_W
    valid: jnp.ndarray    # () bool — in front of camera and mask passed
    cost: jnp.ndarray     # () robust cost contribution rho(||r||^2)


def proj_jacobian(p_cam):
    """d(x/z, y/z)/d p_cam — the 2x3 pinhole Jacobian (ref factors.rs:136-139)."""
    x, y, z = p_cam[0], p_cam[1], p_cam[2]
    z_safe = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    iz = 1.0 / z_safe
    iz2 = iz * iz
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([iz, zero, -x * iz2]),
        jnp.stack([zero, iz, -y * iz2]),
    ])


def huber_weight(r_sq, delta: float):
    """IRLS weight for the Huber loss: 1 inside delta, delta/||r|| outside."""
    r_norm = jnp.sqrt(jnp.maximum(r_sq, 1e-18))
    return jnp.where(r_norm <= delta, jnp.ones_like(r_norm), delta / r_norm)


def huber_cost(r_sq, delta: float):
    """Huber rho(||r||): 0.5||r||^2 inside, delta(||r|| - 0.5 delta) outside."""
    r_norm = jnp.sqrt(jnp.maximum(r_sq, 1e-18))
    return jnp.where(r_norm <= delta, 0.5 * r_sq, delta * (r_norm - 0.5 * delta))


def linearize_projection(T_C_B, T_B_W, p_W, obs, mask, huber_delta: float = 2.0):
    """Linearize one reprojection observation.

    Args:
      T_C_B: (4,4) camera-from-body extrinsic.
      T_B_W: (4,4) body-from-world pose (the solver variable).
      p_W: (3,) world landmark.
      obs: (2,) observed normalized coords.
      mask: () bool observation validity.
      huber_delta: Huber threshold in normalized units.

    Returns Linearization with sqrt-Huber-whitened residual and Jacobians.
    """
    R_B_W = T_B_W[:3, :3]
    p_B = R_B_W @ p_W + T_B_W[:3, 3]
    R_C_B = T_C_B[:3, :3]
    p_C = R_C_B @ p_B + T_C_B[:3, 3]

    in_front = p_C[2] > 1e-6
    valid = mask & in_front
    z_safe = jnp.where(in_front, p_C[2], 1.0)
    proj = jnp.stack([p_C[0] / z_safe, p_C[1] / z_safe])
    r = proj - obs
    # Cheirality: behind-camera observation -> constant penalty, zero Jacobian
    # (ref factors.rs:391-403). Masked-out observations contribute nothing.
    r = jnp.where(in_front, r, jnp.full_like(r, CHEIRALITY_RESIDUAL))
    r = jnp.where(mask, r, jnp.zeros_like(r))

    Jpi = proj_jacobian(p_C)                       # (2,3)
    J_t = Jpi @ R_C_B                              # (2,3) d r / d t_B_W
    J_w = Jpi @ (R_C_B @ R_B_W @ (-so3_hat(p_W)))  # (2,3) d r / d omega
    J_pose = jnp.concatenate([J_t, J_w], axis=1)   # (2,6)
    J_lm = Jpi @ (R_C_B @ R_B_W)                   # (2,3)

    validf = valid.astype(r.dtype)
    r_sq = jnp.dot(r, r) * jnp.where(mask, 1.0, 0.0)
    w = huber_weight(r_sq, huber_delta)
    sw = jnp.sqrt(w) * validf
    cost = huber_cost(r_sq, huber_delta) * mask.astype(r.dtype)

    return Linearization(
        r=r * sw,
        J_pose=J_pose * sw,
        J_lm=J_lm * sw,
        valid=valid,
        cost=cost,
    )


def projection_cost(T_C_B, T_B_W, p_W, obs, mask, huber_delta: float = 2.0):
    """Robust cost of one observation (for LM accept/reject) — must agree with
    the cost field of linearize_projection."""
    p_B = T_B_W[:3, :3] @ p_W + T_B_W[:3, 3]
    p_C = T_C_B[:3, :3] @ p_B + T_C_B[:3, 3]
    in_front = p_C[2] > 1e-6
    z_safe = jnp.where(in_front, p_C[2], 1.0)
    proj = jnp.stack([p_C[0] / z_safe, p_C[1] / z_safe])
    r = proj - obs
    r = jnp.where(in_front, r, jnp.full_like(r, CHEIRALITY_RESIDUAL))
    r_sq = jnp.dot(r, r)
    return huber_cost(r_sq, huber_delta) * mask.astype(r.dtype)


def triangulate_stereo(T_W_Cl, T_W_Cr, xy_l, xy_r):
    """Midpoint triangulation of one landmark from a stereo pair of
    normalized-coordinate observations. Returns (p_W, valid).

    This upgrades the reference's fixed-depth-2.0 landmark initialization
    (ref src/estimator/sliding_window.rs:248-271, marked TODO: triangulate).
    Least-squares midpoint of the two viewing rays; valid requires the rays to
    be non-parallel and the point to be in front of both cameras.
    """
    o1, o2 = T_W_Cl[:3, 3], T_W_Cr[:3, 3]
    d1 = T_W_Cl[:3, :3] @ jnp.concatenate([xy_l, jnp.ones_like(xy_l[:1])])
    d2 = T_W_Cr[:3, :3] @ jnp.concatenate([xy_r, jnp.ones_like(xy_r[:1])])
    d1 = d1 / jnp.maximum(jnp.linalg.norm(d1), 1e-9)
    d2 = d2 / jnp.maximum(jnp.linalg.norm(d2), 1e-9)
    # Solve [d1 -d2][s; t] = o2 - o1 in least squares (2x2 normal equations).
    a = jnp.dot(d1, d1)
    b = jnp.dot(d1, d2)
    c = jnp.dot(d2, d2)
    rhs = o2 - o1
    det = a * c - b * b
    det_safe = jnp.where(jnp.abs(det) > 1e-9, det, 1e-9)
    s = (c * jnp.dot(d1, rhs) - b * jnp.dot(d2, rhs)) / det_safe
    t = (b * jnp.dot(d1, rhs) - a * jnp.dot(d2, rhs)) / det_safe
    p = 0.5 * ((o1 + s * d1) + (o2 + t * d2))
    valid = (jnp.abs(det) > 1e-6) & (s > 1e-3) & (t > 1e-3)
    return p, valid
