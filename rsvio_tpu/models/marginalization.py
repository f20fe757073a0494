"""Marginalization: when the oldest keyframe leaves the sliding window, its
constraints are absorbed into a dense Gaussian prior over the remaining
states instead of being dropped.

Greenfield capability (BASELINE.json config 4): the reference evicts FIFO
with no marginalization and explicitly warns about the resulting drift
(ref README.md:79 "Don't expect large-scale accuracy until proper
marginalization is implemented"; FIFO eviction at ref
src/estimator/sliding_window.rs:73-79).

Scheme (standard SLAM marginalization):
  Given the linearized system H dx = -g over states [x_m (marginalized),
  x_r (remaining)] at linearization point x0:

      H = [H_mm  H_mr]   g = [g_m]
          [H_rm  H_rr]       [g_r]

  the marginal over x_r is a quadratic prior with
      H_prior = H_rr - H_rm H_mm^-1 H_mr
      g_prior = g_r  - H_rm H_mm^-1 g_m
  applied at future iterates as  H_prior (x ⊟ x0_r) + g_prior  added to the
  gradient and H_prior added to the Hessian (first-order prior, FEJ-style:
  the linearization point x0_r is frozen).

All shapes are static: the prior is a dense (W·B)² matrix over the whole
window with zero blocks where no prior information exists; rolling the window
shifts the prior blocks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import lie


class MargPrior(NamedTuple):
    """Gaussian prior over the window states (block layout (W, W, B, B))."""
    H: jnp.ndarray        # (W*B, W*B)
    g: jnp.ndarray        # (W*B,)
    # Linearization point: poses stored as T_W_B (W,4,4); extra state rows
    # (velocity/bias for VIO) as (W, B-6) flat values.
    T0: jnp.ndarray       # (W,4,4)
    x0_extra: jnp.ndarray  # (W, B-6)
    valid: jnp.ndarray    # () bool — no prior yet when False


def empty_prior(W: int, B: int, dtype=jnp.float32) -> MargPrior:
    return MargPrior(
        H=jnp.zeros((W * B, W * B), dtype=dtype),
        g=jnp.zeros((W * B,), dtype=dtype),
        T0=jnp.broadcast_to(jnp.eye(4, dtype=dtype), (W, 4, 4)),
        x0_extra=jnp.zeros((W, max(B - 6, 0)), dtype=dtype),
        valid=jnp.asarray(False),
    )


def state_boxminus(T_W_B, extra, prior: MargPrior):
    """dx = x ⊟ x0 in the same tangent convention as the solvers (split
    retraction on T_B_W: translation additive, rotation right-multiplied).

    Returns (W, B) increments.
    """
    def one(T, T0):
        Tb = lie.se3_inverse(T)
        Tb0 = lie.se3_inverse(T0)
        dt = Tb[:3, 3] - Tb0[:3, 3]
        dw = lie.so3_log(Tb0[:3, :3].T @ Tb[:3, :3])
        return jnp.concatenate([dt, dw])

    d_pose = jax.vmap(one)(T_W_B, prior.T0)           # (W,6)
    d_extra = extra - prior.x0_extra                   # (W,B-6)
    return jnp.concatenate([d_pose, d_extra], axis=1)


def prior_terms(prior: MargPrior, T_W_B, extra):
    """(H_add (W*B,W*B), g_add (W*B,), cost) to inject into an LM iteration."""
    W = T_W_B.shape[0]
    B = prior.H.shape[0] // W
    dx = state_boxminus(T_W_B, extra, prior).reshape(W * B)
    validf = prior.valid.astype(prior.H.dtype)
    H = prior.H * validf
    g = (prior.g + prior.H @ dx) * validf
    cost = (0.5 * dx @ prior.H @ dx + prior.g @ dx) * validf
    return H, g, cost


def marginalize_oldest(H_full, g_full, T_W_B, extra, prior_in: MargPrior,
                       B: int, eps: float = 1e-5) -> MargPrior:
    """Absorb state 0 of a linearized window system into a new prior and
    shift the result down one slot (matching the window roll).

    Args:
      H_full: (W*B, W*B) full linearized Hessian INCLUDING the current prior.
      g_full: (W*B,) gradient at the linearization point (dx = 0).
      T_W_B, extra: the linearization point (current window states).
      prior_in: used only for dtype/shape.
      eps: RELATIVE ridge on the marginalized block, scaled by the largest
        diagonal entry of H_mm. An absolute ridge is meaningless here: H_mm
        entries reach O(1e5) (whitened IMU Jacobians are O(1e2), squared),
        so a fixed 1e-8 leaves an effective condition number ~1e13 — far
        beyond f32 (2^-24) — and the Schur complement amplifies last-bit
        noise into percent-level prior differences (this was the round-2
        distributed-parity killer AND destabilized the marginalized-VIO
        accuracy). The relative ridge bounds cond(H_mm) near 1/eps; it only
        WEAKENS the prior along weakly-determined directions — exactly where
        the first-order FEJ approximation is least trustworthy.
    Returns the new MargPrior over the rolled window (last slot empty).
    """
    WB = H_full.shape[0]
    W = WB // B
    dtype = H_full.dtype
    mm_scale = jnp.maximum(jnp.max(jnp.abs(jnp.diag(H_full[:B, :B]))), 1.0)
    H_mm = H_full[:B, :B] + (eps * mm_scale) * jnp.eye(B, dtype=dtype)
    H_mr = H_full[:B, B:]
    H_rr = H_full[B:, B:]
    g_m = g_full[:B]
    g_r = g_full[B:]
    # Solve H_mm^-1 via Cholesky (PSD by construction + eps)
    cho = jax.scipy.linalg.cho_factor(H_mm, lower=True)
    X = jax.scipy.linalg.cho_solve(cho, H_mr)          # H_mm^-1 H_mr
    H_p = H_rr - H_mr.T @ X
    g_p = g_r - X.T @ g_m
    # Symmetrize against roundoff.
    H_p = 0.5 * (H_p + H_p.T)
    # Ridge regularization: the marginal information has exact null
    # directions (global gauge); f32 roundoff leaks gradient into them,
    # which would let LM march the whole window along the gauge "downhill"
    # forever. A small relative ridge bounds the prior quadratic.
    scale = jnp.maximum(jnp.max(jnp.abs(jnp.diag(H_p))), 1.0)
    H_p = H_p + (1e-5 * scale) * jnp.eye(H_p.shape[0], dtype=dtype)

    # Place into a full-window container: slots 0..W-2 get the prior, the new
    # (incoming) slot W-1 has no prior information.
    H_out = jnp.zeros((W * B, W * B), dtype=dtype)
    H_out = H_out.at[: (W - 1) * B, : (W - 1) * B].set(H_p)
    g_out = jnp.zeros((W * B,), dtype=dtype)
    g_out = g_out.at[: (W - 1) * B].set(g_p)

    T0 = jnp.concatenate([T_W_B[1:], T_W_B[-1:]], axis=0)
    x0e = jnp.concatenate([extra[1:], extra[-1:]], axis=0)
    return MargPrior(H=H_out, g=g_out, T0=T0, x0_extra=x0e,
                     valid=jnp.asarray(True))
