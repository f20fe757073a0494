"""Distributed visual-inertial BA: landmark-sharded Schur reduction with
replicated IMU factors over a device mesh.

Extends parallel.dist_ba to the 15-dim VIO states of models.vio_ba
(BASELINE.json config 5 at VIO scale): visual observations are sharded over
landmarks exactly as in the VO case; IMU preintegration factors touch only
the (replicated) keyframe states, so every device linearizes them
identically — no communication. Per LM iteration the only collectives are
the psum of the visual contribution to the (W·15)^2 reduced state system and
of scalar bookkeeping.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..models import ba as ba_mod
from ..models import vio_ba
from ..models.vio_ba import D, VIOBAConfig, VIOState
from ..ops import lie
from .mesh import LANDMARK_AXIS


def solve_vio_ba_distributed(mesh, state: VIOState, T_C_B, landmarks, obs,
                             obs_mask, lm_valid, preint, preint_valid,
                             cfg: VIOBAConfig = VIOBAConfig(),
                             fix_first: bool = True, obs_weight=None,
                             bias_alpha=None):
    """Landmark-sharded solve_vio_ba over `mesh` (1-D, axis LANDMARK_AXIS).

    Same contract as models.vio_ba.solve_vio_ba; the landmark count must
    divide the mesh size. Returns a vio_ba.VIOBAResult.
    """
    axis = LANDMARK_AXIS
    W = state.T_W_B.shape[0]
    dtype = state.T_W_B.dtype
    state_spec = VIOState(T_W_B=P(), vel=P(), bg=P(), ba=P())
    pre_spec = jax.tree.map(lambda _: P(), preint)
    if obs_weight is None:
        obs_weight = jnp.ones((W, landmarks.shape[0]), dtype=dtype)
    # Health-gated desert bias stiffness (vio_ba.bias_desert_scales):
    # replicated (W-1,2) multipliers riding the IMU factors — like the
    # states, zero communication. Ones when the feature is off (same traced
    # signature either way).
    b_scales = vio_ba.bias_desert_scales(cfg, bias_alpha, dtype)
    if b_scales is None:
        b_scales = jnp.ones((W - 1, 2), dtype=dtype)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(state_spec, P(), P(axis), P(None, None, axis, None),
                  P(None, None, axis), P(axis), pre_spec, P(),
                  P(None, axis), P()),
        out_specs=(state_spec, P(axis), P(), P(), P(), P(), P(), P()),
        check_rep=False,
    )
    def _solve(st0, T_C_B, lms, obs, mask_in, lm_valid, preint, preint_valid,
               obs_w, b_scales):
        lm_active0 = ba_mod.lm_span_gate(
            ba_mod.stereo_observability_mask(mask_in, lm_valid),
            mask_in, cfg.min_lm_span)
        mask0 = mask_in & lm_active0[None, None, :]
        n_vis = jax.lax.psum(jnp.sum(mask0), axis)
        n_lm_act = jax.lax.psum(jnp.sum(lm_active0), axis)
        n_blocks = n_vis + jnp.sum(preint_valid)
        n_rows = 2 * n_vis + 15 * jnp.sum(preint_valid)
        n_vars = W * D - 6 + 3 * n_lm_act
        attempt = (n_blocks >= cfg.min_residual_blocks) & (n_rows >= n_vars)

        # Hoisted per-interval whitening (fixed during the solve).
        sqrt_infos = jax.vmap(
            lambda i: vio_ba._imu_sqrt_info(
                jax.tree.map(lambda x: x[i], preint), cfg))(jnp.arange(W - 1))

        def lin_sys(st: VIOState, lms, mask, lm_active):
            """ONE pass over the local observation shard + the (replicated)
            IMU intervals per point: undamped state system AND the global
            cost, with the visual pose-block reduction and the visual cost
            packed into a single psum. The LM loop carries this system and
            re-damps it on rejected steps instead of relinearizing.

            Visual pose blocks are embedded in the 15-dim layout; the
            landmark coupling stays 6-dim (visual factors never touch
            velocity/bias) so the elimination — and the psum'd Schur
            correction — live in the pose subspace (6.25x less compute AND
            collective payload)."""
            T_B_W = jax.vmap(lie.se3_inverse)(st.T_W_B)
            lin = ba_mod._linearize_all(T_B_W, T_C_B, lms, obs, mask,
                                        cfg.huber_delta)
            lin = ba_mod.apply_obs_weights(lin, obs_w)
            H_pp6, H_ll, H_pl6, g_p6, g_l = ba_mod.build_normal_equations(lin)
            H_pp6, g_p6, vis = jax.lax.psum(
                (H_pp6, g_p6, jnp.sum(lin.cost)), axis)

            H_ss = jnp.zeros((W, W, D, D), dtype=dtype)
            H_ss = H_ss.at[jnp.arange(W), jnp.arange(W), :6, :6].add(H_pp6)
            g_s = jnp.zeros((W, D), dtype=dtype).at[:, :6].add(g_p6)

            # IMU factors: replicated states -> identical on every device.
            def imu_blocks(i):
                r, J_i, J_j = vio_ba._imu_linearize_one(
                    jax.tree.map(lambda x: x[i], preint), st, i, cfg,
                    sqrt_infos[i], b_scales[i])
                w = preint_valid[i].astype(dtype)
                return (w * (J_i.T @ J_i), w * (J_j.T @ J_j),
                        w * (J_i.T @ J_j), w * (J_i.T @ r), w * (J_j.T @ r),
                        0.5 * w * jnp.dot(r, r))

            Hii, Hjj, Hij, gi, gj, imu_costs = jax.vmap(imu_blocks)(
                jnp.arange(W - 1))
            idx = jnp.arange(W - 1)
            H_ss = H_ss.at[idx, idx].add(Hii)
            H_ss = H_ss.at[idx + 1, idx + 1].add(Hjj)
            H_ss = H_ss.at[idx, idx + 1].add(Hij)
            H_ss = H_ss.at[idx + 1, idx].add(jnp.swapaxes(Hij, -1, -2))
            g_s = g_s.at[idx].add(gi)
            g_s = g_s.at[idx + 1].add(gj)

            g_l_m = jnp.where(lm_active[:, None], g_l, 0.0)
            H_pl6_m = jnp.where(lm_active[None, :, None, None], H_pl6, 0.0)
            sys = (H_ss, H_ll, H_pl6_m, g_s, g_l_m)
            r_sq = jnp.sum(lin.r ** 2, axis=-1)
            return sys, vis + jnp.sum(imu_costs), r_sq

        def regate_vio(mask, lm_active, r_sq_new, st_new, lms_new):
            """chi^2 mask update + under-constraint guard (global counts),
            shared by the chi2 branch (identical semantics to the local
            solver's regate plus the guard)."""
            m = mask & (r_sq_new <= cfg.chi2_gate ** 2)
            act = ba_mod.stereo_observability_mask(m, lm_valid)
            m = m & act[None, None, :]
            n_b, n_act = jax.lax.psum((jnp.sum(m), jnp.sum(act)), axis)
            rows = 2 * n_b + 15 * jnp.sum(preint_valid)
            nvars = W * D - 6 + 3 * n_act
            guard = ((n_b + jnp.sum(preint_valid) >= cfg.min_residual_blocks)
                     & (rows >= nvars))
            m = jnp.where(guard, m, mask)
            act = jnp.where(guard, act, lm_active)
            sys_g, cost_g, _ = lin_sys(st_new, lms_new, m, act)
            return m, act, sys_g, cost_g

        def damp(sys, lam, lm_active):
            H_ss, H_ll, H_pl6_m, g_s, g_l_m = sys
            diag_ss = jnp.maximum(
                jax.vmap(jnp.diag)(H_ss[jnp.arange(W), jnp.arange(W)]), 1e-8)
            H_ss_d = H_ss.at[jnp.arange(W), jnp.arange(W)].add(
                lam * jax.vmap(jnp.diag)(diag_ss))
            dl = jnp.maximum(jax.vmap(jnp.diag)(H_ll), 1e-8)
            H_ll_d = H_ll + lam * jax.vmap(jnp.diag)(dl)
            eye3 = jnp.eye(3, dtype=dtype)
            H_ll_d = jnp.where(lm_active[:, None, None], H_ll_d, eye3[None])
            return H_ss_d, H_ll_d, H_pl6_m, g_s, g_l_m

        def schur_step(H_ss, H_ll_d, H_pl6, g_s, g_l, dl_diag, lm_active):
            H_ll_inv, inv_ok = ba_mod._inv3x3(H_ll_d)
            A6 = jnp.einsum("wlij,ljk->wlik", H_pl6, H_ll_inv)
            # Local landmark-elimination contribution (pose subspace), one
            # packed psum -> global.
            S6_local = -jnp.einsum("wlik,vljk->wvij", A6, H_pl6)
            b6_local = jnp.einsum("wlik,lk->wi", A6, g_l)
            S6, b6 = jax.lax.psum((S6_local, b6_local), axis)
            S_blocks = H_ss.at[:, :, :6, :6].add(S6)
            b_red = (-g_s).at[:, :6].add(b6)
            S = S_blocks.transpose(0, 2, 1, 3).reshape(W * D, W * D)
            b = b_red.reshape(W * D)
            if fix_first:
                m = jnp.ones(W * D, dtype=dtype).at[:6].set(0.0)
                S = S * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
                b = b * m
            cho = jax.scipy.linalg.cho_factor(S, lower=True)
            delta_s = jax.scipy.linalg.cho_solve(cho, b).reshape(W, D)
            rhs_l = -g_l - jnp.einsum("wlij,wi->lj", H_pl6, delta_s[:, :6])
            delta_l = jnp.einsum("lij,lj->li", H_ll_inv, rhs_l)
            delta_l = jnp.where(lm_active[:, None], delta_l, 0.0)
            local_ok = (jnp.all(jnp.isfinite(delta_l))
                        & jnp.all(inv_ok | (~lm_active))).astype(jnp.int32)
            # One packed psum: step-validity vote + landmark step norm + the
            # landmark pieces of the observer metrics.
            n_bad, dl_sq, gl_sq, gl_dl, dl_pred = jax.lax.psum(
                (1 - local_ok, jnp.sum(delta_l ** 2), jnp.sum(g_l ** 2),
                 jnp.sum(g_l * delta_l), jnp.sum(dl_diag * delta_l ** 2)),
                axis)
            ok = jnp.all(jnp.isfinite(delta_s)) & (n_bad == 0)
            return delta_s, delta_l, dl_sq, ok, (gl_sq, gl_dl, dl_pred)

        sys0, cost0, _ = lin_sys(st0, lms, mask0, lm_active0)

        def cond(c):
            return (~c[6]) & (c[5] < cfg.max_iterations)

        def body(c):
            (st, lms, sys, cost, lam, it, done, status, metrics, mask,
             lm_active, n_acc) = c
            H_ss, H_ll_d, H_pl6, g_s, g_l_m = damp(sys, lam, lm_active)
            dl_diag = jnp.maximum(jax.vmap(jnp.diag)(sys[1]), 1e-8)
            delta_s, delta_l, dl_sq, ok_step, lm_pieces = schur_step(
                H_ss, H_ll_d, H_pl6, g_s, g_l_m, dl_diag, lm_active)
            delta_s = jnp.where(ok_step, delta_s, 0.0)
            delta_l = jnp.where(ok_step, delta_l, 0.0)
            st_new = vio_ba._retract_state(st, delta_s)
            lms_new = lms + delta_l
            sys_new, new_cost, r_sq_new = lin_sys(st_new, lms_new, mask,
                                                  lm_active)
            accept = ok_step & jnp.isfinite(new_cost) & (new_cost < cost)

            if cfg.chi2_gate > 0.0:
                do_gate = accept & (n_acc + 1 == max(1, cfg.chi2_gate_iter))
                mask, lm_active, sys_new, new_cost = jax.lax.cond(
                    do_gate,
                    lambda _: regate_vio(mask, lm_active, r_sq_new, st_new,
                                         lms_new),
                    lambda _: (mask, lm_active, sys_new, new_cost), None)
            n_acc = n_acc + accept.astype(jnp.int32)

            cost_conv = accept & (jnp.abs(cost - new_cost)
                                  <= cfg.cost_tol * jnp.maximum(cost, 1e-12))
            step_sq = jnp.sum(delta_s ** 2) + jnp.where(ok_step, dl_sq, 0.0)
            param_conv = accept & (jnp.sqrt(step_sq) <= cfg.param_tol)
            # Observer columns (replicated; ref observer.rs:40-68).
            gl_sq, gl_dl, dl_pred = lm_pieces
            gate = ok_step.astype(dtype)
            g_norm = jnp.sqrt(jnp.sum(sys[3] ** 2) + gl_sq)
            d_s = jnp.maximum(jax.vmap(jnp.diag)(
                sys[0][jnp.arange(W), jnp.arange(W)]), 1e-8)
            pred = 0.5 * (lam * (jnp.sum(d_s * delta_s ** 2)
                                 + gate * dl_pred)
                          - (jnp.sum(sys[3] * delta_s) + gate * gl_dl))
            rho = ba_mod.step_quality(cost, new_cost, pred)
            metrics = metrics.at[it].set(ba_mod.metrics_row(
                new_cost, g_norm, lam, jnp.sqrt(step_sq), rho, accept))
            st = jax.tree.map(lambda a, b: jnp.where(accept, b, a), st, st_new)
            lms = jnp.where(accept, lms_new, lms)
            sys = jax.tree.map(lambda new, old: jnp.where(accept, new, old),
                               sys_new, sys)
            cost = jnp.where(accept, new_cost, cost)
            lam = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-12), lam * 4.0)
            hard_fail = lam > cfg.lambda_max
            done = cost_conv | param_conv | hard_fail
            status = ba_mod.lm_status(cost_conv, param_conv, hard_fail)
            return (st, lms, sys, cost, lam, it + 1, done, status, metrics,
                    mask, lm_active, n_acc)

        init = (st0, lms, sys0, cost0, jnp.asarray(cfg.lambda_init, dtype),
                jnp.asarray(0, jnp.int32), ~attempt,
                jnp.asarray(ba_mod.STATUS_MAX_ITERATIONS, jnp.int32),
                jnp.zeros((cfg.max_iterations, ba_mod.N_METRIC_COLS), dtype),
                mask0, lm_active0, jnp.asarray(0, jnp.int32))
        (st, lms_out, _, cost, lam, it, _, status, metrics,
         _mask, _act, _n) = jax.lax.while_loop(cond, body, init)

        status = jnp.where(attempt, status, ba_mod.STATUS_SKIPPED)
        # Numerical-health gate (see ba.solve_ba), psum'd so every shard
        # agrees: non-finite results roll back.
        bad_local = (~jnp.all(jnp.isfinite(
            jnp.where(_act[:, None], lms_out, 0.0)))).astype(jnp.int32)
        finite = (jnp.all(jnp.isfinite(st.T_W_B))
                  & jnp.all(jnp.isfinite(st.vel))
                  & jnp.all(jnp.isfinite(st.bg))
                  & jnp.all(jnp.isfinite(st.ba))
                  & (jax.lax.psum(bad_local, axis) == 0))
        success = attempt & (status != ba_mod.STATUS_FAILED) & finite
        st_out = jax.tree.map(lambda a, b: jnp.where(success, b, a), st0, st)
        lms_final = jnp.where(success, lms_out, lms)
        return st_out, lms_final, success, status, cost0, cost, it, metrics

    (st_out, lms_out, success, status, cost0, cost, it,
     metrics) = jax.jit(_solve)(state, T_C_B, landmarks, obs, obs_mask,
                                lm_valid, preint, preint_valid, obs_weight,
                                b_scales)
    return vio_ba.VIOBAResult(state=st_out, landmarks=lms_out,
                              success=success, status=status,
                              initial_cost=cost0, final_cost=cost,
                              iterations=it, metrics=metrics)


def solve_vio_ba_marginalized_distributed(mesh, state: VIOState, T_C_B,
                                          landmarks, obs, obs_mask, lm_valid,
                                          preint, preint_valid,
                                          prior, will_evict,
                                          cfg: VIOBAConfig = VIOBAConfig(),
                                          obs_weight=None, bias_alpha=None):
    """Landmark-sharded, prior-augmented VIO BA + next-prior rollout.

    Distributed counterpart of models.vio_ba.solve_vio_ba_marginalized (same
    contract, returns (VIOBAResult, new MargPrior)). The 15-dim-state prior
    lives on the replicated keyframe states, so — like the IMU factors — it
    adds no communication; per LM iteration the only collective remains the
    psum of the visual contribution to the reduced state system. The final
    linearized system is replicated after its psum, so the marginalization
    (one (15,15) block elimination) runs outside the shard_map.
    """
    from ..models.marginalization import marginalize_oldest, prior_terms

    axis = LANDMARK_AXIS
    W = state.T_W_B.shape[0]
    dtype = state.T_W_B.dtype
    state_spec = VIOState(T_W_B=P(), vel=P(), bg=P(), ba=P())
    pre_spec = jax.tree.map(lambda _: P(), preint)

    def _extra(st: VIOState):
        return jnp.concatenate([st.vel, st.bg, st.ba], axis=1)  # (W,9)

    if obs_weight is None:
        obs_weight = jnp.ones((W, landmarks.shape[0]), dtype=dtype)
    # Desert bias stiffness — see solve_vio_ba_distributed.
    b_scales = vio_ba.bias_desert_scales(cfg, bias_alpha, dtype)
    if b_scales is None:
        b_scales = jnp.ones((W - 1, 2), dtype=dtype)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(state_spec, P(), P(axis), P(None, None, axis, None),
                  P(None, None, axis), P(axis), pre_spec, P(), P(),
                  P(None, axis), P()),
        out_specs=(state_spec, P(axis), P(), P(), P(), P(), P(), P(),
                   P(None, None, axis)),
        check_rep=False,
    )
    def _solve(st0, T_C_B, lms, obs, mask_in, lm_valid, preint, preint_valid,
               prior, obs_w, b_scales):
        lm_active0 = ba_mod.lm_span_gate(
            ba_mod.stereo_observability_mask(mask_in, lm_valid),
            mask_in, cfg.min_lm_span)
        mask0 = mask_in & lm_active0[None, None, :]
        n_vis = jax.lax.psum(jnp.sum(mask0), axis)
        n_lm_act = jax.lax.psum(jnp.sum(lm_active0), axis)
        n_blocks = n_vis + jnp.sum(preint_valid)
        n_rows = 2 * n_vis + 15 * jnp.sum(preint_valid)
        n_vars = W * D - 6 + 3 * n_lm_act
        attempt = (n_blocks >= cfg.min_residual_blocks) & (n_rows >= n_vars)
        # ALWAYS hard-fix the gauge — must mirror
        # models.vio_ba.solve_vio_ba_marginalized (the eviction-only prior
        # carries no absolute pose info; see the comment there).
        fix_first = jnp.asarray(True)

        # Hoisted per-interval whitening (fixed during the solve).
        sqrt_infos = jax.vmap(
            lambda i: vio_ba._imu_sqrt_info(
                jax.tree.map(lambda x: x[i], preint), cfg))(jnp.arange(W - 1))

        def lin_sys(st: VIOState, lms, mask, lm_active):
            """ONE pass per point: undamped prior-augmented state system AND
            the global (visual + IMU + prior) cost (see
            solve_vio_ba_distributed.lin_sys; prior terms ride the replicated
            states with no communication)."""
            T_B_W = jax.vmap(lie.se3_inverse)(st.T_W_B)
            lin = ba_mod._linearize_all(T_B_W, T_C_B, lms, obs, mask,
                                        cfg.huber_delta)
            lin = ba_mod.apply_obs_weights(lin, obs_w)
            H_pp6, H_ll, H_pl6, g_p6, g_l = ba_mod.build_normal_equations(lin)
            H_pp6, g_p6, vis = jax.lax.psum(
                (H_pp6, g_p6, jnp.sum(lin.cost)), axis)

            # Visual pose blocks in the 15-dim layout; landmark coupling
            # stays 6-dim (see solve_vio_ba_distributed.lin_sys).
            H_ss = jnp.zeros((W, W, D, D), dtype=dtype)
            H_ss = H_ss.at[jnp.arange(W), jnp.arange(W), :6, :6].add(H_pp6)
            g_s = jnp.zeros((W, D), dtype=dtype).at[:, :6].add(g_p6)

            def imu_blocks(i):
                r, J_i, J_j = vio_ba._imu_linearize_one(
                    jax.tree.map(lambda x: x[i], preint), st, i, cfg,
                    sqrt_infos[i], b_scales[i])
                w = preint_valid[i].astype(dtype)
                return (w * (J_i.T @ J_i), w * (J_j.T @ J_j),
                        w * (J_i.T @ J_j), w * (J_i.T @ r), w * (J_j.T @ r),
                        0.5 * w * jnp.dot(r, r))

            Hii, Hjj, Hij, gi, gj, imu_costs = jax.vmap(imu_blocks)(
                jnp.arange(W - 1))
            idx = jnp.arange(W - 1)
            H_ss = H_ss.at[idx, idx].add(Hii)
            H_ss = H_ss.at[idx + 1, idx + 1].add(Hjj)
            H_ss = H_ss.at[idx, idx + 1].add(Hij)
            H_ss = H_ss.at[idx + 1, idx].add(jnp.swapaxes(Hij, -1, -2))
            g_s = g_s.at[idx].add(gi)
            g_s = g_s.at[idx + 1].add(gj)

            # Prior over the flattened (W·15) state vector (replicated).
            H_add, g_add, pcost = prior_terms(prior, st.T_W_B, _extra(st))
            H_ss = (H_ss.transpose(0, 2, 1, 3).reshape(W * D, W * D) + H_add) \
                .reshape(W, D, W, D).transpose(0, 2, 1, 3)
            g_s = (g_s.reshape(W * D) + g_add).reshape(W, D)

            g_l_m = jnp.where(lm_active[:, None], g_l, 0.0)
            H_pl6_m = jnp.where(lm_active[None, :, None, None], H_pl6, 0.0)
            sys = (H_ss, H_ll, H_pl6_m, g_s, g_l_m)
            r_sq = jnp.sum(lin.r ** 2, axis=-1)
            return sys, vis + jnp.sum(imu_costs) + pcost, r_sq

        def regate_vio(mask, lm_active, r_sq_new, st_new, lms_new):
            """chi^2 mask update + under-constraint guard (global counts) —
            identical semantics to the local solver's regate."""
            m = mask & (r_sq_new <= cfg.chi2_gate ** 2)
            act = ba_mod.stereo_observability_mask(m, lm_valid)
            m = m & act[None, None, :]
            n_b, n_act = jax.lax.psum((jnp.sum(m), jnp.sum(act)), axis)
            rows = 2 * n_b + 15 * jnp.sum(preint_valid)
            nvars = W * D - 6 + 3 * n_act
            guard = ((n_b + jnp.sum(preint_valid) >= cfg.min_residual_blocks)
                     & (rows >= nvars))
            m = jnp.where(guard, m, mask)
            act = jnp.where(guard, act, lm_active)
            sys_g, cost_g, _ = lin_sys(st_new, lms_new, m, act)
            return m, act, sys_g, cost_g

        def damp(sys, lam, lm_active):
            H_ss, H_ll, H_pl6_m, g_s, g_l_m = sys
            diag_ss = jnp.maximum(
                jax.vmap(jnp.diag)(H_ss[jnp.arange(W), jnp.arange(W)]), 1e-8)
            H_ss_d = H_ss.at[jnp.arange(W), jnp.arange(W)].add(
                lam * jax.vmap(jnp.diag)(diag_ss))
            dl = jnp.maximum(jax.vmap(jnp.diag)(H_ll), 1e-8)
            H_ll_d = H_ll + lam * jax.vmap(jnp.diag)(dl)
            eye3 = jnp.eye(3, dtype=dtype)
            H_ll_d = jnp.where(lm_active[:, None, None], H_ll_d, eye3[None])
            return H_ss_d, H_ll_d, H_pl6_m, g_s, g_l_m

        def reduced(H_ss, H_ll_d, H_pl6, g_s, g_l):
            """Global reduced system (replicated after psum) + local pieces."""
            H_ll_inv, inv_ok = ba_mod._inv3x3(H_ll_d)
            A6 = jnp.einsum("wlij,ljk->wlik", H_pl6, H_ll_inv)
            S6_local = -jnp.einsum("wlik,vljk->wvij", A6, H_pl6)
            b6_local = jnp.einsum("wlik,lk->wi", A6, g_l)
            S6, b6 = jax.lax.psum((S6_local, b6_local), axis)
            S_blocks = H_ss.at[:, :, :6, :6].add(S6)
            g_red = g_s.at[:, :6].add(-b6)
            S = S_blocks.transpose(0, 2, 1, 3).reshape(W * D, W * D)
            return S, g_red.reshape(W * D), H_ll_inv, inv_ok

        def schur_step(H_ss, H_ll_d, H_pl6, g_s, g_l, dl_diag, lm_active):
            S, g_red, H_ll_inv, inv_ok = reduced(H_ss, H_ll_d, H_pl6, g_s, g_l)
            b = -g_red

            def fixed(args):
                S_, b_ = args
                m = jnp.ones(W * D, dtype=dtype).at[:6].set(0.0)
                return (S_ * m[:, None] * m[None, :] + jnp.diag(1.0 - m),
                        b_ * m)

            S2, b2 = jax.lax.cond(fix_first, fixed, lambda a: a, (S, b))
            cho = jax.scipy.linalg.cho_factor(S2, lower=True)
            delta_s = jax.scipy.linalg.cho_solve(cho, b2).reshape(W, D)
            rhs_l = -g_l - jnp.einsum("wlij,wi->lj", H_pl6, delta_s[:, :6])
            delta_l = jnp.einsum("lij,lj->li", H_ll_inv, rhs_l)
            delta_l = jnp.where(lm_active[:, None], delta_l, 0.0)
            local_ok = (jnp.all(jnp.isfinite(delta_l))
                        & jnp.all(inv_ok | (~lm_active))).astype(jnp.int32)
            # One packed psum: step-validity vote + landmark step norm + the
            # landmark pieces of the observer metrics.
            n_bad, dl_sq, gl_sq, gl_dl, dl_pred = jax.lax.psum(
                (1 - local_ok, jnp.sum(delta_l ** 2), jnp.sum(g_l ** 2),
                 jnp.sum(g_l * delta_l), jnp.sum(dl_diag * delta_l ** 2)),
                axis)
            ok = jnp.all(jnp.isfinite(delta_s)) & (n_bad == 0)
            return delta_s, delta_l, dl_sq, ok, (gl_sq, gl_dl, dl_pred)

        sys0, cost0, _ = lin_sys(st0, lms, mask0, lm_active0)

        def cond(c):
            return (~c[6]) & (c[5] < cfg.max_iterations)

        def body(c):
            (st, lms, sys, cost, lam, it, done, status, metrics, mask,
             lm_active, n_acc) = c
            H_ss, H_ll_d, H_pl6, g_s, g_l_m = damp(sys, lam, lm_active)
            dl_diag = jnp.maximum(jax.vmap(jnp.diag)(sys[1]), 1e-8)
            delta_s, delta_l, dl_sq, ok_step, lm_pieces = schur_step(
                H_ss, H_ll_d, H_pl6, g_s, g_l_m, dl_diag, lm_active)
            delta_s = jnp.where(ok_step, delta_s, 0.0)
            delta_l = jnp.where(ok_step, delta_l, 0.0)
            st_new = vio_ba._retract_state(st, delta_s)
            lms_new = lms + delta_l
            sys_new, new_cost, r_sq_new = lin_sys(st_new, lms_new, mask,
                                                  lm_active)
            accept = ok_step & jnp.isfinite(new_cost) & (new_cost < cost)

            if cfg.chi2_gate > 0.0:
                do_gate = accept & (n_acc + 1 == max(1, cfg.chi2_gate_iter))
                mask, lm_active, sys_new, new_cost = jax.lax.cond(
                    do_gate,
                    lambda _: regate_vio(mask, lm_active, r_sq_new, st_new,
                                         lms_new),
                    lambda _: (mask, lm_active, sys_new, new_cost), None)
            n_acc = n_acc + accept.astype(jnp.int32)

            cost_conv = accept & (jnp.abs(cost - new_cost)
                                  <= cfg.cost_tol * jnp.maximum(cost, 1e-12))
            step_sq = jnp.sum(delta_s ** 2) + jnp.where(ok_step, dl_sq, 0.0)
            param_conv = accept & (jnp.sqrt(step_sq) <= cfg.param_tol)
            # Observer columns (replicated; the state gradient g_s already
            # carries the prior contribution from lin_sys).
            gl_sq, gl_dl, dl_pred = lm_pieces
            gate = ok_step.astype(dtype)
            g_norm = jnp.sqrt(jnp.sum(sys[3] ** 2) + gl_sq)
            d_s = jnp.maximum(jax.vmap(jnp.diag)(
                sys[0][jnp.arange(W), jnp.arange(W)]), 1e-8)
            pred = 0.5 * (lam * (jnp.sum(d_s * delta_s ** 2)
                                 + gate * dl_pred)
                          - (jnp.sum(sys[3] * delta_s) + gate * gl_dl))
            rho = ba_mod.step_quality(cost, new_cost, pred)
            metrics = metrics.at[it].set(ba_mod.metrics_row(
                new_cost, g_norm, lam, jnp.sqrt(step_sq), rho, accept))
            st = jax.tree.map(lambda a, b: jnp.where(accept, b, a), st, st_new)
            lms = jnp.where(accept, lms_new, lms)
            sys = jax.tree.map(lambda new, old: jnp.where(accept, new, old),
                               sys_new, sys)
            cost = jnp.where(accept, new_cost, cost)
            lam = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-12), lam * 4.0)
            hard_fail = lam > cfg.lambda_max
            done = cost_conv | param_conv | hard_fail
            status = ba_mod.lm_status(cost_conv, param_conv, hard_fail)
            return (st, lms, sys, cost, lam, it + 1, done, status, metrics,
                    mask, lm_active, n_acc)

        init = (st0, lms, sys0, cost0, jnp.asarray(cfg.lambda_init, dtype),
                jnp.asarray(0, jnp.int32), ~attempt,
                jnp.asarray(ba_mod.STATUS_MAX_ITERATIONS, jnp.int32),
                jnp.zeros((cfg.max_iterations, ba_mod.N_METRIC_COLS), dtype),
                mask0, lm_active0, jnp.asarray(0, jnp.int32))
        (st, lms_out, _, cost, lam, it, _, status, metrics,
         mask_f, _act, _n) = jax.lax.while_loop(cond, body, init)

        status = jnp.where(attempt, status, ba_mod.STATUS_SKIPPED)
        # Numerical-health gate (see ba.solve_ba), psum'd so every shard
        # agrees: non-finite results roll back.
        bad_local = (~jnp.all(jnp.isfinite(
            jnp.where(_act[:, None], lms_out, 0.0)))).astype(jnp.int32)
        finite = (jnp.all(jnp.isfinite(st.T_W_B))
                  & jnp.all(jnp.isfinite(st.vel))
                  & jnp.all(jnp.isfinite(st.bg))
                  & jnp.all(jnp.isfinite(st.ba))
                  & (jax.lax.psum(bad_local, axis) == 0))
        success = attempt & (status != ba_mod.STATUS_FAILED) & finite
        st_out = jax.tree.map(lambda a, b: jnp.where(success, b, a), st0, st)
        lms_final = jnp.where(success, lms_out, lms)
        return (st_out, lms_final, success, status, cost0, cost, it,
                metrics, mask_f)

    @partial(jax.jit)
    def _run(state, T_C_B, landmarks, obs, obs_mask, lm_valid, preint,
             preint_valid, prior, will_evict, obs_weight, b_scales):
        (st_out, lms_out, success, status, cost0, cost, it,
         metrics, mask_f) = _solve(state, T_C_B, landmarks, obs, obs_mask,
                                   lm_valid, preint, preint_valid, prior,
                                   obs_weight, b_scales)
        # ---- next prior: the shared EVICTION-system construction
        # (models.vio_ba.build_eviction_prior — kept verbatim-identical to
        # the single-device solver so distributed parity cannot drift).
        # mask_f is the chi^2-gated final observation mask gathered from the
        # sharded solve, so excised outliers never enter the prior. All
        # inputs are replicated/global; no communication.
        sqrt_info0 = vio_ba._imu_sqrt_info(
            jax.tree.map(lambda x: x[0], preint), cfg)
        new_prior = vio_ba.build_eviction_prior(
            st_out, lms_out, T_C_B, obs[0], mask_f[0],
            jax.tree.map(lambda x: x[0], preint), preint_valid[0],
            sqrt_info0, prior, cfg, obs_w0=obs_weight[0])
        do_new = will_evict & success
        out_prior = jax.tree.map(
            lambda new, old: jnp.where(do_new, new, old), new_prior, prior)
        out_prior = out_prior._replace(
            valid=jnp.where(do_new, True, prior.valid))
        return (st_out, lms_out, success, status, cost0, cost, it, out_prior,
                metrics)

    (st_out, lms_out, success, status, cost0, cost, it, out_prior,
     metrics) = _run(state, T_C_B, landmarks, obs, obs_mask, lm_valid, preint,
                     preint_valid, prior, jnp.asarray(will_evict),
                     obs_weight, b_scales)
    result = vio_ba.VIOBAResult(state=st_out, landmarks=lms_out,
                                success=success, status=status,
                                initial_cost=cost0, final_cost=cost,
                                iterations=it, metrics=metrics)
    return result, out_prior
