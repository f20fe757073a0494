"""Distributed sliding-window BA: landmark blocks sharded across a device
mesh, Schur reduction via psum collectives over ICI.

Greenfield capability (SURVEY.md §2.4, §7 step 9 — the reference has no
distributed backend): the BA normal equations decompose as

    [ H_pp  H_pl ] [dp]   [-g_p]
    [ H_lp  H_ll ] [dl] = [-g_l]

where H_ll is block-diagonal over landmarks. Sharding landmarks (and their
observation columns) across the mesh makes linearization and landmark
elimination local; only the reduced camera system

    S = H_pp - sum_l H_pl[l] H_ll[l]^-1 H_lp[l]      ((W·6)^2, tiny)

needs cross-device reduction — one psum per LM iteration. Every device then
solves the same small S by Cholesky (replicated, cheaper than scattering) and
back-substitutes its own landmark shard. Communication per iteration is
O(W^2·36 + W·6) floats, independent of landmark count — near-perfect weak
scaling in L.

The LM accept/reject loop runs inside shard_map so the whole solve is one
compiled program with fused collectives.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..models import ba as ba_mod
from ..ops import lie
from .mesh import LANDMARK_AXIS


def solve_ba_distributed(mesh, T_W_B, T_C_B, landmarks, obs, obs_mask,
                         lm_valid, cfg: ba_mod.BAConfig = ba_mod.BAConfig(),
                         fix_first: bool = True, obs_weight=None):
    """Landmark-sharded BA over `mesh` (1-D, axis LANDMARK_AXIS).

    Same contract as models.ba.solve_ba (incl. optional (W,L) obs_weight —
    sharded along L; ones = unweighted, bitwise-identical to the local
    solver); landmark count L must be divisible by the mesh size. Returns a
    ba.BAResult.
    """
    axis = LANDMARK_AXIS
    W = T_W_B.shape[0]
    dtype = T_W_B.dtype
    if obs_weight is None:
        obs_weight = jnp.ones((W, landmarks.shape[0]), dtype=dtype)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(None, None, axis, None),
                  P(None, None, axis), P(axis), P(None, axis)),
        out_specs=(P(), P(axis), P(), P(), P(), P(), P(), P()),
        check_rep=False,
    )
    def _solve(T_W_B, T_C_B, lms, obs, mask_in, lm_valid, obs_w):
        lm_active0 = ba_mod.lm_span_gate(
            ba_mod.stereo_observability_mask(mask_in, lm_valid),
            mask_in, cfg.min_lm_span)
        mask0 = mask_in & lm_active0[None, None, :]
        n_blocks = jax.lax.psum(jnp.sum(mask0), axis)
        n_vars = (W - 1) * 6 + 3 * jax.lax.psum(jnp.sum(lm_active0), axis)
        attempt = (n_blocks >= cfg.min_residual_blocks) & (n_blocks * 2 >= n_vars)

        T_B_W0 = jax.vmap(lie.se3_inverse)(T_W_B)

        def lin_sys(T_B_W, lms, mask, lm_active):
            """ONE pass over the local observation shard per point: global
            pose blocks + local landmark blocks AND the global robust cost,
            with the pose-block reduction and the cost packed into a single
            psum. The LM loop carries this system and re-damps it on rejected
            steps instead of relinearizing. Also returns the LOCAL shard's
            per-observation whitened squared residual norms for the chi^2
            gate."""
            lin = ba_mod._linearize_all(T_B_W, T_C_B, lms, obs, mask,
                                        cfg.huber_delta)
            lin = ba_mod.apply_obs_weights(lin, obs_w)
            H_pp, H_ll, H_pl, g_p, g_l = ba_mod.build_normal_equations(lin)
            H_pp, g_p, cost = jax.lax.psum(
                (H_pp, g_p, jnp.sum(lin.cost)), axis)
            g_l_m = jnp.where(lm_active[:, None], g_l, 0.0)
            H_pl_m = jnp.where(lm_active[None, :, None, None], H_pl, 0.0)
            r_sq = jnp.sum(lin.r ** 2, axis=-1)
            return (H_pp, H_ll, H_pl_m, g_p, g_l_m), cost, r_sq

        sys0, cost0, _ = lin_sys(T_B_W0, lms, mask0, lm_active0)

        def cond(state):
            return (~state[6]) & (state[5] < cfg.max_iterations)

        def body(state):
            (T_B_W, lms, sys, cost, lam, it, done, status, metrics, mask,
             lm_active, n_acc) = state
            H_pp, H_ll, H_pl_m, g_p, g_l_m = sys

            # Damping (must mirror ba.schur_solve semantics).
            dp = jnp.maximum(jax.vmap(jnp.diag)(H_pp), 1e-8)
            H_pp_d = H_pp + lam * jax.vmap(jnp.diag)(dp)
            dl = jnp.maximum(jax.vmap(jnp.diag)(H_ll), 1e-8)
            H_ll_d = H_ll + lam * jax.vmap(jnp.diag)(dl)
            eye3 = jnp.eye(3, dtype=dtype)
            H_ll_d = jnp.where(lm_active[:, None, None], H_ll_d, eye3[None])

            H_ll_inv, inv_ok = ba_mod._inv3x3(H_ll_d)
            A = jnp.einsum("wlij,ljk->wlik", H_pl_m, H_ll_inv)
            # Local Schur contribution, then one psum -> global S and rhs.
            # S dp = -g_p + A g_l  (same algebra as ba.schur_solve)
            S_local = -jnp.einsum("wlik,vljk->wvij", A, H_pl_m)
            b_local = jnp.einsum("wlik,lk->wi", A, g_l_m)
            S_blocks, b_sum = jax.lax.psum((S_local, b_local), axis)
            b_red = b_sum - g_p
            S_blocks = S_blocks.at[jnp.arange(W), jnp.arange(W)].add(H_pp_d)

            S = S_blocks.transpose(0, 2, 1, 3).reshape(W * 6, W * 6)
            b = b_red.reshape(W * 6)
            if fix_first:
                m = jnp.concatenate([jnp.zeros(6, dtype=dtype),
                                     jnp.ones((W - 1) * 6, dtype=dtype)])
                S = S * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
                b = b * m
            cho = jax.scipy.linalg.cho_factor(S, lower=True)
            delta_p = jax.scipy.linalg.cho_solve(cho, b).reshape(W, 6)
            # Local landmark back-substitution.
            rhs_l = -g_l_m - jnp.einsum("wlij,wi->lj", H_pl_m, delta_p)
            delta_l = jnp.einsum("lij,lj->li", H_ll_inv, rhs_l)
            delta_l = jnp.where(lm_active[:, None], delta_l, 0.0)

            local_ok = (jnp.all(jnp.isfinite(delta_l))
                        & jnp.all(inv_ok | (~lm_active))).astype(jnp.int32)
            # One packed psum: step-validity vote + landmark step norm + the
            # landmark pieces of the observer metrics (gradient norm, gain-
            # ratio prediction) — no extra collective round-trips.
            n_bad, dl_sq, gl_sq, gl_dl, dl_pred = jax.lax.psum(
                (1 - local_ok, jnp.sum(delta_l ** 2), jnp.sum(g_l_m ** 2),
                 jnp.sum(g_l_m * delta_l), jnp.sum(dl * delta_l ** 2)), axis)
            ok_step = jnp.all(jnp.isfinite(delta_p)) & (n_bad == 0)
            delta_p = jnp.where(ok_step, delta_p, 0.0)
            delta_l = jnp.where(ok_step, delta_l, 0.0)
            T_new = jax.vmap(lie.se3_retract_split)(T_B_W, delta_p)
            lms_new = lms + delta_l
            sys_new, new_cost, r_sq_new = lin_sys(T_new, lms_new, mask,
                                                  lm_active)
            accept = ok_step & jnp.isfinite(new_cost) & (new_cost < cost)

            if cfg.chi2_gate > 0.0:
                # Outlier gate (semantics of ba.solve_ba): the mask update
                # and observability re-derivation are shard-local; the
                # replicated accept/n_acc make do_gate consistent across
                # devices, and the rebuild psums as usual.
                do_gate = accept & (n_acc + 1 == max(1, cfg.chi2_gate_iter))

                def regate(_):
                    m = mask & (r_sq_new <= cfg.chi2_gate ** 2)
                    act = ba_mod.stereo_observability_mask(m, lm_valid)
                    m = m & act[None, None, :]
                    n_b, n_act = jax.lax.psum((jnp.sum(m), jnp.sum(act)),
                                              axis)
                    guard = ((n_b >= cfg.min_residual_blocks)
                             & (2 * n_b >= (W - 1) * 6 + 3 * n_act))
                    m = jnp.where(guard, m, mask)
                    act = jnp.where(guard, act, lm_active)
                    sys_g, cost_g, _ = lin_sys(T_new, lms_new, m, act)
                    return m, act, sys_g, cost_g

                mask, lm_active, sys_new, new_cost = jax.lax.cond(
                    do_gate, regate,
                    lambda _: (mask, lm_active, sys_new, new_cost), None)
            n_acc = n_acc + accept.astype(jnp.int32)

            cost_conv = accept & (jnp.abs(cost - new_cost)
                                  <= cfg.cost_tol * jnp.maximum(cost, 1e-12))
            step_sq = jnp.sum(delta_p ** 2) + jnp.where(ok_step, dl_sq, 0.0)
            param_conv = accept & (jnp.sqrt(step_sq) <= cfg.param_tol)
            # Observer columns (replicated; ref observer.rs:40-68).
            gate = ok_step.astype(dtype)
            g_norm = jnp.sqrt(jnp.sum(g_p ** 2) + gl_sq)
            pred = 0.5 * (lam * (jnp.sum(dp * delta_p ** 2) + gate * dl_pred)
                          - (jnp.sum(g_p * delta_p) + gate * gl_dl))
            rho = ba_mod.step_quality(cost, new_cost, pred)
            metrics = metrics.at[it].set(ba_mod.metrics_row(
                new_cost, g_norm, lam, jnp.sqrt(step_sq), rho, accept))
            T_B_W = jnp.where(accept, T_new, T_B_W)
            lms = jnp.where(accept, lms_new, lms)
            sys = jax.tree.map(lambda new, old: jnp.where(accept, new, old),
                               sys_new, sys)
            cost = jnp.where(accept, new_cost, cost)
            lam = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-12), lam * 4.0)
            hard_fail = lam > cfg.lambda_max
            done = cost_conv | param_conv | hard_fail
            status = ba_mod.lm_status(cost_conv, param_conv, hard_fail)
            return (T_B_W, lms, sys, cost, lam, it + 1, done, status, metrics,
                    mask, lm_active, n_acc)

        init = (T_B_W0, lms, sys0, cost0,
                jnp.asarray(cfg.lambda_init, dtype),
                jnp.asarray(0, jnp.int32), ~attempt,
                jnp.asarray(ba_mod.STATUS_MAX_ITERATIONS, jnp.int32),
                jnp.zeros((cfg.max_iterations, ba_mod.N_METRIC_COLS), dtype),
                mask0, lm_active0, jnp.asarray(0, jnp.int32))
        (T_B_W, lms_out, _, cost, lam, it, _, status, metrics,
         _mask, _act, _n) = jax.lax.while_loop(cond, body, init)

        status = jnp.where(attempt, status, ba_mod.STATUS_SKIPPED)
        # Numerical-health gate (see ba.solve_ba), psum'd so every shard
        # agrees: non-finite results roll back.
        bad_local = (~jnp.all(jnp.isfinite(
            jnp.where(_act[:, None], lms_out, 0.0)))).astype(jnp.int32)
        finite = (jnp.all(jnp.isfinite(T_B_W))
                  & (jax.lax.psum(bad_local, axis) == 0))
        success = attempt & (status != ba_mod.STATUS_FAILED) & finite
        T_out = jnp.where(success, jax.vmap(lie.se3_inverse)(T_B_W), T_W_B)
        lms_final = jnp.where(success, lms_out, lms)
        return T_out, lms_final, success, status, cost0, cost, it, metrics

    (T_out, lms_out, success, status, cost0, cost, it,
     metrics) = jax.jit(_solve)(T_W_B, T_C_B, landmarks, obs, obs_mask,
                                lm_valid, obs_weight)
    return ba_mod.BAResult(T_W_B=T_out, landmarks=lms_out, success=success,
                           status=status, initial_cost=cost0, final_cost=cost,
                           iterations=it, metrics=metrics)


def solve_ba_marginalized_distributed(mesh, T_W_B, T_C_B, landmarks, obs,
                                      obs_mask, lm_valid,
                                      prior, will_evict,
                                      cfg: ba_mod.BAConfig = ba_mod.BAConfig(),
                                      obs_weight=None):
    """Landmark-sharded, prior-augmented BA over `mesh` + next-prior rollout.

    Distributed counterpart of models.ba.solve_ba_marginalized (same contract,
    returns (BAResult, new MargPrior)). The marginalization prior lives purely
    on the pose states, which are replicated across the mesh, so it adds no
    communication: each device injects the identical (W·6)² prior into its
    copy of the reduced camera system after the per-iteration psum. The final
    linearized system used to produce the next prior is itself the psum-ed
    reduced system, so the marginalization (a (6,6) block elimination) runs
    replicated outside the shard_map.
    """
    from ..models.marginalization import marginalize_oldest, prior_terms

    axis = LANDMARK_AXIS
    W = T_W_B.shape[0]
    dtype = T_W_B.dtype
    no_extra = jnp.zeros((W, 0), dtype=dtype)
    if obs_weight is None:
        obs_weight = jnp.ones((W, landmarks.shape[0]), dtype=dtype)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(None, None, axis, None),
                  P(None, None, axis), P(axis), P(), P(None, axis)),
        out_specs=(P(), P(axis), P(), P(), P(), P(), P(), P(), P(), P()),
        check_rep=False,
    )
    def _solve(T_W_B, T_C_B, lms, obs, mask_in, lm_valid, prior, obs_w):
        lm_active0 = ba_mod.lm_span_gate(
            ba_mod.stereo_observability_mask(mask_in, lm_valid),
            mask_in, cfg.min_lm_span)
        mask0 = mask_in & lm_active0[None, None, :]
        n_blocks = jax.lax.psum(jnp.sum(mask0), axis)
        n_vars = (W - 1) * 6 + 3 * jax.lax.psum(jnp.sum(lm_active0), axis)
        attempt = (n_blocks >= cfg.min_residual_blocks) & (n_blocks * 2 >= n_vars)
        fix_first = ~prior.valid

        T_B_W0 = jax.vmap(lie.se3_inverse)(T_W_B)

        def lin_sys(T_B_W, lms, mask, lm_active):
            """ONE pass over the local observation shard per point: global
            pose blocks + prior terms + local landmark blocks AND the global
            (visual + prior) cost, with the pose-block reduction and the
            visual cost packed into a single psum."""
            lin = ba_mod._linearize_all(T_B_W, T_C_B, lms, obs, mask,
                                        cfg.huber_delta)
            lin = ba_mod.apply_obs_weights(lin, obs_w)
            H_pp, H_ll, H_pl, g_p, g_l = ba_mod.build_normal_equations(lin)
            H_pp, g_p, vis = jax.lax.psum(
                (H_pp, g_p, jnp.sum(lin.cost)), axis)
            T_W_B_cur = jax.vmap(lie.se3_inverse)(T_B_W)
            # Prior terms are replicated (pose states live on every device).
            H_add, g_add, pcost = prior_terms(prior, T_W_B_cur, no_extra)
            g_l_m = jnp.where(lm_active[:, None], g_l, 0.0)
            H_pl_m = jnp.where(lm_active[None, :, None, None], H_pl, 0.0)
            sys = (H_pp, H_ll, H_pl_m, g_p, g_l_m, H_add, g_add)
            r_sq = jnp.sum(lin.r ** 2, axis=-1)
            return sys, vis + pcost, r_sq

        def damp_reduce(sys, lam, lm_active):
            """Damped, prior-augmented reduced system (replicated) + the
            local landmark-shard pieces for back-substitution (cheap — safe
            to redo per lambda retry without relinearizing)."""
            H_pp, H_ll, H_pl_m, g_p, g_l_m, H_add, g_add = sys
            dp = jnp.maximum(jax.vmap(jnp.diag)(H_pp), 1e-8)
            H_pp_d = H_pp + lam * jax.vmap(jnp.diag)(dp)
            dl = jnp.maximum(jax.vmap(jnp.diag)(H_ll), 1e-8)
            H_ll_d = H_ll + lam * jax.vmap(jnp.diag)(dl)
            eye3 = jnp.eye(3, dtype=dtype)
            H_ll_d = jnp.where(lm_active[:, None, None], H_ll_d, eye3[None])

            H_ll_inv, inv_ok = ba_mod._inv3x3(H_ll_d)
            A = jnp.einsum("wlij,ljk->wlik", H_pl_m, H_ll_inv)
            S_local = -jnp.einsum("wlik,vljk->wvij", A, H_pl_m)
            b_local = jnp.einsum("wlik,lk->wi", A, g_l_m)
            S_blocks, b_sub = jax.lax.psum((S_local, b_local), axis)
            S_blocks = S_blocks.at[jnp.arange(W), jnp.arange(W)].add(H_pp_d)
            S = S_blocks.transpose(0, 2, 1, 3).reshape(W * 6, W * 6) + H_add
            b = (-(g_p - b_sub)).reshape(W * 6) - g_add
            return S, b, H_ll_inv, H_pl_m, g_l_m, inv_ok

        def solve_from_system(S, b):
            def fixed(args):
                S_, b_ = args
                m = jnp.concatenate([jnp.zeros(6, dtype=dtype),
                                     jnp.ones((W - 1) * 6, dtype=dtype)])
                return S_ * m[:, None] * m[None, :] + jnp.diag(1.0 - m), b_ * m

            S2, b2 = jax.lax.cond(fix_first, fixed, lambda a: a, (S, b))
            cho = jax.scipy.linalg.cho_factor(S2, lower=True)
            return jax.scipy.linalg.cho_solve(cho, b2).reshape(W, 6)

        sys0, cost0, _ = lin_sys(T_B_W0, lms, mask0, lm_active0)

        def cond(state):
            return (~state[6]) & (state[5] < cfg.max_iterations)

        def body(state):
            (T_B_W, lms, sys, cost, lam, it, done, status, metrics, mask,
             lm_active, n_acc) = state
            S, b, H_ll_inv, H_pl_m, g_l_m, inv_ok = damp_reduce(sys, lam,
                                                                lm_active)
            delta_p = solve_from_system(S, b)
            rhs_l = -g_l_m - jnp.einsum("wlij,wi->lj", H_pl_m, delta_p)
            delta_l = jnp.einsum("lij,lj->li", H_ll_inv, rhs_l)
            delta_l = jnp.where(lm_active[:, None], delta_l, 0.0)
            local_ok = (jnp.all(jnp.isfinite(delta_l))
                        & jnp.all(inv_ok | (~lm_active))).astype(jnp.int32)
            dl = jnp.maximum(jax.vmap(jnp.diag)(sys[1]), 1e-8)
            # One packed psum: step-validity vote + landmark step norm + the
            # landmark pieces of the observer metrics.
            n_bad, dl_sq, gl_sq, gl_dl, dl_pred = jax.lax.psum(
                (1 - local_ok, jnp.sum(delta_l ** 2), jnp.sum(g_l_m ** 2),
                 jnp.sum(g_l_m * delta_l), jnp.sum(dl * delta_l ** 2)), axis)
            ok_step = jnp.all(jnp.isfinite(delta_p)) & (n_bad == 0)
            delta_p = jnp.where(ok_step, delta_p, 0.0)
            delta_l = jnp.where(ok_step, delta_l, 0.0)
            T_new = jax.vmap(lie.se3_retract_split)(T_B_W, delta_p)
            lms_new = lms + delta_l
            sys_new, new_cost, r_sq_new = lin_sys(T_new, lms_new, mask,
                                                  lm_active)
            accept = ok_step & jnp.isfinite(new_cost) & (new_cost < cost)

            if cfg.chi2_gate > 0.0:
                do_gate = accept & (n_acc + 1 == max(1, cfg.chi2_gate_iter))

                def regate(_):
                    m = mask & (r_sq_new <= cfg.chi2_gate ** 2)
                    act = ba_mod.stereo_observability_mask(m, lm_valid)
                    m = m & act[None, None, :]
                    n_b, n_act = jax.lax.psum((jnp.sum(m), jnp.sum(act)),
                                              axis)
                    guard = ((n_b >= cfg.min_residual_blocks)
                             & (2 * n_b >= (W - 1) * 6 + 3 * n_act))
                    m = jnp.where(guard, m, mask)
                    act = jnp.where(guard, act, lm_active)
                    sys_g, cost_g, _ = lin_sys(T_new, lms_new, m, act)
                    return m, act, sys_g, cost_g

                mask, lm_active, sys_new, new_cost = jax.lax.cond(
                    do_gate, regate,
                    lambda _: (mask, lm_active, sys_new, new_cost), None)
            n_acc = n_acc + accept.astype(jnp.int32)

            cost_conv = accept & (jnp.abs(cost - new_cost)
                                  <= cfg.cost_tol * jnp.maximum(cost, 1e-12))
            step_sq = jnp.sum(delta_p ** 2) + jnp.where(ok_step, dl_sq, 0.0)
            param_conv = accept & (jnp.sqrt(step_sq) <= cfg.param_tol)
            # Observer columns (replicated; prior-augmented gradient).
            gate = ok_step.astype(dtype)
            g_full = sys[3].reshape(-1) + sys[6]
            g_norm = jnp.sqrt(jnp.sum(g_full ** 2) + gl_sq)
            dp = jnp.maximum(jax.vmap(jnp.diag)(sys[0]), 1e-8)
            pred = 0.5 * (lam * (jnp.sum(dp * delta_p ** 2) + gate * dl_pred)
                          - (jnp.sum(g_full * delta_p.reshape(-1))
                             + gate * gl_dl))
            rho = ba_mod.step_quality(cost, new_cost, pred)
            metrics = metrics.at[it].set(ba_mod.metrics_row(
                new_cost, g_norm, lam, jnp.sqrt(step_sq), rho, accept))
            T_B_W = jnp.where(accept, T_new, T_B_W)
            lms = jnp.where(accept, lms_new, lms)
            sys = jax.tree.map(lambda new, old: jnp.where(accept, new, old),
                               sys_new, sys)
            cost = jnp.where(accept, new_cost, cost)
            lam = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-12), lam * 4.0)
            hard_fail = lam > cfg.lambda_max
            done = cost_conv | param_conv | hard_fail
            status = ba_mod.lm_status(cost_conv, param_conv, hard_fail)
            return (T_B_W, lms, sys, cost, lam, it + 1, done, status, metrics,
                    mask, lm_active, n_acc)

        init = (T_B_W0, lms, sys0, cost0,
                jnp.asarray(cfg.lambda_init, dtype),
                jnp.asarray(0, jnp.int32), ~attempt,
                jnp.asarray(ba_mod.STATUS_MAX_ITERATIONS, jnp.int32),
                jnp.zeros((cfg.max_iterations, ba_mod.N_METRIC_COLS), dtype),
                mask0, lm_active0, jnp.asarray(0, jnp.int32))
        (T_B_W, lms_out, _, cost, lam, it, _, status, metrics,
         mask_f, lm_active_f, _n) = jax.lax.while_loop(cond, body, init)

        status = jnp.where(attempt, status, ba_mod.STATUS_SKIPPED)
        # Numerical-health gate (see ba.solve_ba), psum'd so every shard
        # agrees: non-finite results roll back.
        bad_local = (~jnp.all(jnp.isfinite(
            jnp.where(lm_active_f[:, None], lms_out, 0.0)))).astype(jnp.int32)
        finite = (jnp.all(jnp.isfinite(T_B_W))
                  & (jax.lax.psum(bad_local, axis) == 0))
        success = attempt & (status != ba_mod.STATUS_FAILED) & finite
        T_out = jnp.where(success, jax.vmap(lie.se3_inverse)(T_B_W), T_W_B)
        lms_final = jnp.where(success, lms_out, lms)

        # Final linearized (prior-augmented, landmark-eliminated) system at
        # the accepted state — the input to next-prior marginalization
        # (built from the chi^2-gated final mask, matching the local solver).
        sys_f, _, _ = lin_sys(jax.vmap(lie.se3_inverse)(T_out), lms_final,
                              mask_f, lm_active_f)
        S_f, b_f, *_ = damp_reduce(sys_f, jnp.asarray(1e-5, dtype),
                                   lm_active_f)
        return (T_out, lms_final, success, status, cost0, cost, it, S_f, b_f,
                metrics)

    @partial(jax.jit)
    def _run(T_W_B, T_C_B, landmarks, obs, obs_mask, lm_valid, prior,
             will_evict, obs_weight):
        (T_out, lms_out, success, status, cost0, cost, it,
         S_f, b_f, metrics) = _solve(T_W_B, T_C_B, landmarks, obs, obs_mask,
                                     lm_valid, prior, obs_weight)
        # reduced_system returns b = -(gradient); marginalize expects +grad.
        new_prior = marginalize_oldest(S_f, -b_f, T_out, no_extra, prior, 6)
        do_new = will_evict & success
        out_prior = jax.tree.map(
            lambda new, old: jnp.where(do_new, new, old), new_prior, prior)
        out_prior = out_prior._replace(
            valid=jnp.where(do_new, True, prior.valid))
        return (T_out, lms_out, success, status, cost0, cost, it, out_prior,
                metrics)

    (T_out, lms_out, success, status, cost0, cost, it, out_prior,
     metrics) = _run(T_W_B, T_C_B, landmarks, obs, obs_mask, lm_valid, prior,
                     jnp.asarray(will_evict), obs_weight)
    result = ba_mod.BAResult(T_W_B=T_out, landmarks=lms_out, success=success,
                             status=status, initial_cost=cost0,
                             final_cost=cost, iterations=it, metrics=metrics)
    return result, out_prior
