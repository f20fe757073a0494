"""Distributed per-frame estimator: the FULL VO pipeline with the sliding-
window bundle adjustment landmark-sharded over a device mesh.

Greenfield capability (SURVEY.md §2.4 — the reference is single-process):
frontend tracking, PnP, and the keyframe policy run replicated/single-device
(per-frame image work does not shard usefully at one camera pair), while the
window solve — the dominant cost as window x landmark capacity grows
(SURVEY.md §5 "long-context analog") — runs as the landmark-sharded Schur
solver of parallel.dist_ba with one psum per LM iteration.

Design: host-orchestrated stage composition (the same _build_stages the
single-chip estimator fuses). The keyframe/BA decision is read on host and
branches in Python to separately-jitted paths. This is deliberate:
shard_map under lax.cond deadlocks multi-device XLA CPU (measured), and the
keyframe branch is per-frame control flow the host already observes. The
extra device sync per frame is the price of the sharded window solve; use
the fused single-chip step when the window fits one chip.

Numerical contract: identical pipeline semantics to models.estimator —
parity with the single-device step is asserted by tests/test_dist_estimator.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import ba as ba_mod
from ..models import estimator as est
from . import dist_ba


def make_distributed_estimator_step(cfg: est.EstimatorConfig, mesh):
    """Build the host-orchestrated distributed step:
    (state, rig, img0, img1) -> (state, FrameOutput).

    Landmark capacity (cfg.frontend.capacity) must be divisible by the mesh
    size.
    """
    W = cfg.window_size
    N = cfg.frontend.capacity
    n_dev = mesh.devices.size
    if N % n_dev:
        raise ValueError(f"capacity {N} not divisible by mesh size {n_dev}")

    stage_frames, stage_track, stage_motion, _ = est._build_stages(cfg)
    j_frames = jax.jit(stage_frames)
    j_track = jax.jit(stage_track)
    j_motion = jax.jit(stage_motion)

    @jax.jit
    def kf_pre(state: est.EstimatorState, rig, table, obs_cur, obs_cur_mask,
               T_cur):
        """Keyframe prologue (identical to the fused kf_branch pre-BA):
        triangulate new landmarks, FIFO-roll the window, insert the frame."""
        window_full = state.kf_count >= W
        lm, lm_fid = est._triangulate_new(rig, T_cur, obs_cur, table,
                                          state.lm, state.lm_fid)
        ins = jnp.minimum(state.kf_count, W - 1)

        def roll_if_full(arr):
            rolled = jnp.roll(arr, -1, axis=0)
            return jnp.where(window_full, rolled, arr)

        kf_T = roll_if_full(state.kf_T_W_B).at[ins].set(T_cur)
        obs_w = roll_if_full(state.obs).at[ins].set(obs_cur)
        obs_m = roll_if_full(state.obs_mask).at[ins].set(obs_cur_mask)
        obs_f = roll_if_full(state.obs_fid).at[ins].set(table.fid)
        kf_count = jnp.minimum(state.kf_count + 1, W)

        eff_mask = obs_m & (obs_f == table.fid[None, :])[:, None, :]
        kf_valid = jnp.arange(W) < kf_count
        eff_mask = eff_mask & kf_valid[:, None, None]
        lm_valid = (lm_fid == table.fid) & (lm_fid >= 0)
        return (kf_T, kf_count, obs_w, obs_m, obs_f, lm, lm_fid, eff_mask,
                lm_valid)

    @jax.jit
    def apply_ba(kf_T, lm, lm_fid, kf_count, res_T, res_lm, success,
                 rig, obs_w, eff_mask, lm_valid):
        """Accept/reject + optional reprojection culling (matches the fused
        kf_branch epilogue)."""
        kf_T = jnp.where(success, res_T, kf_T)
        lm = jnp.where(success, res_lm, lm)
        if cfg.cull_reproj_threshold > 0.0:
            bad = est.reprojection_outliers(
                rig.T_C_B, kf_T, lm, obs_w, eff_mask, lm_valid,
                cfg.cull_reproj_threshold ** 2) & success
            lm_fid = jnp.where(bad, -1, lm_fid)
        T_new = kf_T[jnp.minimum(kf_count, W) - 1]
        return kf_T, lm, lm_fid, T_new

    def step(state: est.EstimatorState, rig: est.CameraRig, img0, img1):
        pyrs = j_frames(img0, img1)
        table, fstats, obs_cur, obs_cur_mask = j_track(state, rig, *pyrs)
        T_cur, pnp_success, is_kf = j_motion(state, rig, table, obs_cur,
                                             obs_cur_mask)

        ba_ok = jnp.asarray(False)
        ba_it = jnp.asarray(0, jnp.int32)
        ba_cost = jnp.asarray(0.0, T_cur.dtype)
        marg_prior = state.marg_prior

        if bool(is_kf):    # host-level branch (see module docstring)
            (kf_T, kf_count, obs_w, obs_m, obs_f, lm, lm_fid, eff_mask,
             lm_valid) = kf_pre(state, rig, table, obs_cur, obs_cur_mask,
                                T_cur)
            kfc = int(kf_count)
            full_now = (kfc >= W) if not cfg.track_before_full else (kfc >= 2)
            if full_now:
                if cfg.use_marginalization:
                    res, marg_prior = dist_ba.solve_ba_marginalized_distributed(
                        mesh, kf_T, rig.T_C_B, lm, obs_w, eff_mask, lm_valid,
                        state.marg_prior, jnp.asarray(kfc >= W), cfg.ba)
                else:
                    res = dist_ba.solve_ba_distributed(
                        mesh, kf_T, rig.T_C_B, lm, obs_w, eff_mask, lm_valid,
                        cfg.ba)
                ba_ok, ba_it, ba_cost = (res.success, res.iterations,
                                         res.final_cost)
                kf_T, lm, lm_fid, T_new = apply_ba(
                    kf_T, lm, lm_fid, kf_count, res.T_W_B, res.landmarks,
                    res.success, rig, obs_w, eff_mask, lm_valid)
            else:
                T_new = kf_T[min(kfc, W) - 1]
            new_state = est.EstimatorState(
                table=table, pyr0=pyrs[0], pyr1=pyrs[1],
                kf_T_W_B=kf_T, kf_count=kf_count,
                obs=obs_w, obs_mask=obs_m, obs_fid=obs_f,
                lm=lm, lm_fid=lm_fid, marg_prior=marg_prior,
                T_W_B=T_new, last_kf_T_W_B=T_new,
                frame_id=state.frame_id + 1)
        else:
            new_state = est.EstimatorState(
                table=table, pyr0=pyrs[0], pyr1=pyrs[1],
                kf_T_W_B=state.kf_T_W_B, kf_count=state.kf_count,
                obs=state.obs, obs_mask=state.obs_mask,
                obs_fid=state.obs_fid,
                lm=state.lm, lm_fid=state.lm_fid, marg_prior=marg_prior,
                T_W_B=T_cur, last_kf_T_W_B=state.last_kf_T_W_B,
                frame_id=state.frame_id + 1)

        out = est.FrameOutput(
            T_W_B=new_state.T_W_B, is_keyframe=is_kf,
            pnp_success=pnp_success, ba_success=ba_ok, ba_iterations=ba_it,
            ba_final_cost=ba_cost, n_tracked=fstats["tracked"],
            n_landmarks=jnp.sum(
                ((new_state.lm_fid == table.fid)
                 & (new_state.lm_fid >= 0)).astype(jnp.int32)),
            n_alive=fstats["alive"])
        return new_state, out

    return step
