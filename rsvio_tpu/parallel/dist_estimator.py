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

from ..models import ba as ba_mod  # noqa: F401  (re-export convenience)
from ..models import estimator as est
from . import dist_ba, dist_vio_ba


def make_distributed_estimator_step(cfg: est.EstimatorConfig, mesh):
    """Build the host-orchestrated distributed step:
    (state, rig, img0, img1) -> (state, FrameOutput).

    Landmark capacity (cfg.frontend.capacity) must be divisible by the mesh
    size.

    Every pipeline stage (frontend, RANSAC-gated PnP, outlier excision,
    keyframe prologue/epilogue) is THE SAME function the fused single-device
    step runs (est._build_stages) — only the window solve is swapped for the
    landmark-sharded parallel.dist_ba. The round-4 crash came from this file
    re-implementing the prologue and drifting; now capability knobs (RANSAC
    consensus gate, scene-flow gate, score weights, birth refinement,
    culling) are inherited rather than refused.
    """
    W = cfg.window_size
    N = cfg.frontend.capacity
    n_dev = mesh.devices.size
    if N % n_dev:
        raise ValueError(f"capacity {N} not divisible by mesh size {n_dev}")

    st = est._build_stages(cfg)
    j_frames = jax.jit(st.frames)
    j_track = jax.jit(st.track)
    j_motion = jax.jit(st.motion)
    j_excise = jax.jit(st.excise)
    j_kf_pre = jax.jit(st.kf_pre)
    j_kf_post = jax.jit(st.kf_post)

    def step(state: est.EstimatorState, rig: est.CameraRig, img0, img1):
        pyrs = j_frames(img0, img1)
        table, fstats, obs_cur, obs_cur_mask = j_track(state, rig, *pyrs)
        mo = j_motion(state, rig, table, obs_cur, obs_cur_mask)
        table, obs_cur_mask, lm_fid0 = j_excise(table, obs_cur_mask,
                                                state.lm_fid, mo.kill)
        state = state._replace(lm_fid=lm_fid0)
        T_cur = mo.T_cur

        ba_ok = jnp.asarray(False)
        ba_it = jnp.asarray(0, jnp.int32)
        ba_cost = jnp.asarray(0.0, T_cur.dtype)
        marg_prior = state.marg_prior
        n_dyn = jnp.asarray(0, jnp.int32)

        if bool(mo.is_kf):    # host-level branch (see module docstring)
            prep = j_kf_pre(state, rig, table, obs_cur, obs_cur_mask, T_cur,
                            mo.health)
            ba_w = prep.obs_wt if cfg.use_obs_weights else None
            if bool(prep.full_now):
                if cfg.use_marginalization:
                    res, marg_prior = dist_ba.solve_ba_marginalized_distributed(
                        mesh, prep.kf_T, rig.T_C_B, prep.lm, prep.obs_w,
                        prep.eff_mask, prep.lm_valid, state.marg_prior,
                        prep.will_evict, cfg.ba, obs_weight=ba_w)
                else:
                    res = dist_ba.solve_ba_distributed(
                        mesh, prep.kf_T, rig.T_C_B, prep.lm, prep.obs_w,
                        prep.eff_mask, prep.lm_valid, cfg.ba, obs_weight=ba_w)
                ba_ok, ba_it, ba_cost = (res.success, res.iterations,
                                         res.final_cost)
                res_T, res_lm = res.T_W_B, res.landmarks
            else:
                res_T, res_lm = prep.kf_T, prep.lm
            kf_T, lm, lm_fid, T_new = j_kf_post(prep, rig, res_T, res_lm,
                                                ba_ok)
            n_dyn = prep.n_dyn
            new_state = est.EstimatorState(
                table=prep.table, pyr0=pyrs[0], pyr1=pyrs[1],
                kf_T_W_B=kf_T, kf_count=prep.kf_count,
                obs=prep.obs_w, obs_mask=prep.obs_m, obs_fid=prep.obs_f,
                obs_w=prep.obs_wt,
                lm=lm, lm_fid=lm_fid, marg_prior=marg_prior,
                T_W_B=T_new, last_kf_T_W_B=T_new,
                frame_id=state.frame_id + 1,
                T_W_B_prev=state.T_W_B,
                tri_prev=prep.tri_mem[0], tri_prev_fid=prep.tri_mem[1],
                flow_acc=prep.tri_mem[2], flow_n=prep.tri_mem[3],
                lm_birth=prep.lm_birth,
                health_ema=(mo.health if state.health_ema is not None
                            else None))
            out_table = prep.table
        else:
            new_state = est.EstimatorState(
                table=table, pyr0=pyrs[0], pyr1=pyrs[1],
                kf_T_W_B=state.kf_T_W_B, kf_count=state.kf_count,
                obs=state.obs, obs_mask=state.obs_mask,
                obs_fid=state.obs_fid, obs_w=state.obs_w,
                lm=state.lm, lm_fid=state.lm_fid, marg_prior=marg_prior,
                T_W_B=T_cur, last_kf_T_W_B=state.last_kf_T_W_B,
                frame_id=state.frame_id + 1,
                T_W_B_prev=state.T_W_B,
                tri_prev=state.tri_prev, tri_prev_fid=state.tri_prev_fid,
                flow_acc=state.flow_acc, flow_n=state.flow_n,
                lm_birth=state.lm_birth,
                health_ema=(mo.health if state.health_ema is not None
                            else None))
            out_table = table

        out = est.FrameOutput(
            T_W_B=new_state.T_W_B, is_keyframe=mo.is_kf,
            pnp_success=mo.pnp_success, ba_success=ba_ok,
            ba_iterations=ba_it,
            ba_final_cost=ba_cost, n_tracked=fstats["tracked"],
            n_landmarks=jnp.sum(
                ((new_state.lm_fid == out_table.fid)
                 & (new_state.lm_fid >= 0)).astype(jnp.int32)),
            n_alive=fstats["alive"], pose_ok=mo.pose_ok, n_dyn_killed=n_dyn,
            n_ransac_inliers=mo.n_inliers, n_pnp_candidates=mo.n_pnp,
            health=mo.health)
        return new_state, out

    return step


def make_distributed_vio_estimator_step(vcfg, mesh):
    """Distributed VISUAL-INERTIAL per-frame step: the full VIO pipeline
    (IMU buffering + prediction, frontend, RANSAC-gated PnP, keyframe
    policy) with the joint 15-dim-state window solve landmark-sharded over
    `mesh` via parallel.dist_vio_ba. Same host-orchestrated structure and
    rationale as make_distributed_estimator_step; every stage is shared
    with the fused step via estimator_vio._build_vio_stages, so parity
    (tests/test_dist_estimator.py) is structural, not coincidental.

    vcfg: models.estimator_vio.VIOEstimatorConfig.
    Signature matches make_vio_estimator_step:
    (state, rig, img0, img1, gyro, accel, dts, imu_mask) -> (state, out).
    """
    from ..models import estimator_vio as ev

    b = vcfg.base
    W = b.window_size
    N = b.frontend.capacity
    n_dev = mesh.devices.size
    if N % n_dev:
        raise ValueError(f"capacity {N} not divisible by mesh size {n_dev}")

    vst = ev._build_vio_stages(vcfg)
    j_front = jax.jit(vst.front)
    j_excise = jax.jit(vst.excise)
    j_kf_pre = jax.jit(vst.kf_pre)
    j_kf_post = jax.jit(vst.kf_post)

    def step(state: ev.VIOEstimatorState, rig, img0, img1, gyro, accel,
             dts, imu_mask):
        fr = j_front(state, rig, img0, img1, gyro, accel, dts, imu_mask)
        mo = fr.mo
        table, obs_cur_mask, lm_fid0 = j_excise(
            fr.table, fr.obs_cur_mask, state.lm_fid, mo.kill)
        state = state._replace(lm_fid=lm_fid0)
        T_cur, v_pred = mo.T_cur, fr.v_pred

        ba_ok = jnp.asarray(False)
        ba_it = jnp.asarray(0, jnp.int32)
        ba_cost = jnp.asarray(0.0, T_cur.dtype)
        marg_prior = state.marg_prior
        n_dyn = jnp.asarray(0, jnp.int32)

        if bool(mo.is_kf):    # host-level branch (see module docstring)
            prep = j_kf_pre(state, rig, table, fr.obs_cur, obs_cur_mask,
                            fr.buf_gyro, fr.buf_accel, fr.buf_dts,
                            fr.buf_count, T_cur, v_pred, mo.health)
            ba_w = prep.obs_wt if b.use_obs_weights else None
            # Window-max desert factor — matches the fused ba_solve (the
            # bias chain is pinned as a whole; see estimator_vio).
            b_alpha = (jnp.broadcast_to(jnp.max(prep.bias_alpha),
                                        prep.bias_alpha.shape)
                       if ev._bias_desert_on(vcfg) else None)
            if bool(prep.full_now):
                st = dist_vio_ba.vio_ba.VIOState(
                    T_W_B=prep.kf_T, vel=prep.kf_v, bg=prep.kf_bg,
                    ba=prep.kf_ba)
                if b.use_marginalization:
                    res, marg_prior = \
                        dist_vio_ba.solve_vio_ba_marginalized_distributed(
                            mesh, st, rig.T_C_B, prep.lm, prep.obs_w,
                            prep.eff_mask, prep.lm_valid, prep.kf_preint,
                            prep.kf_preint_valid, state.marg_prior,
                            prep.will_evict, vcfg.vio, obs_weight=ba_w,
                            bias_alpha=b_alpha)
                else:
                    res = dist_vio_ba.solve_vio_ba_distributed(
                        mesh, st, rig.T_C_B, prep.lm, prep.obs_w,
                        prep.eff_mask, prep.lm_valid, prep.kf_preint,
                        prep.kf_preint_valid, vcfg.vio, obs_weight=ba_w,
                        bias_alpha=b_alpha)
                ba_ok, ba_it, ba_cost = (res.success, res.iterations,
                                         res.final_cost)
                res_st, res_lm = res.state, res.landmarks
            else:
                res_st = dist_vio_ba.vio_ba.VIOState(
                    T_W_B=prep.kf_T, vel=prep.kf_v, bg=prep.kf_bg,
                    ba=prep.kf_ba)
                res_lm = prep.lm
            kf_T, kf_v, kf_bg, kf_ba_, lm, lm_fid = j_kf_post(
                prep, rig, res_st, res_lm, ba_ok)
            n_dyn = prep.n_dyn
            newest = min(int(prep.kf_count), W) - 1
            new_state = ev.VIOEstimatorState(
                table=prep.table, pyr0=fr.pyr0, pyr1=fr.pyr1,
                kf_T_W_B=kf_T, kf_vel=kf_v, kf_bg=kf_bg, kf_ba=kf_ba_,
                kf_count=prep.kf_count, obs=prep.obs_w, obs_mask=prep.obs_m,
                obs_fid=prep.obs_f, obs_w=prep.obs_wt,
                kf_preint=prep.kf_preint, kf_preint_valid=prep.kf_preint_valid,
                buf_gyro=fr.buf_gyro, buf_accel=fr.buf_accel,
                buf_dts=fr.buf_dts,
                buf_count=jnp.zeros_like(fr.buf_count),  # keyframe resets
                lm=lm, lm_fid=lm_fid, marg_prior=marg_prior,
                T_W_B=kf_T[newest], vel=kf_v[newest], bg=kf_bg[newest],
                ba=kf_ba_[newest], last_kf_T_W_B=kf_T[newest],
                frame_id=state.frame_id + 1,
                tri_prev=prep.tri_mem[0], tri_prev_fid=prep.tri_mem[1],
                flow_acc=prep.tri_mem[2], flow_n=prep.tri_mem[3],
                lm_birth=prep.lm_birth,
                health_ema=(mo.health if state.health_ema is not None
                            else None),
                kf_bias_alpha=prep.bias_alpha)
            out_table = prep.table
        else:
            new_state = state._replace(
                table=table, pyr0=fr.pyr0, pyr1=fr.pyr1,
                buf_gyro=fr.buf_gyro, buf_accel=fr.buf_accel,
                buf_dts=fr.buf_dts,
                buf_count=fr.buf_count,
                T_W_B=T_cur, vel=v_pred,
                frame_id=state.frame_id + 1,
                **({} if state.health_ema is None
                   else dict(health_ema=mo.health)))
            out_table = table

        out = est.FrameOutput(
            T_W_B=new_state.T_W_B, is_keyframe=mo.is_kf,
            pnp_success=mo.pnp_success, ba_success=ba_ok,
            ba_iterations=ba_it,
            ba_final_cost=ba_cost, n_tracked=fr.fstats["tracked"],
            n_landmarks=jnp.sum(
                ((new_state.lm_fid == out_table.fid)
                 & (new_state.lm_fid >= 0)).astype(jnp.int32)),
            n_alive=fr.fstats["alive"], pose_ok=mo.pose_ok,
            n_dyn_killed=n_dyn,
            n_ransac_inliers=mo.n_inliers, n_pnp_candidates=mo.n_pnp,
            health=mo.health)
        return new_state, out

    return step
