"""Visual-inertial estimator: the VO estimator extended with on-device IMU
preintegration, velocity/bias state, IMU-aided motion prediction, and the
joint visual-inertial window solver.

Greenfield capability (BASELINE.json config 4; the reference carries IMU
stubs only — ref src/datasets/mod.rs:21-26, src/estimator/state.rs:12-19).

Design: the per-frame step takes a fixed-capacity IMU sample buffer (the
samples since the previous frame, masked) in addition to the stereo images.
  * Each frame the buffered samples are preintegrated (lax.scan) and chained
    into a running keyframe-interval preintegration (device-resident).
  * Motion prediction: the IMU propagates pose/velocity from the last frame
    (replacing the reference's identity motion model), and PnP refines it.
  * On keyframes the interval preintegration joins the window as an IMU
    factor; the window is solved by models.vio_ba (15-dim states with
    Schur-eliminated landmarks).

Static capacities: IMU_BUF samples per frame (e.g. 32 covers 200 Hz IMU at
>6 Hz frame rate), (W-1) preintegrated intervals in the window.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import lie, pyramid
from . import imu as imu_mod
from . import pnp as pnp_mod
from . import vio_ba
from . import estimator as est_mod
from .estimator import (CameraRig, EstimatorConfig, FrameOutput,
                        _triangulate_new, _undistort_table,
                        reprojection_outliers)
from .frontend import frontend_step, init_table
from .imu import ImuParams, Preintegrated
from .marginalization import MargPrior, empty_prior


class VIOEstimatorConfig(NamedTuple):
    base: EstimatorConfig = EstimatorConfig()
    imu_buf: int = 64                    # max IMU samples per frame
    # Samples buffered per keyframe interval; at KF time the whole interval
    # is re-preintegrated at the CURRENT bias estimate (exact, no first-order
    # chaining error). 512 covers >2.5 s at 200 Hz.
    interval_buf: int = 512
    imu_params: ImuParams = ImuParams()
    vio: vio_ba.VIOBAConfig = vio_ba.VIOBAConfig()


def _empty_preint(dtype=jnp.float32) -> Preintegrated:
    I3 = jnp.eye(3, dtype=dtype)
    Z3 = jnp.zeros((3, 3), dtype=dtype)
    z = jnp.zeros(3, dtype=dtype)
    return Preintegrated(dR=I3, dv=z, dp=z, dt=jnp.zeros((), dtype),
                         dR_dbg=Z3, dv_dbg=Z3, dv_dba=Z3, dp_dbg=Z3,
                         dp_dba=Z3, cov=jnp.zeros((9, 9), dtype=dtype),
                         bias_gyro=z, bias_accel=z)


def _chain_preint(a: Preintegrated, b: Preintegrated) -> Preintegrated:
    """Compose two consecutive preintegrations (same bias point).

    Standard composition: dR = dRa dRb; dv = dva + dRa dvb;
    dp = dpa + dva*dtb + dRa dpb; Jacobians chain to first order.
    """
    dR = a.dR @ b.dR
    dv = a.dv + a.dR @ b.dv
    dp = a.dp + a.dv * b.dt + a.dR @ b.dp
    dR_dbg = b.dR.T @ a.dR_dbg + b.dR_dbg
    # First-order bias sensitivity of a.dR propagates into the composed
    # dv/dp through the rotated b-terms: d(a.dR b.x)/dbg = -a.dR [b.x]x a.dR_dbg.
    hat_bdv = lie.so3_hat(b.dv)
    hat_bdp = lie.so3_hat(b.dp)
    dv_dbg = a.dv_dbg + a.dR @ b.dv_dbg - a.dR @ hat_bdv @ a.dR_dbg
    dv_dba = a.dv_dba + a.dR @ b.dv_dba
    dp_dbg = (a.dp_dbg + a.dv_dbg * b.dt + a.dR @ b.dp_dbg
              - a.dR @ hat_bdp @ a.dR_dbg)
    dp_dba = a.dp_dba + a.dv_dba * b.dt + a.dR @ b.dp_dba
    # Covariance: a's [theta, v, p] errors propagate through the composition;
    # a's rotation error couples into the composed dv/dp via the rotated
    # b-deltas (same structure as the per-sample propagation in
    # imu.preintegrate).
    I3 = jnp.eye(3, dtype=a.cov.dtype)
    A = jnp.zeros((9, 9), dtype=a.cov.dtype)
    A = A.at[0:3, 0:3].set(b.dR.T)
    A = A.at[3:6, 0:3].set(-a.dR @ hat_bdv)
    A = A.at[3:6, 3:6].set(I3)
    A = A.at[6:9, 0:3].set(-a.dR @ hat_bdp)
    A = A.at[6:9, 3:6].set(I3 * b.dt)
    A = A.at[6:9, 6:9].set(I3)
    cov = A @ a.cov @ A.T + b.cov
    return Preintegrated(dR=dR, dv=dv, dp=dp, dt=a.dt + b.dt,
                         dR_dbg=dR_dbg, dv_dbg=dv_dbg, dv_dba=dv_dba,
                         dp_dbg=dp_dbg, dp_dba=dp_dba, cov=cov,
                         bias_gyro=a.bias_gyro, bias_accel=a.bias_accel)


class VIOEstimatorState(NamedTuple):
    table: object
    pyr0: tuple
    pyr1: tuple
    # window (oldest -> newest)
    kf_T_W_B: jnp.ndarray
    kf_vel: jnp.ndarray       # (W,3)
    kf_bg: jnp.ndarray        # (W,3)
    kf_ba: jnp.ndarray        # (W,3)
    kf_count: jnp.ndarray
    obs: jnp.ndarray
    obs_mask: jnp.ndarray
    obs_fid: jnp.ndarray
    # Per-row observation weights at keyframe insertion (FeatureTable.w;
    # consumed when base.use_obs_weights)
    obs_w: jnp.ndarray        # (W,N)
    # IMU preintegration per window interval (W-1 leading dim) + validity
    kf_preint: Preintegrated
    kf_preint_valid: jnp.ndarray  # (W-1,)
    # raw IMU samples buffered since the last keyframe (re-preintegrated at
    # the current bias when the interval closes)
    buf_gyro: jnp.ndarray     # (B,3)
    buf_accel: jnp.ndarray    # (B,3)
    buf_dts: jnp.ndarray      # (B,)
    buf_count: jnp.ndarray    # () int32
    # landmarks
    lm: jnp.ndarray
    lm_fid: jnp.ndarray
    # Marginalization prior over the 15-dim window states (pose + velocity
    # + biases), live when base.use_marginalization is set
    marg_prior: MargPrior
    # current state
    T_W_B: jnp.ndarray
    vel: jnp.ndarray          # (3,)
    bg: jnp.ndarray
    ba: jnp.ndarray
    last_kf_T_W_B: jnp.ndarray
    frame_id: jnp.ndarray
    # Scene-flow dynamic-object gate memory (allocated only when
    # base.dynamic_flow_thresh > 0; see estimator.scene_flow_gate). With
    # the IMU anchoring the pose, the gate's flow measurement is immune to
    # the lock-on ambiguity that limits it in pure VO.
    tri_prev: jnp.ndarray = None
    tri_prev_fid: jnp.ndarray = None
    flow_acc: jnp.ndarray = None
    flow_n: jnp.ndarray = None
    # Frozen birth-time landmark copy for RANSAC verification (allocated
    # only when base.pnp.ransac_hypotheses > 0; see EstimatorState.lm_birth
    # for the design rationale — never refit by BA).
    lm_birth: jnp.ndarray = None
    # Smoothed track-health memory (EstimatorConfig.health_recover);
    # allocated with the gate.
    health_ema: jnp.ndarray = None
    # Per-interval desert factor (1 - track health at the closing keyframe)
    # for the health-gated bias random-walk stiffness; allocated only when
    # vio.bias_*_weight_desert are configured (vio_ba.bias_desert_scales).
    kf_bias_alpha: jnp.ndarray = None   # (W-1,)


def _bias_desert_on(cfg: VIOEstimatorConfig) -> bool:
    """Health-gated bias stiffness engaged? Needs both desert weights set
    AND the RANSAC consensus gate as the health signal (like the other
    adaptive defenses — estimator.validate_adaptive_knobs)."""
    return (cfg.vio.bias_gyro_weight_desert > 0.0
            and cfg.vio.bias_accel_weight_desert > 0.0
            and cfg.base.pnp.ransac_hypotheses > 0)


def init_vio_state(cfg: VIOEstimatorConfig, dtype=jnp.float32) -> VIOEstimatorState:
    b = cfg.base
    N = b.frontend.capacity
    W = b.window_size
    H, Wd = b.image_shape
    shapes = pyramid.pyramid_shapes((H, Wd), b.frontend.klt.levels)
    pyr = tuple(jnp.zeros(s, dtype=dtype) for s in shapes)
    eye = jnp.eye(4, dtype=dtype)
    empty = _empty_preint(dtype)
    kf_pre = jax.tree.map(lambda x: jnp.broadcast_to(x, (W - 1,) + x.shape), empty)
    return VIOEstimatorState(
        table=init_table(N, dtype), pyr0=pyr, pyr1=pyr,
        kf_T_W_B=jnp.broadcast_to(eye, (W, 4, 4)),
        kf_vel=jnp.zeros((W, 3), dtype=dtype),
        kf_bg=jnp.zeros((W, 3), dtype=dtype),
        kf_ba=jnp.zeros((W, 3), dtype=dtype),
        kf_count=jnp.asarray(0, jnp.int32),
        obs=jnp.zeros((W, 2, N, 2), dtype=dtype),
        obs_mask=jnp.zeros((W, 2, N), dtype=bool),
        obs_fid=jnp.full((W, N), -1, jnp.int32),
        obs_w=jnp.ones((W, N), dtype=dtype),
        kf_preint=kf_pre,
        kf_preint_valid=jnp.zeros((W - 1,), dtype=bool),
        buf_gyro=jnp.zeros((cfg.interval_buf, 3), dtype=dtype),
        buf_accel=jnp.zeros((cfg.interval_buf, 3), dtype=dtype),
        buf_dts=jnp.zeros((cfg.interval_buf,), dtype=dtype),
        buf_count=jnp.asarray(0, jnp.int32),
        lm=jnp.zeros((N, 3), dtype=dtype),
        lm_fid=jnp.full((N,), -1, jnp.int32),
        marg_prior=empty_prior(W, 15, dtype),
        T_W_B=eye, vel=jnp.zeros(3, dtype=dtype),
        bg=jnp.zeros(3, dtype=dtype), ba=jnp.zeros(3, dtype=dtype),
        last_kf_T_W_B=eye,
        frame_id=jnp.asarray(0, jnp.int32),
        **(dict(tri_prev=jnp.zeros((N, 3), dtype=dtype),
                tri_prev_fid=jnp.full((N,), -1, jnp.int32),
                flow_acc=jnp.zeros((N, 2), dtype=dtype),
                flow_n=jnp.zeros((N,), jnp.int32))
           if b.dynamic_flow_thresh > 0 else {}),
        **(dict(lm_birth=jnp.zeros((N, 3), dtype=dtype),
                health_ema=jnp.asarray(1.0, dtype))
           if b.pnp.ransac_hypotheses > 0 else {}),
        **(dict(kf_bias_alpha=jnp.zeros((W - 1,), dtype=dtype))
           if _bias_desert_on(cfg) else {}),
    )


def quasi_static_check(gyro, accel, gyro_std_max: float = 0.05,
                       accel_std_max: float = 0.3,
                       gravity_tol: float = 0.05):
    """Validate that an IMU sample window is quasi-static, i.e. usable for
    the gravity-aligned bootstrap.

    On a dataset that starts in motion, mean(gyro) is a WRONG gyro-bias seed
    and mean(accel) includes inertial acceleration, so the bootstrap would
    produce a tilted attitude — actively worse than the identity init. Gate:

      * per-axis gyro sample std below `gyro_std_max` (rad/s),
      * per-axis accel sample std below `accel_std_max` (m/s^2),
      * |mean(accel)| within `gravity_tol` (relative) of 9.81.

    Returns (ok: bool, info: dict) — host-side (numpy), called once at init.
    """
    import numpy as _np
    gyro = _np.asarray(gyro, _np.float64)
    accel = _np.asarray(accel, _np.float64)
    gyro_std = float(_np.max(gyro.std(axis=0))) if len(gyro) > 1 else 0.0
    accel_std = float(_np.max(accel.std(axis=0))) if len(accel) > 1 else 0.0
    acc_norm = float(_np.linalg.norm(accel.mean(axis=0)))
    ok = (gyro_std <= gyro_std_max and accel_std <= accel_std_max
          and abs(acc_norm - imu_mod.GRAVITY) <= gravity_tol * imu_mod.GRAVITY)
    return ok, {"gyro_std": gyro_std, "accel_std": accel_std,
                "accel_norm": acc_norm}


def initialize_vio_state(cfg: VIOEstimatorConfig, gyro, accel,
                         dtype=jnp.float32) -> VIOEstimatorState:
    """Gravity-aligned VIO bootstrap (VINS-style static initialization).

    The bare init_vio_state starts at identity, implicitly assuming gravity
    is body-(-z)-aligned; on a non-level start the IMU residual then fights
    vision from frame 0. This initializer consumes a short quasi-static
    sample window (the samples preceding / around the first frame) and seeds

      * attitude: minimal rotation aligning the mean specific force to
        world +z (attitude_from_gravity; yaw stays free — unobservable),
      * gyro bias: the mean angular rate (zero-rate assumption),
      * velocity zero, accel bias zero (inseparable from tilt at init).

    Frame 0 anchors the world gauge with this pose, so the whole trajectory
    comes out in a gravity-consistent world frame. Greenfield: the reference
    has only stubs here (ref src/estimator/state.rs:12-19, "IMU data
    processing, coming soon").

    Args: gyro, accel: (S, 3) raw samples from the init window (S >= 1).
    """
    state = init_vio_state(cfg, dtype)
    gyro = jnp.asarray(gyro, dtype)
    accel = jnp.asarray(accel, dtype)
    R0 = imu_mod.attitude_from_gravity(jnp.mean(accel, axis=0))
    T0 = lie.se3_from_rt(R0, jnp.zeros(3, dtype))
    bg0 = jnp.mean(gyro, axis=0)
    return state._replace(T_W_B=T0, last_kf_T_W_B=T0, bg=bg0)


def _imu_predict(T_W_B, vel, pre: Preintegrated):
    """Propagate pose/velocity through a preintegrated interval."""
    dtype = T_W_B.dtype
    g = jnp.asarray([0.0, 0.0, -imu_mod.GRAVITY], dtype=dtype)
    R = T_W_B[:3, :3]
    p = T_W_B[:3, 3]
    dt = pre.dt
    p_new = p + vel * dt + 0.5 * g * dt * dt + R @ pre.dp
    v_new = vel + g * dt + R @ pre.dv
    R_new = R @ pre.dR
    return lie.se3_from_rt(R_new, p_new), v_new


class VIOFrontOut(NamedTuple):
    """Outputs of the VIO front stage (pyramids, IMU buffering, frontend,
    motion tracking) — bound by name (see estimator.MotionOut)."""
    pyr0: tuple
    pyr1: tuple
    table: object
    fstats: dict
    obs_cur: jnp.ndarray
    obs_cur_mask: jnp.ndarray
    buf_gyro: jnp.ndarray
    buf_accel: jnp.ndarray
    buf_dts: jnp.ndarray
    buf_count: jnp.ndarray
    v_pred: jnp.ndarray
    mo: est_mod.MotionOut


class VIOKFPrep(NamedTuple):
    """VIO keyframe prologue outputs (see estimator.KFPrep): the visual
    window pieces plus velocity/bias states and the re-preintegrated IMU
    intervals. Consumed identically by the fused single-device step and the
    distributed step (parallel.dist_estimator)."""
    table: object
    kf_T: jnp.ndarray
    kf_v: jnp.ndarray
    kf_bg: jnp.ndarray
    kf_ba: jnp.ndarray
    kf_count: jnp.ndarray
    obs_w: jnp.ndarray
    obs_m: jnp.ndarray
    obs_f: jnp.ndarray
    obs_wt: jnp.ndarray
    kf_preint: Preintegrated
    kf_preint_valid: jnp.ndarray
    lm: jnp.ndarray
    lm_fid: jnp.ndarray
    eff_mask: jnp.ndarray
    lm_valid: jnp.ndarray
    tri_mem: tuple
    n_dyn: jnp.ndarray
    lm_birth: jnp.ndarray
    full_now: jnp.ndarray
    will_evict: jnp.ndarray
    # (W-1,) desert factors for the health-gated bias stiffness (None when
    # the feature is off — see _bias_desert_on).
    bias_alpha: jnp.ndarray = None


class VIOStages(NamedTuple):
    front: callable
    excise: callable
    kf_pre: callable
    kf_post: callable
    ba_solve: callable   # single-device joint solve (dist swaps this)


def _build_vio_stages(cfg: VIOEstimatorConfig) -> VIOStages:
    """The per-frame VIO step as named stage functions, shared verbatim by
    make_vio_estimator_step (fused) and
    parallel.dist_estimator.make_distributed_vio_estimator_step (host-
    orchestrated around the landmark-sharded solve) — the same
    one-pipeline-many-solvers structure as estimator._build_stages."""
    b = cfg.base
    W = b.window_size
    B_cap = cfg.interval_buf
    est_mod.validate_adaptive_knobs(b)
    if ((cfg.vio.bias_gyro_weight_desert > 0.0
         or cfg.vio.bias_accel_weight_desert > 0.0)
            and not _bias_desert_on(cfg)):
        # Refuse half-configured desert stiffness rather than silently
        # ignoring the knob (the ADVICE round-4 failure class).
        raise NotImplementedError(
            "bias_*_weight_desert requires BOTH desert weights set and the "
            "RANSAC consensus gate (pnp.ransac_hypotheses > 0) as the "
            "health signal")

    def stage_front(state: VIOEstimatorState, rig: CameraRig, img0, img1,
                    gyro, accel, dts, imu_mask) -> VIOFrontOut:
        pyr0 = pyramid.build_pyramid(img0, b.frontend.klt.levels)
        pyr1 = pyramid.build_pyramid(img1, b.frontend.klt.levels)

        # ---- this frame's IMU samples: preintegrate for motion prediction
        # and append to the keyframe-interval sample buffer ----
        frame_pre = imu_mod.preintegrate(gyro, accel, dts, imu_mask,
                                         state.bg, state.ba, cfg.imu_params)
        have_samples = jnp.any(imu_mask)
        n_new = jnp.sum(imu_mask.astype(jnp.int32))
        # Scatter the frame's masked samples at buf_count.. (static-shape
        # scatter via target indices; overflow clamps to the last slot and is
        # flagged by buf_count saturating).
        tgt = state.buf_count + jnp.cumsum(imu_mask.astype(jnp.int32)) - 1
        tgt = jnp.where(imu_mask, jnp.clip(tgt, 0, B_cap - 1), B_cap)

        def buf_scatter(buf, vals):
            padded = jnp.concatenate([buf, buf[-1:]], axis=0)
            return padded.at[tgt].set(vals)[:B_cap]

        buf_gyro = buf_scatter(state.buf_gyro, gyro)
        buf_accel = buf_scatter(state.buf_accel, accel)
        buf_dts = buf_scatter(state.buf_dts, dts)
        buf_count = jnp.minimum(state.buf_count + n_new, B_cap)

        # ---- frontend ----
        table_in = state.table._replace(
            alive=state.table.alive & (state.frame_id > 0))
        table, fstats = frontend_step(
            table_in, state.pyr0, state.pyr1, pyr0, pyr1, b.frontend)
        obs_cur, obs_cur_mask = _undistort_table(b, rig, table)

        # ---- IMU motion prediction, then the SHARED motion stage (RANSAC
        # gate + PnP polish + health gate + keyframe policy). The prediction
        # is EXTERNAL (IMU), so it seeds the hypothesis solves, anchors any
        # motion prior, and is the failure fallback.
        T_pred, v_pred = _imu_predict(state.T_W_B, state.vel, frame_pre)
        T_pred = jax.tree.map(
            lambda a, b_: jnp.where(have_samples, a, b_), T_pred, state.T_W_B)
        v_pred = jnp.where(have_samples, v_pred, state.vel)

        mo = est_mod.run_motion(
            b, rig, table, obs_cur, obs_cur_mask,
            state.lm, state.lm_fid, state.lm_birth,
            state.kf_count, state.last_kf_T_W_B, state.frame_id,
            T_pred=T_pred, T_gate_seed=T_pred, T_prior=T_pred,
            T_fallback=T_pred,
            # VIO uses the permanent birth weight (no age ramp — see
            # EstimatorConfig.obs_weight_age_ramp: measured harmful).
            obs_w_slots=(table.w if b.use_obs_weights else None),
            cv_bound_check=False,
            health_prev=state.health_ema)
        return VIOFrontOut(pyr0=pyr0, pyr1=pyr1, table=table, fstats=fstats,
                           obs_cur=obs_cur, obs_cur_mask=obs_cur_mask,
                           buf_gyro=buf_gyro, buf_accel=buf_accel,
                           buf_dts=buf_dts, buf_count=buf_count,
                           v_pred=v_pred, mo=mo)

    def stage_kf_pre(state: VIOEstimatorState, rig: CameraRig, table,
                     obs_cur, obs_cur_mask, buf_gyro, buf_accel, buf_dts,
                     buf_count, T_cur, v_cur, health=1.0) -> VIOKFPrep:
        """Keyframe prologue: triangulation, scene-flow gate, window/preint
        rolls, interval re-preintegration at the current bias, birth
        refinement. `state` must already carry the excised lm_fid."""
        window_full = state.kf_count >= W
        lm, lm_fid, born, tri_all, tri_ok = _triangulate_new(
            rig, T_cur, obs_cur, table, state.lm, state.lm_fid)
        if b.dynamic_flow_thresh > 0:
            from .estimator import scene_flow_gate
            kill_dyn, tri_mem, n_dyn = scene_flow_gate(
                b, rig, T_cur, obs_cur, obs_cur_mask, table,
                tri_all, tri_ok, state.tri_prev, state.tri_prev_fid,
                state.flow_acc, state.flow_n)
            table = table._replace(alive=table.alive & ~kill_dyn)
            lm_fid = jnp.where(kill_dyn, -1, lm_fid)
        else:
            tri_mem = (state.tri_prev, state.tri_prev_fid,
                       state.flow_acc, state.flow_n)
            n_dyn = jnp.asarray(0, jnp.int32)
        obs_cur_mask_eff = obs_cur_mask & table.alive[None, :]
        # Frozen verification map: capture births, never refit.
        lm_birth = (jnp.where(born[:, None], tri_all, state.lm_birth)
                    if state.lm_birth is not None else None)
        ins = jnp.minimum(state.kf_count, W - 1)

        def roll_if_full(arr):
            return jnp.where(window_full, jnp.roll(arr, -1, axis=0), arr)

        kf_T = roll_if_full(state.kf_T_W_B).at[ins].set(T_cur)
        kf_v = roll_if_full(state.kf_vel).at[ins].set(v_cur)
        kf_bg = roll_if_full(state.kf_bg).at[ins].set(state.bg)
        kf_ba_ = roll_if_full(state.kf_ba).at[ins].set(state.ba)
        obs_w = roll_if_full(state.obs).at[ins].set(obs_cur)
        obs_m = roll_if_full(state.obs_mask).at[ins].set(obs_cur_mask_eff)
        obs_f = roll_if_full(state.obs_fid).at[ins].set(table.fid)
        w_ins = table.w
        if b.vision_weight_adaptive:
            # Desert coasting: visual information gathered during
            # low-consensus frames is down-weighted so the IMU factors +
            # priors hold the pose (the round-4 accel-bias leak closes
            # because the dragging visual residuals carry ~h^2 weight).
            w_ins = w_ins * jnp.maximum(jnp.asarray(health, w_ins.dtype),
                                        b.health_floor)
        obs_wt = roll_if_full(state.obs_w).at[ins].set(w_ins)
        # interval i joins KF i and i+1: re-preintegrate the buffered
        # samples at the CURRENT bias estimate (exact — avoids the
        # first-order error of chaining per-frame preintegrations) and
        # land the result at slot ins-1 (valid only when a previous KF
        # exists and the buffer did not overflow).
        buf_mask = jnp.arange(B_cap) < buf_count
        run_pre = imu_mod.preintegrate(
            buf_gyro, buf_accel, buf_dts, buf_mask,
            state.bg, state.ba, cfg.imu_params)
        run_valid = (buf_count > 0) & (buf_count < B_cap)
        pre_roll = jax.tree.map(
            lambda x: jnp.where(window_full, jnp.roll(x, -1, axis=0), x),
            state.kf_preint)
        pv_roll = jnp.where(window_full,
                            jnp.roll(state.kf_preint_valid, -1),
                            state.kf_preint_valid)
        slot = jnp.clip(ins - 1, 0, W - 2)
        kf_pre = jax.tree.map(
            lambda arr, v: arr.at[slot].set(
                jnp.where(ins > 0, v, arr[slot])), pre_roll, run_pre)
        kf_pv = pv_roll.at[slot].set(
            jnp.where(ins > 0, run_valid, pv_roll[slot]))
        if _bias_desert_on(cfg):
            # Desert factor of the interval CLOSING at this keyframe,
            # ramped on the SAME health band as the other adaptive
            # defenses: full stiffness once health <= health_f_lo, base
            # stiffness at >= health_f_hi. The raw (1 - h) mapping
            # measured too soft — during partial occlusion h reads
            # 0.6-0.9 and the log-interpolated stiffness never leaves
            # the loose decade (320px occlusion: 25.5% drift vs 8.0%
            # with full stiffness).
            a_roll = jnp.where(window_full,
                               jnp.roll(state.kf_bias_alpha, -1),
                               state.kf_bias_alpha)
            h_eff = jnp.clip(jnp.asarray(health, a_roll.dtype), 0.0, 1.0)
            a_new = jnp.clip(
                (b.health_f_hi - h_eff)
                / jnp.maximum(b.health_f_hi - b.health_f_lo, 1e-6),
                0.0, 1.0)
            bias_alpha = a_roll.at[slot].set(
                jnp.where(ins > 0, a_new, a_roll[slot]))
        else:
            bias_alpha = state.kf_bias_alpha
        kf_count = jnp.minimum(state.kf_count + 1, W)

        full_now = (kf_count >= W if not b.track_before_full
                    else kf_count >= 2)
        eff_mask = obs_m & (obs_f == table.fid[None, :])[:, None, :]
        kf_valid = jnp.arange(W) < kf_count
        eff_mask = eff_mask & kf_valid[:, None, None]
        lm_valid = (lm_fid == table.fid) & (lm_fid >= 0)

        if b.refine_births:
            # N-view polish of fresh births (see estimator.stage_kf_pre).
            from ..ops.projection import refine_landmarks
            T_B_W_w = jax.vmap(lie.se3_inverse)(kf_T)
            mask_b = eff_mask & born[None, None, :]
            lm_ref, ok_ref = refine_landmarks(rig.T_C_B, T_B_W_w, lm,
                                              obs_w, mask_b)
            lm = jnp.where((born & ok_ref)[:, None], lm_ref, lm)

        return VIOKFPrep(table=table, kf_T=kf_T, kf_v=kf_v, kf_bg=kf_bg,
                         kf_ba=kf_ba_, kf_count=kf_count,
                         obs_w=obs_w, obs_m=obs_m, obs_f=obs_f,
                         obs_wt=obs_wt, kf_preint=kf_pre,
                         kf_preint_valid=kf_pv, lm=lm, lm_fid=lm_fid,
                         eff_mask=eff_mask, lm_valid=lm_valid,
                         tri_mem=tri_mem, n_dyn=n_dyn, lm_birth=lm_birth,
                         full_now=full_now,
                         # will_evict only when the NEXT insert actually
                         # rolls the window (at capacity) so prior slots
                         # stay aligned.
                         will_evict=kf_count >= W,
                         bias_alpha=bias_alpha)

    def ba_solve(prep: VIOKFPrep, rig: CameraRig, marg_prior):
        """Single-device joint visual-inertial window solve; the distributed
        step swaps this for parallel.dist_vio_ba."""
        ba_w = prep.obs_wt if b.use_obs_weights else None
        # Window-max desert factor: biases are ONE chain through the
        # window — pinning only the desert links lets the solver route the
        # same drag through the remaining loose links (measured: per-link
        # alpha 25.5% occlusion drift, window-max 8-9%). Physically the
        # stiffness asserts bias stability over the window HORIZON, which
        # is a property of the whole chain.
        b_alpha = (jnp.broadcast_to(jnp.max(prep.bias_alpha),
                                    prep.bias_alpha.shape)
                   if _bias_desert_on(cfg) else None)
        st = vio_ba.VIOState(T_W_B=prep.kf_T, vel=prep.kf_v, bg=prep.kf_bg,
                             ba=prep.kf_ba)
        if b.use_marginalization:
            res, new_prior = vio_ba.solve_vio_ba_marginalized(
                st, rig.T_C_B, prep.lm, prep.obs_w, prep.eff_mask,
                prep.lm_valid, prep.kf_preint, prep.kf_preint_valid,
                marg_prior, prep.will_evict, cfg.vio, obs_weight=ba_w,
                bias_alpha=b_alpha)
        else:
            res = vio_ba.solve_vio_ba(
                st, rig.T_C_B, prep.lm, prep.obs_w, prep.eff_mask,
                prep.lm_valid, prep.kf_preint, prep.kf_preint_valid,
                cfg.vio, obs_weight=ba_w, bias_alpha=b_alpha)
            new_prior = marg_prior
        return (res.state, res.landmarks, res.success, res.iterations,
                res.final_cost, new_prior)

    def stage_kf_post(prep: VIOKFPrep, rig: CameraRig, res_st, res_lm,
                      ba_ok):
        """Keyframe epilogue: accept/reject + optional reprojection culling
        (see estimator.stage_kf_post)."""
        kf_T = jnp.where(ba_ok, res_st.T_W_B, prep.kf_T)
        kf_v = jnp.where(ba_ok, res_st.vel, prep.kf_v)
        kf_bg = jnp.where(ba_ok, res_st.bg, prep.kf_bg)
        kf_ba_ = jnp.where(ba_ok, res_st.ba, prep.kf_ba)
        lm = jnp.where(ba_ok, res_lm, prep.lm)
        lm_fid = prep.lm_fid
        if b.cull_reproj_threshold > 0.0:
            bad = reprojection_outliers(
                rig.T_C_B, kf_T, lm, prep.obs_w, prep.eff_mask,
                prep.lm_valid, b.cull_reproj_threshold ** 2) & ba_ok
            lm_fid = jnp.where(bad, -1, lm_fid)
        return kf_T, kf_v, kf_bg, kf_ba_, lm, lm_fid

    return VIOStages(front=stage_front, excise=est_mod.excise_outliers,
                     kf_pre=stage_kf_pre, kf_post=stage_kf_post,
                     ba_solve=ba_solve)


def make_vio_estimator_step(cfg: VIOEstimatorConfig):
    """Jitted per-frame VIO step:
    (state, rig, img0, img1, gyro (S,3), accel (S,3), dts (S,), imu_mask (S,))
    -> (state, FrameOutput)."""
    b = cfg.base
    W = b.window_size
    vst = _build_vio_stages(cfg)

    def step(state: VIOEstimatorState, rig: CameraRig, img0, img1,
             gyro, accel, dts, imu_mask):
        fr = vst.front(state, rig, img0, img1, gyro, accel, dts, imu_mask)
        mo = fr.mo
        table, obs_cur_mask, lm_fid0 = vst.excise(
            fr.table, fr.obs_cur_mask, state.lm_fid, mo.kill)
        state = state._replace(lm_fid=lm_fid0)
        T_cur, v_pred, obs_cur = mo.T_cur, fr.v_pred, fr.obs_cur

        def kf_branch(_):
            prep = vst.kf_pre(state, rig, table, obs_cur, obs_cur_mask,
                              fr.buf_gyro, fr.buf_accel, fr.buf_dts,
                              fr.buf_count, T_cur, v_pred, mo.health)

            def run_ba(_):
                return vst.ba_solve(prep, rig, state.marg_prior)

            def skip_ba(_):
                st0 = vio_ba.VIOState(T_W_B=prep.kf_T, vel=prep.kf_v,
                                      bg=prep.kf_bg, ba=prep.kf_ba)
                return (st0, prep.lm, jnp.asarray(False),
                        jnp.asarray(0, jnp.int32),
                        jnp.asarray(0.0, prep.kf_T.dtype), state.marg_prior)

            res_st, res_lm, ba_ok, ba_it, ba_cost, new_prior = jax.lax.cond(
                prep.full_now, run_ba, skip_ba, None)
            kf_T, kf_v, kf_bg, kf_ba_, lm, lm_fid = vst.kf_post(
                prep, rig, res_st, res_lm, ba_ok)
            newest = jnp.minimum(prep.kf_count, W) - 1
            return (kf_T, kf_v, kf_bg, kf_ba_, prep.kf_count,
                    prep.obs_w, prep.obs_m, prep.obs_f, prep.obs_wt,
                    prep.kf_preint, prep.kf_preint_valid, lm, lm_fid,
                    kf_T[newest], kf_v[newest], kf_bg[newest],
                    kf_ba_[newest], kf_T[newest], ba_ok, ba_it, ba_cost,
                    new_prior, jnp.asarray(True),  # reset running preint
                    prep.table.alive, prep.tri_mem, prep.n_dyn,
                    prep.lm_birth, prep.bias_alpha)

        def no_kf_branch(_):
            return (state.kf_T_W_B, state.kf_vel, state.kf_bg, state.kf_ba,
                    state.kf_count, state.obs, state.obs_mask, state.obs_fid,
                    state.obs_w,
                    state.kf_preint, state.kf_preint_valid, state.lm,
                    state.lm_fid,
                    T_cur, v_pred, state.bg, state.ba,
                    state.last_kf_T_W_B, jnp.asarray(False),
                    jnp.asarray(0, jnp.int32), jnp.asarray(0.0, T_cur.dtype),
                    state.marg_prior, jnp.asarray(False),
                    table.alive,
                    (state.tri_prev, state.tri_prev_fid,
                     state.flow_acc, state.flow_n),
                    jnp.asarray(0, jnp.int32), state.lm_birth,
                    state.kf_bias_alpha)

        (kf_T, kf_v, kf_bg, kf_ba_, kf_count, obs_w, obs_m, obs_f, obs_wt,
         kf_pre, kf_pv, lm, lm_fid, T_out, v_out, bg_out, ba_out, last_kf,
         ba_ok, ba_it, ba_cost, marg_prior, reset_run, alive_out, tri_mem,
         n_dyn, lm_birth_out, bias_alpha_out) = jax.lax.cond(
            mo.is_kf, kf_branch, no_kf_branch, None)
        table = table._replace(alive=alive_out)

        # On keyframes the interval sample buffer restarts.
        buf_count_out = jnp.where(reset_run, 0, fr.buf_count)

        new_state = VIOEstimatorState(
            table=table, pyr0=fr.pyr0, pyr1=fr.pyr1,
            kf_T_W_B=kf_T, kf_vel=kf_v, kf_bg=kf_bg, kf_ba=kf_ba_,
            kf_count=kf_count, obs=obs_w, obs_mask=obs_m, obs_fid=obs_f,
            obs_w=obs_wt,
            kf_preint=kf_pre, kf_preint_valid=kf_pv,
            buf_gyro=fr.buf_gyro, buf_accel=fr.buf_accel,
            buf_dts=fr.buf_dts,
            buf_count=buf_count_out,
            lm=lm, lm_fid=lm_fid, marg_prior=marg_prior,
            T_W_B=T_out, vel=v_out, bg=bg_out, ba=ba_out,
            last_kf_T_W_B=last_kf,
            frame_id=state.frame_id + 1,
            tri_prev=tri_mem[0], tri_prev_fid=tri_mem[1],
            flow_acc=tri_mem[2], flow_n=tri_mem[3],
            lm_birth=lm_birth_out,
            health_ema=(mo.health if state.health_ema is not None else None),
            kf_bias_alpha=bias_alpha_out,
        )
        out = FrameOutput(
            T_W_B=T_out, is_keyframe=mo.is_kf, pnp_success=mo.pnp_success,
            ba_success=ba_ok, ba_iterations=ba_it, ba_final_cost=ba_cost,
            n_tracked=fr.fstats["tracked"],
            n_landmarks=jnp.sum(((lm_fid == table.fid)
                                 & (lm_fid >= 0)).astype(jnp.int32)),
            n_alive=fr.fstats["alive"], pose_ok=mo.pose_ok,
            n_dyn_killed=n_dyn,
            n_ransac_inliers=mo.n_inliers, n_pnp_candidates=mo.n_pnp,
            health=mo.health,
        )
        return new_state, out

    return jax.jit(step)
