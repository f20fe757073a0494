"""Gravity-aligned VIO initialization (VERDICT round-1 item 2): a
deliberately tilted initial attitude, bootstrapped from static accelerometer
samples, must converge to the same drift class as a level start.

The reference has only stubs here (ref src/estimator/state.rs:12-19); this
is the greenfield capability that makes BASELINE config 4 work on non-level
real-world starts."""

import numpy as np
import jax.numpy as jnp
import pytest

from rsvio_tpu.data import synthetic as syn
from rsvio_tpu.models import estimator_vio as ev
from rsvio_tpu.models import imu as imu_mod
from rsvio_tpu.utils import evaluation as ev_util


class TestAttitudeFromGravity:
    def test_random_tilts_align_to_world_z(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            axis = rng.normal(size=3)
            axis /= np.linalg.norm(axis)
            ang = rng.uniform(0, np.pi - 0.2)
            from rsvio_tpu.ops import lie
            R_gt = np.asarray(lie.so3_exp(jnp.asarray(axis * ang,
                                                      jnp.float32)))
            accel = R_gt.T @ np.array([0.0, 0.0, 9.81])
            R = np.asarray(imu_mod.attitude_from_gravity(
                jnp.asarray(accel, jnp.float32)))
            out = R @ (accel / np.linalg.norm(accel))
            np.testing.assert_allclose(out, [0, 0, 1], atol=1e-5)

    def test_upside_down(self):
        accel = jnp.asarray([0.0, 0.0, -9.81], jnp.float32)
        R = np.asarray(imu_mod.attitude_from_gravity(accel))
        np.testing.assert_allclose(R @ np.array([0, 0, -1.0]), [0, 0, 1],
                                   atol=1e-5)

    def test_initialize_vio_state_seeds_attitude_and_bias(self):
        traj = syn.tilted(syn.traj_forward(speed=0.0), roll_deg=20.0,
                          pitch_deg=-12.0)
        gyro, accel = ev_util.static_init_imu(
            traj, gyro_bias=[0.004, -0.003, 0.002])
        cfg = ev.VIOEstimatorConfig()
        state = ev.initialize_vio_state(cfg, gyro, accel)
        # Recovered attitude maps the true body gravity direction to +z.
        g_body = traj.pose(0.0)[:3, :3].T @ (-syn.GRAVITY_W)
        up = np.asarray(state.T_W_B[:3, :3]) @ (g_body / np.linalg.norm(g_body))
        np.testing.assert_allclose(up, [0, 0, 1], atol=1e-4)
        np.testing.assert_allclose(np.asarray(state.bg),
                                   [0.004, -0.003, 0.002], atol=1e-4)
        # Pose anchored at the origin, velocity zero.
        np.testing.assert_allclose(np.asarray(state.T_W_B[:3, 3]), 0.0)
        np.testing.assert_allclose(np.asarray(state.vel), 0.0)


@pytest.mark.slow
class TestTiltedStartE2E:
    def _run(self, tilt):
        import dataclasses
        H, W = 120, 188
        # Plane at 2.5 m: at this reduced resolution the stereo disparity
        # stays ~5 px so depth is actually observable (at 5 m it degrades
        # to ~2.5 px and scale drifts regardless of initialization).
        scene = dataclasses.replace(
            syn.scene_easy_plane(H=H, W=W),
            planes=[syn._frontal_plane(2.5, 7.0, 5.0, 0)])
        traj = syn.traj_6dof(lin_amp=(0.5, 0.2, 0.15),
                             ang_amp_deg=(4.0, 3.0, 2.0))
        if tilt:
            traj = syn.tilted(traj, roll_deg=15.0, pitch_deg=-10.0)
        seq = syn.generate_sequence(scene, traj, 18, fps=10.0,
                                    imu_rate=200.0)
        gyro, accel = ev_util.static_init_imu(traj)
        return ev_util.run_synthetic_sequence(
            seq, scene, use_vio=True, capacity=96, window=5, levels=3,
            translation_threshold=0.03, rotation_threshold=0.03,
            cell_size=24, detect_margin=10,
            init_gyro=gyro, init_accel=accel)

    def test_tilted_start_matches_level_start(self):
        level = self._run(tilt=False)
        tilted = self._run(tilt=True)
        assert level.ate_rmse < 0.05, (level.ate_rmse, level.positions[-3:])
        assert tilted.ate_rmse < max(2.5 * level.ate_rmse, 0.06), (
            f"tilted {tilted.ate_rmse:.4f} vs level {level.ate_rmse:.4f}")
        assert tilted.n_tracked_mean > 20
