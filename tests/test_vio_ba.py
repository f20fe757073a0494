"""Visual-inertial BA tests: synthetic trajectory with consistent IMU
measurements + stereo observations; the joint solve must recover poses AND
velocities, and IMU factors must constrain what vision alone cannot."""

import jax
import jax.numpy as jnp
import numpy as np

from rsvio_tpu.models import imu, vio_ba
from rsvio_tpu.ops import lie

W_KF = 4
N_LM = 24
KF_DT = 0.25     # s between keyframes
IMU_HZ = 200.0


def make_vio_problem(seed=0, pose_noise=0.02, vel_noise=0.05, lm_noise=0.05):
    """Constant-velocity trajectory + stereo observations + perfect IMU."""
    rng = np.random.default_rng(seed)
    g = np.array([0.0, 0.0, -imu.GRAVITY])
    v_const = np.array([0.4, 0.1, 0.0])

    T_C_B = jnp.stack([
        jnp.eye(4, dtype=jnp.float32),
        jnp.eye(4, dtype=jnp.float32).at[0, 3].set(-0.11),
    ])

    # GT states (no rotation, constant velocity; accel measures -g in body)
    poses, vels = [], []
    for i in range(W_KF):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = v_const * KF_DT * i
        poses.append(T)
        vels.append(v_const.copy())
    T_gt = jnp.asarray(np.stack(poses))
    v_gt = jnp.asarray(np.stack(vels), dtype=jnp.float32)

    # IMU buffers per interval
    n_s = int(KF_DT * IMU_HZ)
    dt = 1.0 / IMU_HZ
    gyro = np.zeros((W_KF - 1, n_s, 3), np.float32)
    accel = np.tile((-g).astype(np.float32), (W_KF - 1, n_s, 1))
    dts = np.full((W_KF - 1, n_s), dt, np.float32)
    mask_imu = np.ones((W_KF - 1, n_s), bool)
    zb = jnp.zeros(3)
    pre = jax.vmap(lambda gy, ac, d, m: imu.preintegrate(gy, ac, d, m, zb, zb))(
        jnp.asarray(gyro), jnp.asarray(accel), jnp.asarray(dts),
        jnp.asarray(mask_imu))
    pre_valid = jnp.ones(W_KF - 1, dtype=bool)

    # Landmarks + stereo observations
    p_gt = np.stack([rng.uniform(-2, 3, N_LM), rng.uniform(-2, 2, N_LM),
                     rng.uniform(3, 8, N_LM)], axis=1).astype(np.float32)
    obs = np.zeros((W_KF, 2, N_LM, 2), np.float32)
    mask = np.zeros((W_KF, 2, N_LM), bool)
    for i in range(W_KF):
        T_B_W = np.asarray(lie.se3_inverse(T_gt[i]))
        for c in range(2):
            Tcb = np.asarray(T_C_B[c])
            pC = (Tcb[:3, :3] @ (T_B_W[:3, :3] @ p_gt.T + T_B_W[:3, 3:4])
                  + Tcb[:3, 3:4]).T
            ok = pC[:, 2] > 0.5
            obs[i, c, ok] = pC[ok, :2] / pC[ok, 2:3]
            mask[i, c] = ok

    # Perturb
    poses_i = [np.asarray(T_gt[0])]
    for i in range(1, W_KF):
        dR = np.asarray(lie.so3_exp(jnp.asarray(
            rng.normal(size=3) * 0.01, dtype=jnp.float32)))
        T = np.asarray(T_gt[i]).copy()
        T[:3, :3] = T[:3, :3] @ dR
        T[:3, 3] += rng.normal(size=3) * pose_noise
        poses_i.append(T)
    state0 = vio_ba.VIOState(
        T_W_B=jnp.asarray(np.stack(poses_i), dtype=jnp.float32),
        vel=v_gt + jnp.asarray(rng.normal(size=(W_KF, 3)) * vel_noise,
                               dtype=jnp.float32),
        bg=jnp.zeros((W_KF, 3), dtype=jnp.float32),
        ba=jnp.zeros((W_KF, 3), dtype=jnp.float32),
    )
    lms0 = jnp.asarray(p_gt + rng.normal(size=p_gt.shape) * lm_noise,
                       dtype=jnp.float32)
    return (state0, T_C_B, lms0, jnp.asarray(obs), jnp.asarray(mask),
            jnp.ones(N_LM, bool), pre, pre_valid, T_gt, v_gt, jnp.asarray(p_gt))


class TestVIOBA:
    def test_recovers_poses_and_velocities(self):
        (st0, T_C_B, lms, obs, mask, lm_valid, pre, pre_valid,
         T_gt, v_gt, p_gt) = make_vio_problem(seed=1)
        res = vio_ba.solve_vio_ba(st0, T_C_B, lms, obs, mask, lm_valid,
                                  pre, pre_valid)
        assert bool(res.success)
        assert float(res.final_cost) < float(res.initial_cost) * 0.1
        t_err = np.abs(np.asarray(res.state.T_W_B[:, :3, 3])
                       - np.asarray(T_gt[:, :3, 3])).max()
        assert t_err < 0.02, f"pose error {t_err}"
        v_err = np.abs(np.asarray(res.state.vel) - np.asarray(v_gt)).max()
        assert v_err < 0.05, f"velocity error {v_err}"

    def test_imu_only_intervals_constrain_velocity(self):
        """With NO visual observations the under-constrained gate may pass on
        IMU blocks alone; velocities must still move toward consistency."""
        (st0, T_C_B, lms, obs, mask, lm_valid, pre, pre_valid,
         T_gt, v_gt, p_gt) = make_vio_problem(seed=2, vel_noise=0.2)
        res = vio_ba.solve_vio_ba(st0, T_C_B, lms, obs, mask, lm_valid,
                                  pre, pre_valid)
        assert bool(res.success)
        v_err0 = np.abs(np.asarray(st0.vel) - np.asarray(v_gt)).max()
        v_err1 = np.abs(np.asarray(res.state.vel) - np.asarray(v_gt)).max()
        assert v_err1 < v_err0 * 0.5, f"{v_err0} -> {v_err1}"

    def test_invalid_preint_ignored(self):
        (st0, T_C_B, lms, obs, mask, lm_valid, pre, pre_valid,
         T_gt, v_gt, p_gt) = make_vio_problem(seed=3)
        res_with = vio_ba.solve_vio_ba(st0, T_C_B, lms, obs, mask, lm_valid,
                                       pre, pre_valid)
        res_without = vio_ba.solve_vio_ba(
            st0, T_C_B, lms, obs, mask, lm_valid, pre,
            jnp.zeros_like(pre_valid))
        assert bool(res_with.success) and bool(res_without.success)
        # without IMU, velocities are unconstrained -> stay at the prior
        np.testing.assert_allclose(res_without.state.vel, st0.vel, atol=1e-5)

    def test_gauge_first_pose_fixed(self):
        (st0, T_C_B, lms, obs, mask, lm_valid, pre, pre_valid,
         *_rest) = make_vio_problem(seed=4)
        res = vio_ba.solve_vio_ba(st0, T_C_B, lms, obs, mask, lm_valid,
                                  pre, pre_valid)
        assert bool(res.success)
        np.testing.assert_allclose(res.state.T_W_B[0], st0.T_W_B[0], atol=1e-5)
