"""IMU preintegration tests: residual must vanish on trajectories consistent
with the measurements; bias Jacobians must match re-preintegration to first
order (the derivative-check pattern of the reference's test harness)."""

import jax.numpy as jnp
import numpy as np

from rsvio_tpu.models import imu
from rsvio_tpu.ops import lie

G = np.array([0.0, 0.0, -imu.GRAVITY])


def simulate(n=100, hz=200.0, accel_w=None, omega=None, seed=0):
    """Simulate ground-truth motion + perfect IMU measurements.

    Body starts at origin, R0 = I, v0 given; constant world accel + constant
    body rates. Returns (samples, gt_states at t0/t1).
    """
    rng = np.random.default_rng(seed)
    dt = 1.0 / hz
    accel_w = np.zeros(3) if accel_w is None else accel_w
    omega = np.zeros(3) if omega is None else omega
    v0 = rng.normal(size=3) * 0.5

    R = np.eye(3)
    p = np.zeros(3)
    v = v0.copy()
    gyro, accel, dts = [], [], []
    for _ in range(n):
        # accelerometer measures f = R^T (a_w - g)
        accel.append(R.T @ (accel_w - G))
        gyro.append(omega.copy())
        # integrate GT with the same discretization the preintegration uses
        a_w = R @ accel[-1] + G
        p = p + v * dt + 0.5 * a_w * dt * dt
        v = v + a_w * dt
        R = R @ np.asarray(lie.so3_exp(jnp.asarray(omega * dt, dtype=jnp.float32)))
    T0 = np.eye(4)
    T1 = np.eye(4)
    T1[:3, :3] = R
    T1[:3, 3] = p
    return (np.asarray(gyro, np.float32), np.asarray(accel, np.float32),
            np.full(n, dt, np.float32)), (T0, v0, T1, v)


class TestPreintegration:
    def run_case(self, accel_w, omega, seed=0):
        (gyro, accel, dts), (T0, v0, T1, v1) = simulate(
            accel_w=accel_w, omega=omega, seed=seed)
        mask = np.ones(len(dts), dtype=bool)
        zb = jnp.zeros(3)
        pre = imu.preintegrate(jnp.asarray(gyro), jnp.asarray(accel),
                               jnp.asarray(dts), jnp.asarray(mask), zb, zb)
        r = imu.imu_residual(pre,
                             jnp.asarray(T0, jnp.float32), jnp.asarray(v0, jnp.float32), zb, zb,
                             jnp.asarray(T1, jnp.float32), jnp.asarray(v1, jnp.float32), zb, zb)
        return np.asarray(r), pre

    def test_static_hover(self):
        r, pre = self.run_case(np.zeros(3), np.zeros(3))
        assert np.abs(r).max() < 1e-4, r
        assert abs(float(pre.dt) - 0.5) < 1e-6

    def test_constant_acceleration(self):
        r, _ = self.run_case(np.array([0.5, -0.3, 0.2]), np.zeros(3))
        assert np.abs(r).max() < 1e-3, r

    def test_rotation(self):
        r, _ = self.run_case(np.zeros(3), np.array([0.0, 0.0, 0.8]))
        assert np.abs(r).max() < 2e-3, r

    def test_combined_motion(self):
        r, _ = self.run_case(np.array([0.3, 0.1, -0.2]), np.array([0.2, -0.3, 0.5]))
        assert np.abs(r).max() < 5e-3, r

    def test_masked_padding_ignored(self):
        (gyro, accel, dts), _ = simulate()
        n = len(dts)
        # pad with garbage
        gyro_p = np.concatenate([gyro, np.full((20, 3), 99.0, np.float32)])
        accel_p = np.concatenate([accel, np.full((20, 3), -99.0, np.float32)])
        dts_p = np.concatenate([dts, np.full(20, 0.1, np.float32)])
        mask = np.concatenate([np.ones(n, bool), np.zeros(20, bool)])
        zb = jnp.zeros(3)
        pre_a = imu.preintegrate(jnp.asarray(gyro), jnp.asarray(accel),
                                 jnp.asarray(dts), jnp.ones(n, dtype=bool), zb, zb)
        pre_b = imu.preintegrate(jnp.asarray(gyro_p), jnp.asarray(accel_p),
                                 jnp.asarray(dts_p), jnp.asarray(mask), zb, zb)
        np.testing.assert_allclose(pre_a.dp, pre_b.dp, atol=1e-6)
        np.testing.assert_allclose(pre_a.dR, pre_b.dR, atol=1e-6)
        assert abs(float(pre_a.dt) - float(pre_b.dt)) < 1e-6

    def test_bias_jacobian_first_order(self):
        """Preintegrating with bias b+db must match the first-order correction
        pre(b) + J db (the bias-correction path of imu_residual)."""
        (gyro, accel, dts), _ = simulate(accel_w=np.array([0.2, 0.1, 0.0]),
                                         omega=np.array([0.1, 0.2, -0.1]))
        mask = jnp.ones(len(dts), dtype=bool)
        zb = jnp.zeros(3)
        db = jnp.asarray([2e-3, -1e-3, 1.5e-3])
        pre0 = imu.preintegrate(jnp.asarray(gyro), jnp.asarray(accel),
                                jnp.asarray(dts), mask, zb, zb)
        pre_g = imu.preintegrate(jnp.asarray(gyro), jnp.asarray(accel),
                                 jnp.asarray(dts), mask, db, zb)
        # first-order corrected deltas from pre0
        dv_pred = pre0.dv + pre0.dv_dbg @ db
        dp_pred = pre0.dp + pre0.dp_dbg @ db
        dR_pred = pre0.dR @ lie.so3_exp(pre0.dR_dbg @ db)
        np.testing.assert_allclose(pre_g.dv, dv_pred, atol=5e-4)
        np.testing.assert_allclose(pre_g.dp, dp_pred, atol=5e-4)
        err = lie.so3_log(jnp.asarray(pre_g.dR).T @ dR_pred)
        assert float(jnp.abs(err).max()) < 5e-4

        pre_a = imu.preintegrate(jnp.asarray(gyro), jnp.asarray(accel),
                                 jnp.asarray(dts), mask, zb, db)
        dv_pred = pre0.dv + pre0.dv_dba @ db
        dp_pred = pre0.dp + pre0.dp_dba @ db
        np.testing.assert_allclose(pre_a.dv, dv_pred, atol=5e-4)
        np.testing.assert_allclose(pre_a.dp, dp_pred, atol=5e-4)

    def test_covariance_psd_and_grows(self):
        (gyro, accel, dts), _ = simulate(n=200)
        zb = jnp.zeros(3)
        pre = imu.preintegrate(jnp.asarray(gyro), jnp.asarray(accel),
                               jnp.asarray(dts), jnp.ones(len(dts), bool), zb, zb)
        cov = np.asarray(pre.cov, np.float64)
        np.testing.assert_allclose(cov, cov.T, atol=1e-10)
        eig = np.linalg.eigvalsh(cov)
        assert eig.min() > -1e-12
        assert eig.max() > 0


def test_split_samples_by_keyframes():
    imu_ts = np.arange(0, 1000, 10)  # 100 samples
    kf_ts = np.array([0, 300, 650, 1000])
    idx, mask = imu.split_samples_by_keyframes(imu_ts, kf_ts, 64)
    assert idx.shape == (3, 64)
    assert mask[0].sum() == 30
    assert mask[1].sum() == 35
    assert mask[2].sum() == 35
    # samples land in the right interval
    assert imu_ts[idx[1, 0]] == 300


class TestChaining:
    def test_chain_matches_single_preintegration(self):
        """Splitting a sample stream and chaining the halves must match
        preintegrating the whole stream (deltas, bias Jacobians, covariance
        to first order)."""
        import jax
        from rsvio_tpu.models.estimator_vio import _chain_preint
        (gyro, accel, dts), _ = simulate(
            n=120, accel_w=np.array([0.3, -0.1, 0.2]),
            omega=np.array([0.2, 0.4, -0.3]))
        zb = jnp.zeros(3)
        m = jnp.ones(120, bool)
        whole = imu.preintegrate(jnp.asarray(gyro), jnp.asarray(accel),
                                 jnp.asarray(dts), m, zb, zb)
        h1 = imu.preintegrate(jnp.asarray(gyro[:60]), jnp.asarray(accel[:60]),
                              jnp.asarray(dts[:60]), m[:60], zb, zb)
        h2 = imu.preintegrate(jnp.asarray(gyro[60:]), jnp.asarray(accel[60:]),
                              jnp.asarray(dts[60:]), m[60:], zb, zb)
        chained = _chain_preint(h1, h2)
        np.testing.assert_allclose(chained.dR, whole.dR, atol=1e-5)
        np.testing.assert_allclose(chained.dv, whole.dv, atol=1e-4)
        np.testing.assert_allclose(chained.dp, whole.dp, atol=1e-4)
        assert abs(float(chained.dt) - float(whole.dt)) < 1e-6
        np.testing.assert_allclose(chained.dR_dbg, whole.dR_dbg,
                                   rtol=0.05, atol=5e-3)
        np.testing.assert_allclose(chained.dv_dbg, whole.dv_dbg,
                                   rtol=0.05, atol=5e-3)
        np.testing.assert_allclose(chained.dp_dbg, whole.dp_dbg,
                                   rtol=0.05, atol=5e-3)
        np.testing.assert_allclose(chained.dv_dba, whole.dv_dba,
                                   rtol=0.05, atol=5e-3)
        np.testing.assert_allclose(chained.dp_dba, whole.dp_dba,
                                   rtol=0.05, atol=5e-3)
        # Covariances agree to first order (relative Frobenius)
        ca = np.asarray(chained.cov, np.float64)
        cw = np.asarray(whole.cov, np.float64)
        denom = max(np.linalg.norm(cw), 1e-12)
        assert np.linalg.norm(ca - cw) / denom < 0.1
