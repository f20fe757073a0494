"""Lie-group unit tests: exp/log round-trips incl. small-angle branches,
algebraic identities, and agreement with scipy where available.

Mirrors the test strategy of the reference's SE2 exp/log round-trip tests
(ref feature_tracker/src/feature_tracker/feature_tracking.rs:246-292).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsvio_tpu.ops import lie

RNG = np.random.default_rng(42)


def rand_w(scale=1.0):
    return jnp.asarray(RNG.normal(size=3) * scale, dtype=jnp.float32)


class TestSO3:
    def test_exp_is_rotation(self):
        for scale in [1e-10, 1e-5, 0.1, 1.0, 3.0]:
            R = lie.so3_exp(rand_w(scale))
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
            assert abs(np.linalg.det(R) - 1.0) < 1e-5

    def test_exp_log_roundtrip(self):
        for scale in [1e-6, 1e-3, 0.5, 2.0, 3.0]:
            w = rand_w(scale)
            # keep |w| < pi for log uniqueness
            n = np.linalg.norm(w)
            if n >= np.pi:
                w = w / n * 3.0
            w2 = lie.so3_log(lie.so3_exp(w))
            np.testing.assert_allclose(w2, w, atol=2e-4)

    def test_zero(self):
        R = lie.so3_exp(jnp.zeros(3))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-7)
        np.testing.assert_allclose(lie.so3_log(jnp.eye(3)), np.zeros(3), atol=1e-7)

    def test_matches_scipy(self):
        from scipy.spatial.transform import Rotation
        for _ in range(5):
            w = RNG.normal(size=3)
            R_ref = Rotation.from_rotvec(w).as_matrix()
            R = lie.so3_exp(jnp.asarray(w, dtype=jnp.float32))
            np.testing.assert_allclose(R, R_ref, atol=1e-5)

    def test_grad_finite_at_zero(self):
        g = jax.jacobian(lie.so3_exp)(jnp.zeros(3))
        assert np.all(np.isfinite(g))

    def test_vmap(self):
        ws = jnp.asarray(RNG.normal(size=(16, 3)), dtype=jnp.float32)
        Rs = jax.vmap(lie.so3_exp)(ws)
        assert Rs.shape == (16, 3, 3)


class TestQuat:
    def test_rot_quat_roundtrip(self):
        for scale in [1e-6, 0.1, 1.0, 3.0]:
            R = lie.so3_exp(rand_w(scale))
            q = lie.rot_to_quat(R)
            np.testing.assert_allclose(lie.quat_to_rot(q), R, atol=1e-5)

    def test_quat_mul_matches_rot_mul(self):
        Ra, Rb = lie.so3_exp(rand_w()), lie.so3_exp(rand_w())
        qa, qb = lie.rot_to_quat(Ra), lie.rot_to_quat(Rb)
        np.testing.assert_allclose(
            lie.quat_to_rot(lie.quat_mul(qa, qb)), Ra @ Rb, atol=1e-5)

    def test_all_shepperd_regimes(self):
        # Rotations near pi about each axis exercise every where-branch.
        for axis in np.eye(3):
            R = lie.so3_exp(jnp.asarray(axis * 3.1, dtype=jnp.float32))
            q = lie.rot_to_quat(R)
            np.testing.assert_allclose(lie.quat_to_rot(q), R, atol=1e-4)


class TestSE3:
    def rand_T(self, scale=1.0):
        return lie.se3_from_rt(lie.so3_exp(rand_w(scale)),
                               jnp.asarray(RNG.normal(size=3), dtype=jnp.float32))

    def test_exp_log_roundtrip(self):
        for scale in [1e-6, 0.3, 1.5]:
            xi = jnp.asarray(RNG.normal(size=6) * scale, dtype=jnp.float32)
            xi2 = lie.se3_log(lie.se3_exp(xi))
            np.testing.assert_allclose(xi2, xi, atol=3e-4)

    def test_inverse(self):
        T = self.rand_T()
        np.testing.assert_allclose(T @ lie.se3_inverse(T), np.eye(4), atol=1e-5)

    def test_packed_roundtrip(self):
        T = self.rand_T()
        np.testing.assert_allclose(lie.se3_from_packed(lie.se3_to_packed(T)), T, atol=1e-5)

    def test_retract_split_zero(self):
        T = self.rand_T()
        np.testing.assert_allclose(lie.se3_retract_split(T, jnp.zeros(6)), T, atol=1e-6)

    def test_apply(self):
        T = self.rand_T()
        p = jnp.asarray(RNG.normal(size=3), dtype=jnp.float32)
        ph = T @ jnp.concatenate([p, jnp.ones(1)])
        np.testing.assert_allclose(lie.se3_apply(T, p), ph[:3], atol=1e-6)

    def test_rotation_angle(self):
        w = rand_w(0.7)
        theta = float(jnp.linalg.norm(w))
        assert abs(float(lie.rotation_angle(lie.so3_exp(w))) - theta) < 1e-4


class TestSE2:
    def test_exp_log_roundtrip(self):
        for scale in [1e-8, 1e-4, 0.1, 1.0]:
            xi = jnp.asarray(RNG.normal(size=3) * scale, dtype=jnp.float32)
            xi2 = lie.se2_log(lie.se2_exp(xi))
            np.testing.assert_allclose(xi2, xi, atol=max(1e-5, scale * 1e-4))

    def test_exp_zero_is_identity(self):
        np.testing.assert_allclose(lie.se2_exp(jnp.zeros(3)), np.eye(3), atol=1e-7)

    def test_pure_translation(self):
        M = lie.se2_exp(jnp.asarray([2.0, -3.0, 0.0], dtype=jnp.float32))
        np.testing.assert_allclose(M[:2, 2], [2.0, -3.0], atol=1e-6)
        np.testing.assert_allclose(M[:2, :2], np.eye(2), atol=1e-6)

    def test_rotation_block_orthonormal(self):
        M = lie.se2_exp(jnp.asarray([0.5, 0.2, 0.8], dtype=jnp.float32))
        R = M[:2, :2]
        np.testing.assert_allclose(R @ R.T, np.eye(2), atol=1e-6)
