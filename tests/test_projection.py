"""Projection residual/Jacobian tests: analytic Jacobians must match autodiff
(the strongest form of the reference's finite-difference derivative checks),
cheirality guard, Huber weighting, stereo triangulation."""

import jax
import jax.numpy as jnp
import numpy as np

from rsvio_tpu.ops import lie, projection

RNG = np.random.default_rng(9)


def rand_pose(scale=0.5):
    R = lie.so3_exp(jnp.asarray(RNG.normal(size=3) * scale, dtype=jnp.float32))
    t = jnp.asarray(RNG.normal(size=3), dtype=jnp.float32)
    return lie.se3_from_rt(R, t)


def setup_obs():
    T_C_B = rand_pose(0.1)
    T_B_W = rand_pose(0.3)
    # Landmark guaranteed in front: build from a camera-frame point
    p_C = jnp.asarray([0.3, -0.2, 3.0], dtype=jnp.float32)
    T_W_C = lie.se3_inverse(T_C_B @ T_B_W)
    p_W = lie.se3_apply(T_W_C, p_C)
    obs = jnp.asarray([0.05, -0.1], dtype=jnp.float32)
    return T_C_B, T_B_W, p_W, obs


class TestJacobians:
    def test_pose_jacobian_matches_autodiff(self):
        T_C_B, T_B_W, p_W, obs = setup_obs()
        mask = jnp.asarray(True)
        # big huber delta -> weight 1, no whitening
        lin = projection.linearize_projection(T_C_B, T_B_W, p_W, obs, mask, 1e6)

        def res_of_delta(delta):
            T = lie.se3_retract_split(T_B_W, delta)
            l = projection.linearize_projection(T_C_B, T, p_W, obs, mask, 1e6)
            return l.r

        J_auto = jax.jacobian(res_of_delta)(jnp.zeros(6, dtype=jnp.float32))
        np.testing.assert_allclose(lin.J_pose, J_auto, atol=1e-4)

    def test_landmark_jacobian_matches_autodiff(self):
        T_C_B, T_B_W, p_W, obs = setup_obs()
        mask = jnp.asarray(True)
        lin = projection.linearize_projection(T_C_B, T_B_W, p_W, obs, mask, 1e6)

        def res_of_p(p):
            l = projection.linearize_projection(T_C_B, T_B_W, p, obs, mask, 1e6)
            return l.r

        J_auto = jax.jacobian(res_of_p)(p_W)
        np.testing.assert_allclose(lin.J_lm, J_auto, atol=1e-4)

    def test_cheirality_guard(self):
        T_C_B = jnp.eye(4, dtype=jnp.float32)
        T_B_W = jnp.eye(4, dtype=jnp.float32)
        p_behind = jnp.asarray([0.1, 0.1, -2.0], dtype=jnp.float32)
        lin = projection.linearize_projection(
            T_C_B, T_B_W, p_behind, jnp.zeros(2), jnp.asarray(True), 1e6)
        assert not bool(lin.valid)
        assert float(jnp.abs(lin.r).max()) == 0.0  # whitened by valid=0
        assert float(jnp.abs(lin.J_pose).max()) == 0.0
        # but the cost contribution is the large constant penalty
        assert float(lin.cost) > 1e3

    def test_masked_obs_contributes_nothing(self):
        T_C_B, T_B_W, p_W, obs = setup_obs()
        lin = projection.linearize_projection(
            T_C_B, T_B_W, p_W, obs, jnp.asarray(False), 2.0)
        assert float(jnp.abs(lin.r).max()) == 0.0
        assert float(lin.cost) == 0.0


class TestHuber:
    def test_weight_regimes(self):
        assert float(projection.huber_weight(jnp.asarray(1.0), 2.0)) == 1.0
        w = float(projection.huber_weight(jnp.asarray(16.0), 2.0))
        assert abs(w - 0.5) < 1e-6  # ||r||=4, delta/||r|| = 0.5

    def test_cost_continuous_at_delta(self):
        d = 2.0
        eps = 1e-4
        c1 = float(projection.huber_cost(jnp.asarray((d - eps) ** 2), d))
        c2 = float(projection.huber_cost(jnp.asarray((d + eps) ** 2), d))
        assert abs(c1 - c2) < 1e-2


class TestTriangulation:
    def test_recovers_known_point(self):
        # Two cameras 0.11 m apart (EuRoC-like baseline), point at ~3 m
        T_W_Cl = jnp.eye(4, dtype=jnp.float32)
        T_W_Cr = lie.se3_from_rt(jnp.eye(3, dtype=jnp.float32),
                                 jnp.asarray([0.11, 0.0, 0.0], dtype=jnp.float32))
        p_gt = jnp.asarray([0.4, -0.3, 3.0], dtype=jnp.float32)
        xy_l = p_gt[:2] / p_gt[2]
        p_r = lie.se3_apply(lie.se3_inverse(T_W_Cr), p_gt)
        xy_r = p_r[:2] / p_r[2]
        p, valid = projection.triangulate_stereo(T_W_Cl, T_W_Cr, xy_l, xy_r)
        assert bool(valid)
        np.testing.assert_allclose(p, p_gt, atol=1e-3)

    def test_parallel_rays_invalid(self):
        T = jnp.eye(4, dtype=jnp.float32)
        xy = jnp.asarray([0.1, 0.2], dtype=jnp.float32)
        _, valid = projection.triangulate_stereo(T, T, xy, xy)
        assert not bool(valid)

    def test_behind_camera_invalid(self):
        T_W_Cl = jnp.eye(4, dtype=jnp.float32)
        T_W_Cr = lie.se3_from_rt(jnp.eye(3, dtype=jnp.float32),
                                 jnp.asarray([0.11, 0.0, 0.0], dtype=jnp.float32))
        # Diverging rays -> intersection behind the cameras
        xy_l = jnp.asarray([-0.2, 0.0], dtype=jnp.float32)
        xy_r = jnp.asarray([0.2, 0.0], dtype=jnp.float32)
        _, valid = projection.triangulate_stereo(T_W_Cl, T_W_Cr, xy_l, xy_r)
        assert not bool(valid)


class TestRefineLandmarks:
    """N-view point-only refinement (ref PinholeProjectionFactor,
    factors.rs:27-133; test pattern of ref tests.rs:16-127 — synthetic
    cameras, analytic observations, point recovery)."""

    @staticmethod
    def _setup(n_lm=24, w=5, noise=0.08, seed=13):
        rng = np.random.default_rng(seed)
        T_C_B = jnp.stack([
            jnp.eye(4, dtype=jnp.float32),
            lie.se3_from_rt(jnp.eye(3, dtype=jnp.float32),
                            jnp.asarray([-0.11, 0, 0], dtype=jnp.float32)),
        ])
        poses = []
        for i in range(w):
            R = lie.so3_exp(jnp.asarray(rng.normal(size=3) * 0.03,
                                        dtype=jnp.float32))
            poses.append(lie.se3_from_rt(
                R, jnp.asarray([0.25 * i, 0.02 * i, 0.0], jnp.float32)))
        T_W_B = jnp.stack(poses)
        T_B_W = jnp.stack([lie.se3_inverse(T) for T in poses])
        p_gt = np.stack([rng.uniform(-2, 3, n_lm), rng.uniform(-2, 2, n_lm),
                         rng.uniform(3, 8, n_lm)], axis=1).astype(np.float32)
        obs = np.zeros((w, 2, n_lm, 2), np.float32)
        mask = np.zeros((w, 2, n_lm), bool)
        for i in range(w):
            Tbw = np.asarray(T_B_W[i])
            for c in range(2):
                Tcb = np.asarray(T_C_B[c])
                pC = (Tcb[:3, :3] @ (Tbw[:3, :3] @ p_gt.T + Tbw[:3, 3:4])
                      + Tcb[:3, 3:4]).T
                ok = pC[:, 2] > 0.5
                obs[i, c, ok] = pC[ok, :2] / pC[ok, 2:3]
                mask[i, c] = ok
        p_init = (p_gt + rng.normal(size=p_gt.shape).astype(np.float32)
                  * noise)
        return (T_C_B, T_B_W, jnp.asarray(p_init), jnp.asarray(obs),
                jnp.asarray(mask), p_gt)

    def test_recovers_points_from_noisy_init(self):
        T_C_B, T_B_W, p_init, obs, mask, p_gt = self._setup()
        p, ok = projection.refine_landmarks(T_C_B, T_B_W, p_init, obs, mask)
        ok = np.asarray(ok)
        assert ok.all()
        err = np.abs(np.asarray(p) - p_gt).max()
        err0 = np.abs(np.asarray(p_init) - p_gt).max()
        assert err < 1e-3, f"refined err {err} (init {err0})"

    def test_underobserved_points_unchanged(self):
        T_C_B, T_B_W, p_init, obs, mask, p_gt = self._setup()
        mask = mask.at[:, :, 0].set(False)          # zero observations
        mask = mask.at[1:, :, 1].set(False)
        mask = mask.at[0, 1, 1].set(False)           # one observation left
        p, ok = projection.refine_landmarks(T_C_B, T_B_W, p_init, obs, mask)
        ok = np.asarray(ok)
        assert not ok[0] and not ok[1]
        np.testing.assert_array_equal(np.asarray(p[0]), np.asarray(p_init[0]))
        np.testing.assert_array_equal(np.asarray(p[1]), np.asarray(p_init[1]))
        assert ok[2:].all()
