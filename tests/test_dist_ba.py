"""Distributed BA tests on an 8-virtual-device CPU mesh: the sharded solve
must agree with the single-device solve and recover ground truth."""

import jax.numpy as jnp
import numpy as np
import pytest

from rsvio_tpu.models import ba
from rsvio_tpu.parallel import dist_ba, mesh as mesh_mod

from test_ba import make_problem


@pytest.fixture(scope="module")
def mesh8(request):
    import jax
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return mesh_mod.make_mesh(8)


class TestDistributedBA:
    def test_matches_single_device(self, mesh8):
        # L must divide the mesh: use 24 -> pad to 32
        (T_init, T_C_B, lms, obs, mask, lm_valid, T_gt, p_gt) = make_problem(
            seed=11, n_lm=32)
        res_local = ba.solve_ba(T_init, T_C_B, lms, obs, mask, lm_valid)
        res_dist = dist_ba.solve_ba_distributed(
            mesh8, T_init, T_C_B, lms, obs, mask, lm_valid)
        assert bool(res_local.success) and bool(res_dist.success)
        np.testing.assert_allclose(res_dist.T_W_B, res_local.T_W_B,
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(res_dist.landmarks, res_local.landmarks,
                                   rtol=1e-3, atol=1e-4)
        assert abs(float(res_dist.final_cost) - float(res_local.final_cost)) \
            <= 1e-4 * max(1.0, float(res_local.final_cost))

    def test_recovers_ground_truth(self, mesh8):
        (T_init, T_C_B, lms, obs, mask, lm_valid, T_gt, p_gt) = make_problem(
            seed=12, n_lm=64, pose_noise=0.03, lm_noise=0.08, rot_noise=0.01)
        res = dist_ba.solve_ba_distributed(
            mesh8, T_init, T_C_B, lms, obs, mask, lm_valid)
        assert bool(res.success)
        t_err = np.abs(np.asarray(res.T_W_B[:, :3, 3])
                       - np.asarray(T_gt[:, :3, 3])).max()
        assert t_err < 0.05, f"pose translation error {t_err}"

    def test_under_constrained_skipped(self, mesh8):
        (T_init, T_C_B, lms, obs, mask, lm_valid, _, _) = make_problem(
            seed=13, n_lm=32)
        mask = jnp.zeros_like(mask)
        res = dist_ba.solve_ba_distributed(
            mesh8, T_init, T_C_B, lms, obs, mask, lm_valid)
        assert not bool(res.success)
        np.testing.assert_allclose(res.T_W_B, T_init)


class TestDistributedVIOBA:
    def test_matches_single_device(self, mesh8):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_vio_ba import make_vio_problem
        from rsvio_tpu.models import vio_ba
        from rsvio_tpu.parallel import dist_vio_ba
        (st0, T_C_B, lms, obs, mask, lm_valid, pre, pre_valid,
         T_gt, v_gt, p_gt) = make_vio_problem(seed=41)
        res_local = vio_ba.solve_vio_ba(st0, T_C_B, lms, obs, mask, lm_valid,
                                        pre, pre_valid)
        res_dist = dist_vio_ba.solve_vio_ba_distributed(
            mesh8, st0, T_C_B, lms, obs, mask, lm_valid, pre, pre_valid)
        assert bool(res_local.success) and bool(res_dist.success)
        np.testing.assert_allclose(res_dist.state.T_W_B, res_local.state.T_W_B,
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(res_dist.state.vel, res_local.state.vel,
                                   rtol=1e-2, atol=1e-3)
        np.testing.assert_allclose(res_dist.landmarks, res_local.landmarks,
                                   rtol=1e-3, atol=1e-4)


class TestDistributedMarginalizedBA:
    """Landmark-sharded prior-augmented BA must agree with the single-device
    marginalized solver, both in the solution and in the produced prior."""

    def test_matches_single_device_and_prior(self, mesh8):
        from rsvio_tpu.models.marginalization import empty_prior
        (T_init, T_C_B, lms, obs, mask, lm_valid, T_gt, p_gt) = make_problem(
            seed=21, n_lm=32)
        W = T_init.shape[0]
        prior0 = empty_prior(W, 6)
        res_l, prior_l = ba.solve_ba_marginalized(
            T_init, T_C_B, lms, obs, mask, lm_valid, prior0,
            jnp.asarray(True))
        res_d, prior_d = dist_ba.solve_ba_marginalized_distributed(
            mesh8, T_init, T_C_B, lms, obs, mask, lm_valid, prior0,
            jnp.asarray(True))
        assert bool(res_l.success) and bool(res_d.success)
        np.testing.assert_allclose(res_d.T_W_B, res_l.T_W_B,
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(res_d.landmarks, res_l.landmarks,
                                   rtol=1e-3, atol=1e-4)
        assert bool(prior_d.valid) and bool(prior_l.valid)
        # Same linearization point and prior information (up to f32 psum
        # reduction-order noise in the Schur products).
        np.testing.assert_allclose(prior_d.T0, prior_l.T0,
                                   rtol=1e-3, atol=1e-4)
        scale = max(1.0, float(np.abs(np.asarray(prior_l.H)).max()))
        np.testing.assert_allclose(np.asarray(prior_d.H) / scale,
                                   np.asarray(prior_l.H) / scale,
                                   rtol=5e-3, atol=5e-3)

    def test_prior_round_trip_anchors_gauge(self, mesh8):
        """Second solve consuming the produced prior must run with the gauge
        anchored by the prior (no first-pose fixing) and still converge."""
        from rsvio_tpu.models.marginalization import empty_prior
        (T_init, T_C_B, lms, obs, mask, lm_valid, T_gt, p_gt) = make_problem(
            seed=22, n_lm=32)
        W = T_init.shape[0]
        _, prior = dist_ba.solve_ba_marginalized_distributed(
            mesh8, T_init, T_C_B, lms, obs, mask, lm_valid,
            empty_prior(W, 6), jnp.asarray(True))
        # Roll the window the way the estimator would: drop pose 0, append a
        # copy of the last pose; keep the same observations as a stand-in.
        T_roll = jnp.concatenate([T_init[1:], T_init[-1:]], axis=0)
        res2, prior2 = dist_ba.solve_ba_marginalized_distributed(
            mesh8, T_roll, T_C_B, lms, obs, mask, lm_valid, prior,
            jnp.asarray(False))
        assert bool(res2.success)
        assert bool(prior2.valid)
        # The prior passes through unchanged when will_evict=False.
        np.testing.assert_allclose(prior2.H, prior.H)

    def test_under_constrained_skip_keeps_prior(self, mesh8):
        from rsvio_tpu.models.marginalization import empty_prior
        (T_init, T_C_B, lms, obs, mask, lm_valid, _, _) = make_problem(
            seed=23, n_lm=32)
        W = T_init.shape[0]
        res, prior = dist_ba.solve_ba_marginalized_distributed(
            mesh8, T_init, T_C_B, lms, jnp.zeros((W, 2, 32, 2)),
            jnp.zeros((W, 2, 32), bool), lm_valid,
            empty_prior(W, 6), jnp.asarray(True))
        assert not bool(res.success)
        assert not bool(prior.valid)
        np.testing.assert_allclose(res.T_W_B, T_init)


class TestDistributedMarginalizedVIOBA:
    """Landmark-sharded, prior-augmented 15-dim VIO solve must agree with
    the single-device marginalized VIO solver."""

    def test_matches_single_device_and_prior(self, mesh8):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_vio_ba import make_vio_problem
        from rsvio_tpu.models import vio_ba
        from rsvio_tpu.models.marginalization import empty_prior
        from rsvio_tpu.parallel import dist_vio_ba
        (st0, T_C_B, lms, obs, mask, lm_valid, pre, pre_valid,
         T_gt, v_gt, p_gt) = make_vio_problem(seed=71)
        W = st0.T_W_B.shape[0]
        prior0 = empty_prior(W, 15)
        res_l, prior_l = vio_ba.solve_vio_ba_marginalized(
            st0, T_C_B, lms, obs, mask, lm_valid, pre, pre_valid,
            prior0, jnp.asarray(True))
        res_d, prior_d = dist_vio_ba.solve_vio_ba_marginalized_distributed(
            mesh8, st0, T_C_B, lms, obs, mask, lm_valid, pre, pre_valid,
            prior0, jnp.asarray(True))
        assert bool(res_l.success) and bool(res_d.success)
        np.testing.assert_allclose(res_d.state.T_W_B, res_l.state.T_W_B,
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(res_d.state.vel, res_l.state.vel,
                                   rtol=1e-2, atol=1e-3)
        np.testing.assert_allclose(res_d.landmarks, res_l.landmarks,
                                   rtol=1e-3, atol=1e-4)
        assert bool(prior_d.valid) and bool(prior_l.valid)
        np.testing.assert_allclose(prior_d.T0, prior_l.T0,
                                   rtol=1e-3, atol=1e-4)
        scale = max(1.0, float(np.abs(np.asarray(prior_l.H)).max()))
        np.testing.assert_allclose(np.asarray(prior_d.H) / scale,
                                   np.asarray(prior_l.H) / scale,
                                   rtol=5e-3, atol=5e-3)

    def test_prior_consumed_without_gauge_fix(self, mesh8):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_vio_ba import make_vio_problem
        from rsvio_tpu.models.marginalization import empty_prior
        from rsvio_tpu.parallel import dist_vio_ba
        import jax
        (st0, T_C_B, lms, obs, mask, lm_valid, pre, pre_valid,
         *_rest) = make_vio_problem(seed=72)
        W = st0.T_W_B.shape[0]
        _, prior = dist_vio_ba.solve_vio_ba_marginalized_distributed(
            mesh8, st0, T_C_B, lms, obs, mask, lm_valid, pre, pre_valid,
            empty_prior(W, 15), jnp.asarray(True))
        assert bool(prior.valid)
        roll = lambda x: jnp.concatenate([x[1:], x[-1:]])  # noqa: E731
        st_roll = jax.tree.map(roll, st0)
        res2, prior2 = dist_vio_ba.solve_vio_ba_marginalized_distributed(
            mesh8, st_roll, T_C_B, lms,
            jnp.concatenate([obs[1:], obs[-1:]]),
            jnp.concatenate([mask[1:], mask[-1:]]).at[-1].set(False),
            lm_valid,
            jax.tree.map(roll, pre),
            jnp.concatenate([pre_valid[1:], jnp.zeros((1,), bool)]),
            prior, jnp.asarray(False))
        assert bool(res2.success)
        np.testing.assert_allclose(prior2.H, prior.H)  # pass-through


class TestDistributedObsWeights:
    def test_weighted_matches_single_device(self, mesh8):
        """Score-weighted BA parity: the sharded solve with per-slot weights
        must agree with the local weighted solve (round-4
        use_obs_weights)."""
        (T_init, T_C_B, lms, obs, mask, lm_valid, T_gt, p_gt) = make_problem(
            seed=21, n_lm=32)
        rng = np.random.default_rng(21)
        w = jnp.asarray(rng.uniform(0.3, 1.0, (T_init.shape[0],
                                               lms.shape[0])), jnp.float32)
        res_local = ba.solve_ba(T_init, T_C_B, lms, obs, mask, lm_valid,
                                obs_weight=w)
        res_dist = dist_ba.solve_ba_distributed(
            mesh8, T_init, T_C_B, lms, obs, mask, lm_valid, obs_weight=w)
        assert bool(res_local.success) and bool(res_dist.success)
        np.testing.assert_allclose(res_dist.T_W_B, res_local.T_W_B,
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(res_dist.landmarks, res_local.landmarks,
                                   rtol=1e-3, atol=1e-4)
