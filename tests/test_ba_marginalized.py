"""Marginalization-aware BA tests: with the prior active, information from
evicted keyframes must persist — a rolled window anchored only by the prior
stays consistent with ground truth."""

import jax
import jax.numpy as jnp
import numpy as np

from rsvio_tpu.models import ba
from rsvio_tpu.models.marginalization import empty_prior
from rsvio_tpu.ops import lie

from test_ba import make_problem, W_KF


class TestMarginalizedBA:
    def test_matches_plain_ba_without_prior(self):
        (T_init, T_C_B, lms, obs, mask, lm_valid, T_gt, p_gt) = make_problem(
            seed=21)
        res_plain = ba.solve_ba(T_init, T_C_B, lms, obs, mask, lm_valid)
        res_marg, new_prior = ba.solve_ba_marginalized(
            T_init, T_C_B, lms, obs, mask, lm_valid,
            empty_prior(W_KF, 6), jnp.asarray(False))
        assert bool(res_plain.success) and bool(res_marg.success)
        np.testing.assert_allclose(res_marg.T_W_B, res_plain.T_W_B,
                                   rtol=1e-3, atol=1e-4)
        assert not bool(new_prior.valid)  # no eviction requested

    def test_prior_produced_on_evict(self):
        (T_init, T_C_B, lms, obs, mask, lm_valid, *_rest) = make_problem(
            seed=22)
        res, prior = ba.solve_ba_marginalized(
            T_init, T_C_B, lms, obs, mask, lm_valid,
            empty_prior(W_KF, 6), jnp.asarray(True))
        assert bool(res.success)
        assert bool(prior.valid)
        H = np.asarray(prior.H)
        n_r = (W_KF - 1) * 6
        # information over remaining poses, none for the new (last) slot
        assert np.abs(H[:n_r, :n_r]).max() > 1e-3
        assert np.abs(H[n_r:, :]).max() == 0.0
        # symmetric PSD-ish
        np.testing.assert_allclose(H, H.T, atol=1e-2)
        eig = np.linalg.eigvalsh(H[:n_r, :n_r].astype(np.float64))
        assert eig.min() > -1e-2

    def test_prior_anchors_gauge_after_roll(self):
        """Solve, marginalize + roll, re-solve with the prior anchoring: the
        remaining poses must stay near their pre-roll estimates even though
        no pose is hard-fixed."""
        (T_init, T_C_B, lms, obs, mask, lm_valid, T_gt, p_gt) = make_problem(
            seed=23, pose_noise=0.01, lm_noise=0.02, rot_noise=0.005)
        res1, prior = ba.solve_ba_marginalized(
            T_init, T_C_B, lms, obs, mask, lm_valid,
            empty_prior(W_KF, 6), jnp.asarray(True))
        assert bool(res1.success) and bool(prior.valid)

        # Roll the window: drop KF0, duplicate the newest as the "incoming"
        # keyframe (same observations => a well-posed but gauge-free problem
        # without the prior).
        roll = lambda a: jnp.concatenate([a[1:], a[-1:]], axis=0)  # noqa: E731
        T_roll = roll(res1.T_W_B)
        obs_roll = roll(obs)
        mask_roll = roll(mask)
        res2, _ = ba.solve_ba_marginalized(
            T_roll, T_C_B, res1.landmarks, obs_roll, mask_roll, lm_valid,
            prior, jnp.asarray(False))
        assert bool(res2.success)
        # Poses 0..W-2 (previously 1..W-1) should stay near res1's estimates.
        drift = np.abs(np.asarray(res2.T_W_B[: W_KF - 1, :3, 3])
                       - np.asarray(res1.T_W_B[1:, :3, 3])).max()
        assert drift < 0.05, f"pose drift after roll {drift}"

    def test_under_constrained_skip_keeps_prior(self):
        (T_init, T_C_B, lms, obs, mask, lm_valid, *_r) = make_problem(seed=24)
        res, prior = ba.solve_ba_marginalized(
            T_init, T_C_B, lms, jnp.zeros_like(obs), jnp.zeros_like(mask),
            lm_valid, empty_prior(W_KF, 6), jnp.asarray(True))
        assert not bool(res.success)
        assert not bool(prior.valid)  # failed solve must not mint a prior


def test_marginalized_metrics_recorded():
    """TerminalObserver parity: per-iteration metrics rows must be populated
    for the prior-augmented solver too (ref src/optimization/observer.rs)."""
    import jax.numpy as jnp
    import numpy as np
    from rsvio_tpu.models import ba
    from rsvio_tpu.models.marginalization import empty_prior
    from rsvio_tpu.utils.observer import format_metrics
    from test_ba import make_problem, W_KF
    (T_init, T_C_B, lms, obs, mask, lm_valid, _, _) = make_problem(seed=5)
    res, _ = ba.solve_ba_marginalized(T_init, T_C_B, lms, obs, mask, lm_valid,
                                      empty_prior(W_KF, 6), jnp.asarray(True))
    assert bool(res.success)
    it = int(res.iterations)
    m = np.asarray(res.metrics)
    assert it >= 1
    assert np.any(m[:it, 0] > 0)      # costs recorded
    assert np.all(m[it:] == 0)        # tail rows untouched
    assert "iter" in format_metrics(m, it)
