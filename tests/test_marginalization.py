"""Marginalization tests: the Schur-marginalized prior must reproduce the
information the dropped state carried — checked against the brute-force dense
conditional on a synthetic Gaussian system."""

import jax.numpy as jnp
import numpy as np

from rsvio_tpu.models import marginalization as mg
from rsvio_tpu.ops import lie

B = 6
W = 4


def random_psd(n, rng, scale=1.0):
    A = rng.normal(size=(n, n)) * scale
    return A @ A.T + np.eye(n) * 0.1


class TestMarginalization:
    def test_prior_matches_dense_schur(self):
        rng = np.random.default_rng(0)
        H = random_psd(W * B, rng)
        g = rng.normal(size=W * B)
        T = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (W, 4, 4))
        extra = jnp.zeros((W, 0), dtype=jnp.float32)
        prior = mg.marginalize_oldest(
            jnp.asarray(H, jnp.float32), jnp.asarray(g, jnp.float32),
            T, extra, mg.empty_prior(W, B), B)
        # Dense reference
        Hmm = H[:B, :B] + 1e-8 * np.eye(B)
        Hmr = H[:B, B:]
        Hp_ref = H[B:, B:] - Hmr.T @ np.linalg.solve(Hmm, Hmr)
        gp_ref = g[B:] - Hmr.T @ np.linalg.solve(Hmm, g[:B])
        n_r = (W - 1) * B
        np.testing.assert_allclose(np.asarray(prior.H)[:n_r, :n_r], Hp_ref,
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(prior.g)[:n_r], gp_ref,
                                   rtol=1e-3, atol=1e-3)
        # new slot has no information
        assert np.abs(np.asarray(prior.H)[n_r:, :]).max() == 0.0
        assert bool(prior.valid)

    def test_prior_terms_zero_at_linearization_point(self):
        rng = np.random.default_rng(1)
        H = random_psd(W * B, rng)
        g = rng.normal(size=W * B)
        Ts = []
        for _ in range(W):
            R = lie.so3_exp(jnp.asarray(rng.normal(size=3) * 0.2, jnp.float32))
            Ts.append(lie.se3_from_rt(R, jnp.asarray(rng.normal(size=3),
                                                     jnp.float32)))
        T = jnp.stack(Ts)
        extra = jnp.zeros((W, 0), jnp.float32)
        prior = mg.marginalize_oldest(
            jnp.asarray(H, jnp.float32), jnp.asarray(g, jnp.float32),
            T, extra, mg.empty_prior(W, B), B)
        # At the (rolled) linearization point, dx = 0 -> g_add = prior.g
        H_add, g_add, cost = mg.prior_terms(prior, prior.T0, prior.x0_extra)
        np.testing.assert_allclose(g_add, prior.g, atol=1e-5)
        assert abs(float(cost)) < 1e-5

    def test_prior_gradient_moves_with_state(self):
        rng = np.random.default_rng(2)
        H = random_psd(W * B, rng)
        g = np.zeros(W * B)
        T = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (W, 4, 4))
        extra = jnp.zeros((W, 0), jnp.float32)
        prior = mg.marginalize_oldest(
            jnp.asarray(H, jnp.float32), jnp.asarray(g, jnp.float32),
            T, extra, mg.empty_prior(W, B), B)
        # Perturb the first remaining pose's translation
        T_pert = prior.T0.at[0, :3, 3].add(
            jnp.asarray([0.1, 0.0, 0.0]))
        # box-minus on T_B_W: t_B = -R^T t_W, so perturbing t_W by +0.1
        # changes the tangent; just verify gradient and cost respond.
        _, g_add, cost = mg.prior_terms(prior, T_pert, prior.x0_extra)
        assert float(jnp.abs(g_add).max()) > 1e-4
        assert float(cost) != 0.0

    def test_empty_prior_contributes_nothing(self):
        prior = mg.empty_prior(W, B)
        T = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (W, 4, 4))
        H_add, g_add, cost = mg.prior_terms(prior, T, prior.x0_extra)
        assert float(jnp.abs(H_add).max()) == 0.0
        assert float(jnp.abs(g_add).max()) == 0.0
        assert float(cost) == 0.0
