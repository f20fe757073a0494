"""PnP solver tests: synthetic forward-model fixtures (generate GT pose ->
project -> perturb initial -> optimize -> compare), the test pattern of the
reference's solver tests (ref src/optimization/tests.rs)."""

import jax.numpy as jnp
import numpy as np

from rsvio_tpu.models import pnp
from rsvio_tpu.ops import lie

def make_problem(n_lm=40, pose_noise=0.05, seed=21):
    """Ground-truth pose + stereo observations of random landmarks."""
    RNG = np.random.default_rng(seed)
    # Stereo rig: left at body origin, right offset 0.11 m in x
    T_C_B = jnp.stack([
        jnp.eye(4, dtype=jnp.float32),
        lie.se3_from_rt(jnp.eye(3, dtype=jnp.float32),
                        jnp.asarray([-0.11, 0, 0], dtype=jnp.float32)),
    ])
    # GT body pose in world
    w = RNG.normal(size=3) * 0.2
    t = RNG.normal(size=3) * 0.5
    T_W_B_gt = lie.se3_from_rt(lie.so3_exp(jnp.asarray(w, dtype=jnp.float32)),
                               jnp.asarray(t, dtype=jnp.float32))
    T_B_W_gt = lie.se3_inverse(T_W_B_gt)
    # Landmarks in front of the body (z in [2, 6] body frame), mapped to world
    p_B = np.stack([RNG.uniform(-1.5, 1.5, n_lm), RNG.uniform(-1.0, 1.0, n_lm),
                    RNG.uniform(2.0, 6.0, n_lm)], axis=1).astype(np.float32)
    p_W = np.asarray(
        jnp.einsum("ij,nj->ni", T_W_B_gt[:3, :3], jnp.asarray(p_B)) + T_W_B_gt[:3, 3])
    # Observations: project through each camera
    obs = np.zeros((2, n_lm, 2), dtype=np.float32)
    mask = np.zeros((2, n_lm), dtype=bool)
    for c in range(2):
        Tcb = np.asarray(T_C_B[c])
        for i in range(n_lm):
            pC = Tcb[:3, :3] @ (np.asarray(T_B_W_gt[:3, :3]) @ p_W[i]
                                + np.asarray(T_B_W_gt[:3, 3])) + Tcb[:3, 3]
            if pC[2] > 0.1:
                obs[c, i] = pC[:2] / pC[2]
                mask[c, i] = True
    # Perturbed initial pose
    dw = RNG.normal(size=3) * pose_noise
    dt = RNG.normal(size=3) * pose_noise
    T_W_B_init = lie.se3_from_rt(
        T_W_B_gt[:3, :3] @ lie.so3_exp(jnp.asarray(dw, dtype=jnp.float32)),
        T_W_B_gt[:3, 3] + jnp.asarray(dt, dtype=jnp.float32))
    return (T_W_B_init, T_C_B, jnp.asarray(p_W), jnp.asarray(obs),
            jnp.asarray(mask), T_W_B_gt)


class TestPnP:
    def test_recovers_gt_pose(self):
        T_init, T_C_B, p_W, obs, mask, T_gt = make_problem()
        res = pnp.solve_pnp(T_init, T_C_B, p_W, obs, mask)
        assert bool(res.success)
        t_err = float(jnp.linalg.norm(res.T_W_B[:3, 3] - T_gt[:3, 3]))
        r_err = float(lie.rotation_angle(res.T_W_B[:3, :3].T @ T_gt[:3, :3]))
        assert t_err < 1e-3, f"translation error {t_err}"
        assert r_err < 1e-3, f"rotation error {r_err}"

    def test_larger_perturbation(self):
        T_init, T_C_B, p_W, obs, mask, T_gt = make_problem(pose_noise=0.2)
        res = pnp.solve_pnp(T_init, T_C_B, p_W, obs, mask)
        assert bool(res.success)
        t_err = float(jnp.linalg.norm(res.T_W_B[:3, 3] - T_gt[:3, 3]))
        assert t_err < 1e-2

    def test_under_constrained_refused(self):
        # < 6 observations -> refuse, pose unchanged (ref sliding_window.rs:309-319)
        T_init, T_C_B, p_W, obs, mask, _ = make_problem(n_lm=4)
        mask = mask.at[:, 2:].set(False)  # only 2 landmarks visible
        res = pnp.solve_pnp(T_init, T_C_B, p_W, obs, mask)
        assert not bool(res.success)
        np.testing.assert_allclose(res.T_W_B, T_init)

    def test_robust_to_outliers(self):
        T_init, T_C_B, p_W, obs, mask, T_gt = make_problem(n_lm=60, seed=5)
        # Corrupt 10% of observations badly
        obs = obs.at[0, :6].add(jnp.asarray([0.5, -0.4]))
        cfg = pnp.PnPConfig(huber_delta=0.01, max_iterations=15)
        res = pnp.solve_pnp(T_init, T_C_B, p_W, obs, mask, cfg)
        assert bool(res.success)
        t_err = float(jnp.linalg.norm(res.T_W_B[:3, 3] - T_gt[:3, 3]))
        assert t_err < 5e-3, f"translation error {t_err}"

    def test_already_at_optimum_converges_fast(self):
        _, T_C_B, p_W, obs, mask, T_gt = make_problem()
        res = pnp.solve_pnp(T_gt, T_C_B, p_W, obs, mask)
        assert bool(res.success)
        assert float(res.final_cost) < 1e-8


class TestChi2Gate:
    """PnP chi^2 gating: gross outliers excised after the first accepted
    iteration (see ba.BAConfig.chi2_gate)."""

    def test_gate_improves_gross_outlier_recovery(self):
        T_init, T_C_B, p_W, obs, mask, T_W_B_gt = make_problem(seed=31)
        rng = np.random.default_rng(3)
        obs_bad = np.asarray(obs).copy()
        m = np.asarray(mask)
        n_bad = 0
        for i in range(obs_bad.shape[1]):
            if m[0, i] and m[1, i] and rng.uniform() < 0.25:
                d = rng.normal(size=2) * 0.4
                obs_bad[0, i] += d
                obs_bad[1, i] += d
                n_bad += 1
        assert n_bad >= 4
        res_off = pnp.solve_pnp(T_init, T_C_B, p_W, jnp.asarray(obs_bad),
                                mask, pnp.PnPConfig())
        res_on = pnp.solve_pnp(T_init, T_C_B, p_W, jnp.asarray(obs_bad),
                               mask, pnp.PnPConfig(chi2_gate=0.1))
        assert bool(res_on.success)
        err_off = float(jnp.linalg.norm(res_off.T_W_B[:3, 3]
                                        - T_W_B_gt[:3, 3]))
        err_on = float(jnp.linalg.norm(res_on.T_W_B[:3, 3]
                                       - T_W_B_gt[:3, 3]))
        assert err_on < err_off and err_on < 0.01, (err_on, err_off)

    def test_gate_noop_on_clean_data(self):
        T_init, T_C_B, p_W, obs, mask, T_W_B_gt = make_problem(seed=32)
        res_off = pnp.solve_pnp(T_init, T_C_B, p_W, obs, mask,
                                pnp.PnPConfig())
        res_on = pnp.solve_pnp(T_init, T_C_B, p_W, obs, mask,
                               pnp.PnPConfig(chi2_gate=0.05))
        d = float(jnp.abs(res_on.T_W_B - res_off.T_W_B).max())
        assert d < 1e-5, d


class TestMotionPrior:
    """PnP motion-model prior (pnp.motion_prior_weight): against a COHERENT
    wrong-motion observation group (moving occluder), the prior anchors the
    solve at the prediction so the chi^2 gate can excise the group."""

    def test_prior_resists_coherent_hijack(self):
        # The prediction (solve init) is GOOD — the constant-velocity /
        # IMU scenario the prior is designed for.
        T_init, T_C_B, p_W, obs, mask, T_gt = make_problem(n_lm=60, seed=41,
                                                           pose_noise=0.002)
        # 40% of observations get one CONSISTENT wrong shift INSIDE the
        # chi^2 gate (a rigid secondary motion the gate alone cannot cut).
        obs_bad = np.asarray(obs).copy()
        m = np.asarray(mask)
        idx = [i for i in range(60) if m[0, i] and m[1, i]][:24]
        obs_bad[:, idx] += np.array([0.02, -0.015])
        obs_bad = jnp.asarray(obs_bad)
        res_off = pnp.solve_pnp(T_init, T_C_B, p_W, obs_bad, mask,
                                pnp.PnPConfig(chi2_gate=0.03))
        res_on = pnp.solve_pnp(T_init, T_C_B, p_W, obs_bad, mask,
                               pnp.PnPConfig(chi2_gate=0.03,
                                             motion_prior_weight=20.0))
        err_off = float(jnp.linalg.norm(res_off.T_W_B[:3, 3] - T_gt[:3, 3]))
        err_on = float(jnp.linalg.norm(res_on.T_W_B[:3, 3] - T_gt[:3, 3]))
        assert bool(res_on.success)
        assert err_on < err_off, (err_on, err_off)

    def test_prior_neutral_with_good_prediction(self):
        # Clean data + accurate prediction (the steady-state case): the
        # prior must not degrade the solve.
        T_init, T_C_B, p_W, obs, mask, T_gt = make_problem(seed=42,
                                                           pose_noise=0.002)
        res_on = pnp.solve_pnp(T_init, T_C_B, p_W, obs, mask,
                               pnp.PnPConfig(motion_prior_weight=20.0))
        err_on = float(jnp.linalg.norm(res_on.T_W_B[:3, 3] - T_gt[:3, 3]))
        assert bool(res_on.success)
        assert err_on < 5e-3, err_on


class TestRansacGate:
    """Batched RANSAC consensus gate (pnp.ransac_pnp_gate): rejects a
    COHERENT outlier group (rigid moving occluder) that Huber/chi2 cannot —
    the occluder's observations agree with each other, so per-residual
    defenses settle on a compromise pose; consensus voting cannot."""

    CFG = pnp.PnPConfig(ransac_hypotheses=32, ransac_threshold=8e-3,
                        ransac_min_inliers=12)

    @staticmethod
    def occluder_problem(n_lm=80, frac_bad=0.35, seed=7, shift=(0.3, -0.2, 0.15)):
        """Observations where the first frac_bad landmarks moved COHERENTLY
        by `shift` in the world (a rigid occluder) before projection."""
        T_init, T_C_B, p_W, obs, mask, T_gt = make_problem(
            n_lm=n_lm, seed=seed, pose_noise=0.02)
        n_bad = int(n_lm * frac_bad)
        d = np.asarray(shift, np.float32)
        T_B_W = np.asarray(lie.se3_inverse(T_gt))
        obs_np = np.asarray(obs).copy()
        mask_np = np.asarray(mask).copy()
        for c in range(2):
            Tcb = np.asarray(T_C_B[c])
            for i in range(n_bad):
                pC = Tcb[:3, :3] @ (T_B_W[:3, :3] @ (np.asarray(p_W[i]) + d)
                                    + T_B_W[:3, 3]) + Tcb[:3, 3]
                if pC[2] > 0.1:
                    obs_np[c, i] = pC[:2] / pC[2]
                    mask_np[c, i] = True
        bad = np.zeros(n_lm, bool)
        bad[:n_bad] = True
        return (T_init, T_C_B, p_W, jnp.asarray(obs_np), jnp.asarray(mask_np),
                T_gt, bad)

    def test_gate_separates_occluder(self):
        import jax
        (T_init, T_C_B, p_W, obs, mask, T_gt, bad) = self.occluder_problem()
        inl, ok, count = pnp.ransac_pnp_gate(
            T_init, T_C_B, p_W, obs, mask, jax.random.PRNGKey(0), self.CFG)
        assert bool(ok)
        inl_np = np.asarray(inl)
        mask_np = np.asarray(mask)
        # every consensus member is a static-world observation
        assert not np.any(inl_np[:, bad]), "occluder obs voted inlier"
        # and the static group is (essentially) fully retained
        good_kept = inl_np[:, ~bad].sum() / max(mask_np[:, ~bad].sum(), 1)
        assert good_kept > 0.9, good_kept

    def test_gated_solve_beats_plain(self):
        import jax
        (T_init, T_C_B, p_W, obs, mask, T_gt, bad) = self.occluder_problem()
        inl, ok, _ = pnp.ransac_pnp_gate(
            T_init, T_C_B, p_W, obs, mask, jax.random.PRNGKey(1), self.CFG)
        res_plain = pnp.solve_pnp(T_init, T_C_B, p_W, obs, mask)
        res_gated = pnp.solve_pnp(T_init, T_C_B, p_W, obs, inl)
        err_plain = float(jnp.linalg.norm(res_plain.T_W_B[:3, 3] - T_gt[:3, 3]))
        err_gated = float(jnp.linalg.norm(res_gated.T_W_B[:3, 3] - T_gt[:3, 3]))
        assert bool(res_gated.success)
        assert err_gated < 2e-3, err_gated
        assert err_gated < err_plain, (err_gated, err_plain)

    def test_clean_data_keeps_full_mask(self):
        import jax
        T_init, T_C_B, p_W, obs, mask, T_gt = make_problem(
            n_lm=60, seed=11, pose_noise=0.02)
        inl, ok, count = pnp.ransac_pnp_gate(
            T_init, T_C_B, p_W, obs, mask, jax.random.PRNGKey(2), self.CFG)
        assert bool(ok)
        kept = np.asarray(inl).sum() / np.asarray(mask).sum()
        assert kept > 0.95, kept

    def test_too_few_disengages(self):
        import jax
        T_init, T_C_B, p_W, obs, mask, _ = make_problem(n_lm=5, seed=13)
        inl, ok, _ = pnp.ransac_pnp_gate(
            T_init, T_C_B, p_W, obs, mask, jax.random.PRNGKey(3), self.CFG)
        assert not bool(ok)
        np.testing.assert_array_equal(np.asarray(inl), np.asarray(mask))

    def test_deterministic(self):
        import jax
        (T_init, T_C_B, p_W, obs, mask, _, _) = self.occluder_problem(seed=17)
        key = jax.random.PRNGKey(4)
        inl_a, _, _ = pnp.ransac_pnp_gate(T_init, T_C_B, p_W, obs, mask,
                                          key, self.CFG)
        inl_b, _, _ = pnp.ransac_pnp_gate(T_init, T_C_B, p_W, obs, mask,
                                          key, self.CFG)
        np.testing.assert_array_equal(np.asarray(inl_a), np.asarray(inl_b))


class TestAdaptivePriorScale:
    """Runtime prior_scale modulation (round 5): scale 1.0 reproduces the
    static motion prior, scale 0.0 removes it entirely."""

    def _solve(self, scale):
        T_init, T_C_B, p_W, obs, mask, T_gt = make_problem(
            n_lm=40, seed=21, pose_noise=0.05)
        cfg = pnp.PnPConfig(motion_prior_weight=50.0)
        return pnp.solve_pnp(T_init, T_C_B, p_W, obs, mask, cfg,
                             prior_scale=jnp.asarray(scale, jnp.float32))

    def test_scale_one_matches_static_prior(self):
        T_init, T_C_B, p_W, obs, mask, T_gt = make_problem(
            n_lm=40, seed=21, pose_noise=0.05)
        cfg = pnp.PnPConfig(motion_prior_weight=50.0)
        res_static = pnp.solve_pnp(T_init, T_C_B, p_W, obs, mask, cfg)
        res_scaled = self._solve(1.0)
        np.testing.assert_allclose(np.asarray(res_scaled.T_W_B),
                                   np.asarray(res_static.T_W_B), atol=1e-6)

    def test_scale_zero_matches_no_prior(self):
        T_init, T_C_B, p_W, obs, mask, T_gt = make_problem(
            n_lm=40, seed=21, pose_noise=0.05)
        res_free = pnp.solve_pnp(T_init, T_C_B, p_W, obs, mask,
                                 pnp.PnPConfig())
        res_scaled = self._solve(0.0)
        np.testing.assert_allclose(np.asarray(res_scaled.T_W_B),
                                   np.asarray(res_free.T_W_B), atol=1e-5)

    def test_strong_prior_pins_pose(self):
        # With a huge effective prior the solve barely leaves the init.
        T_init, T_C_B, p_W, obs, mask, T_gt = make_problem(
            n_lm=40, seed=21, pose_noise=0.05)
        cfg = pnp.PnPConfig(motion_prior_weight=1e4)
        res = pnp.solve_pnp(T_init, T_C_B, p_W, obs, mask, cfg,
                            prior_scale=jnp.asarray(1.0, jnp.float32))
        d_init = float(np.linalg.norm(
            np.asarray(res.T_W_B[:3, 3] - T_init[:3, 3])))
        assert d_init < 1e-3, d_init
