"""Sliding-window BA tests: synthetic forward-model fixtures following the
reference's solver test pattern (ref src/optimization/tests.rs:136-681 —
generate GT, project, perturb initial values, optimize, compare to GT)."""

import jax
import jax.numpy as jnp
import numpy as np

from rsvio_tpu.models import ba
from rsvio_tpu.ops import lie

W_KF = 5
N_LM = 24


def stereo_rig():
    return jnp.stack([
        jnp.eye(4, dtype=jnp.float32),
        lie.se3_from_rt(jnp.eye(3, dtype=jnp.float32),
                        jnp.asarray([-0.11, 0, 0], dtype=jnp.float32)),
    ])


def make_problem(seed=0, pose_noise=0.02, lm_noise=0.05, rot_noise=0.01,
                 w=W_KF, n_lm=N_LM):
    """GT trajectory moving sideways, landmarks in front; stereo projections."""
    rng = np.random.default_rng(seed)
    T_C_B = stereo_rig()
    # GT poses: translate along x, small rotations
    poses_gt = []
    for i in range(w):
        R = lie.so3_exp(jnp.asarray(rng.normal(size=3) * 0.05, dtype=jnp.float32))
        t = jnp.asarray([0.3 * i, 0.02 * i, 0.0], dtype=jnp.float32)
        poses_gt.append(lie.se3_from_rt(R, t))
    T_W_B_gt = jnp.stack(poses_gt)
    # GT landmarks spread in front of the trajectory
    p_W_gt = np.stack([
        rng.uniform(-2, 2 + 0.3 * w, n_lm),
        rng.uniform(-2, 2, n_lm),
        rng.uniform(3.0, 8.0, n_lm),
    ], axis=1).astype(np.float32)

    # Observations
    obs = np.zeros((w, 2, n_lm, 2), dtype=np.float32)
    mask = np.zeros((w, 2, n_lm), dtype=bool)
    for i in range(w):
        T_B_W = np.asarray(lie.se3_inverse(T_W_B_gt[i]))
        for c in range(2):
            Tcb = np.asarray(T_C_B[c])
            for j in range(n_lm):
                pC = Tcb[:3, :3] @ (T_B_W[:3, :3] @ p_W_gt[j] + T_B_W[:3, 3]) + Tcb[:3, 3]
                if pC[2] > 0.5:
                    obs[i, c, j] = pC[:2] / pC[2]
                    mask[i, c, j] = True

    # Perturb everything except the first (gauge) pose
    poses_init = [T_W_B_gt[0]]
    for i in range(1, w):
        dR = lie.so3_exp(jnp.asarray(rng.normal(size=3) * rot_noise, dtype=jnp.float32))
        dt = jnp.asarray(rng.normal(size=3) * pose_noise, dtype=jnp.float32)
        poses_init.append(lie.se3_from_rt(T_W_B_gt[i][:3, :3] @ dR,
                                          T_W_B_gt[i][:3, 3] + dt))
    T_W_B_init = jnp.stack(poses_init)
    lms_init = jnp.asarray(p_W_gt + rng.normal(size=p_W_gt.shape) * lm_noise,
                           dtype=jnp.float32)
    lm_valid = jnp.ones(n_lm, dtype=bool)
    return (T_W_B_init, T_C_B, lms_init, jnp.asarray(obs), jnp.asarray(mask),
            lm_valid, T_W_B_gt, jnp.asarray(p_W_gt))


class TestBA:
    def test_translation_only_noise_recovers(self):
        """Analog of ref test_bundle_adjustment_factor_translation_only."""
        (T_init, T_C_B, lms, obs, mask, lm_valid, T_gt, p_gt) = make_problem(
            seed=1, pose_noise=0.05, lm_noise=0.1, rot_noise=0.0)
        res = ba.solve_ba(T_init, T_C_B, lms, obs, mask, lm_valid)
        assert bool(res.success)
        assert float(res.final_cost) < float(res.initial_cost) * 1e-3
        lm_err = np.abs(np.asarray(res.landmarks) - np.asarray(p_gt)).max()
        assert lm_err < 1e-2, f"landmark error {lm_err}"
        t_err = np.abs(np.asarray(res.T_W_B[:, :3, 3]) - np.asarray(T_gt[:, :3, 3])).max()
        assert t_err < 1e-2, f"pose translation error {t_err}"

    def test_full_se3_noise_recovers(self):
        """Analog of ref test_bundle_adjustment_factor_full (relaxed bound)."""
        (T_init, T_C_B, lms, obs, mask, lm_valid, T_gt, p_gt) = make_problem(
            seed=2, pose_noise=0.03, lm_noise=0.08, rot_noise=0.02)
        res = ba.solve_ba(T_init, T_C_B, lms, obs, mask, lm_valid)
        assert bool(res.success)
        assert float(res.final_cost) < float(res.initial_cost) * 1e-2
        t_err = np.abs(np.asarray(res.T_W_B[:, :3, 3]) - np.asarray(T_gt[:, :3, 3])).max()
        assert t_err < 0.05, f"pose translation error {t_err}"

    def test_gauge_pose_fixed(self):
        (T_init, T_C_B, lms, obs, mask, lm_valid, T_gt, _) = make_problem(seed=3)
        res = ba.solve_ba(T_init, T_C_B, lms, obs, mask, lm_valid)
        assert bool(res.success)
        np.testing.assert_allclose(res.T_W_B[0], T_init[0], atol=1e-6)

    def test_under_constrained_skipped(self):
        (T_init, T_C_B, lms, obs, mask, lm_valid, _, _) = make_problem(seed=4)
        mask = jnp.zeros_like(mask)  # no observations at all
        res = ba.solve_ba(T_init, T_C_B, lms, obs, mask, lm_valid)
        assert not bool(res.success)
        assert int(res.status) == ba.STATUS_SKIPPED
        np.testing.assert_allclose(res.T_W_B, T_init)  # rollback
        np.testing.assert_allclose(res.landmarks, lms)

    def test_mono_only_landmarks_excluded(self):
        """A landmark never seen in the right camera must not move
        (ref sliding_window.rs:243-246 stereo gating)."""
        (T_init, T_C_B, lms, obs, mask, lm_valid, _, _) = make_problem(seed=5)
        mask = mask.at[:, 1, 0].set(False)  # landmark 0 right-cam obs removed
        res = ba.solve_ba(T_init, T_C_B, lms, obs, mask, lm_valid)
        assert bool(res.success)
        np.testing.assert_allclose(res.landmarks[0], lms[0], atol=1e-7)

    def test_invalid_landmark_slots_untouched(self):
        (T_init, T_C_B, lms, obs, mask, lm_valid, _, _) = make_problem(seed=6)
        lm_valid = lm_valid.at[3].set(False)
        res = ba.solve_ba(T_init, T_C_B, lms, obs, mask, lm_valid)
        assert bool(res.success)
        np.testing.assert_allclose(res.landmarks[3], lms[3], atol=1e-7)

    def test_zero_noise_is_fixed_point(self):
        (T_init, T_C_B, lms, obs, mask, lm_valid, T_gt, p_gt) = make_problem(
            seed=7, pose_noise=0.0, lm_noise=0.0, rot_noise=0.0)
        res = ba.solve_ba(T_gt, T_C_B, p_gt, obs, mask, lm_valid)
        assert bool(res.success)
        assert float(res.final_cost) < 1e-7


class TestSchur:
    def test_schur_matches_full_solve(self):
        """The Schur-reduced solution must equal solving the full (damped)
        normal equations directly."""
        (T_init, T_C_B, lms, obs, mask, lm_valid, _, _) = make_problem(seed=8)
        W, L = T_init.shape[0], lms.shape[0]
        T_B_W = jax.vmap(lie.se3_inverse)(T_init)
        lm_active = ba.stereo_observability_mask(mask, lm_valid)
        lin = ba._linearize_all(T_B_W, T_C_B, lms, obs,
                                mask & lm_active[None, None, :], 2.0)
        H_pp, H_ll, H_pl, g_p, g_l = ba.build_normal_equations(lin)
        lam = jnp.asarray(1e-3, jnp.float32)
        dp, dl, ok = ba.schur_solve(H_pp, H_ll, H_pl, g_p, g_l, lam,
                                    lm_active, fix_first=False)
        assert bool(ok)

        # Dense full system
        n = W * 6 + L * 3
        H = np.zeros((n, n), dtype=np.float64)
        g = np.zeros(n, dtype=np.float64)
        for w in range(W):
            H[w*6:(w+1)*6, w*6:(w+1)*6] = np.asarray(H_pp[w])
            g[w*6:(w+1)*6] = np.asarray(g_p[w])
        for l in range(L):
            o = W * 6 + l * 3
            H[o:o+3, o:o+3] = np.asarray(H_ll[l])
            g[o:o+3] = np.asarray(g_l[l])
        for w in range(W):
            for l in range(L):
                o = W * 6 + l * 3
                H[w*6:(w+1)*6, o:o+3] = np.asarray(H_pl[w, l])
                H[o:o+3, w*6:(w+1)*6] = np.asarray(H_pl[w, l]).T
        D = np.maximum(np.diag(H), 1e-8)
        Hd = H + float(lam) * np.diag(D)
        delta = np.linalg.solve(Hd, -g)
        np.testing.assert_allclose(np.asarray(dp).ravel(), delta[:W*6],
                                   rtol=2e-2, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dl).ravel(), delta[W*6:],
                                   rtol=2e-2, atol=2e-4)


class TestTranslationOnly:
    def test_rotations_frozen(self):
        """translation_only must recover translations while leaving every
        keyframe rotation at its initial value (analog of ref
        test_bundle_adjustment_factor_translation_only)."""
        (T_init, T_C_B, lms, obs, mask, lm_valid, T_gt, p_gt) = make_problem(
            seed=31, pose_noise=0.05, lm_noise=0.1, rot_noise=0.0)
        cfg = ba.BAConfig(translation_only=True)
        res = ba.solve_ba(T_init, T_C_B, lms, obs, mask, lm_valid, cfg)
        assert bool(res.success)
        np.testing.assert_allclose(res.T_W_B[:, :3, :3], T_init[:, :3, :3],
                                   atol=1e-6)
        t_err = np.abs(np.asarray(res.T_W_B[:, :3, 3])
                       - np.asarray(T_gt[:, :3, 3])).max()
        assert t_err < 1e-2, t_err


class TestChi2Gate:
    """Per-observation chi^2 outlier gating (robustness upgrade over the
    reference's Huber-only defense, ref sliding_window.rs:295): gross
    outliers injected into the observation set must be excised after the
    first accepted iteration instead of dragging the solution."""

    @staticmethod
    def _corrupt(obs, mask, frac=0.15, mag=0.3, seed=5):
        rng = np.random.default_rng(seed)
        obs = np.asarray(obs).copy()
        m = np.asarray(mask)
        w, c, l, _ = obs.shape
        hits = 0
        for i in range(w):
            for j in range(l):
                if m[i, 0, j] and m[i, 1, j] and rng.uniform() < frac:
                    # Occluder: both cameras of this frame see a wrong,
                    # consistent offset (a foreground object).
                    d = rng.normal(size=2) * mag
                    obs[i, 0, j] += d
                    obs[i, 1, j] += d
                    hits += 1
        assert hits > 5
        return jnp.asarray(obs)

    def test_gate_recovers_under_gross_outliers(self):
        (T_init, T_C_B, lms, obs, mask, lm_valid, T_gt, p_gt) = make_problem(
            seed=9, pose_noise=0.03, lm_noise=0.05)
        obs_bad = self._corrupt(obs, mask)
        cfg_off = ba.BAConfig()
        cfg_on = ba.BAConfig(chi2_gate=0.03)
        res_off = ba.solve_ba(T_init, T_C_B, lms, obs_bad, mask, lm_valid,
                              cfg_off)
        res_on = ba.solve_ba(T_init, T_C_B, lms, obs_bad, mask, lm_valid,
                             cfg_on)
        assert bool(res_off.success) and bool(res_on.success)
        err_off = float(jnp.abs(res_off.T_W_B[:, :3, 3]
                                - T_gt[:, :3, 3]).max())
        err_on = float(jnp.abs(res_on.T_W_B[:, :3, 3]
                               - T_gt[:, :3, 3]).max())
        # The gate must materially improve pose recovery...
        assert err_on < 0.5 * err_off, (err_on, err_off)
        # ...and land close to ground truth despite 15% outliers.
        assert err_on < 0.02, err_on

    def test_gate_off_is_default_and_identical(self):
        (T_init, T_C_B, lms, obs, mask, lm_valid, T_gt, p_gt) = make_problem(
            seed=10)
        res_a = ba.solve_ba(T_init, T_C_B, lms, obs, mask, lm_valid,
                            ba.BAConfig())
        res_b = ba.solve_ba(T_init, T_C_B, lms, obs, mask, lm_valid,
                            ba.BAConfig(chi2_gate=0.0))
        np.testing.assert_array_equal(np.asarray(res_a.T_W_B),
                                      np.asarray(res_b.T_W_B))

    def test_gate_noop_on_clean_data(self):
        # On inlier-only data a gross-scale gate must not change the result
        # beyond roundoff.
        (T_init, T_C_B, lms, obs, mask, lm_valid, T_gt, p_gt) = make_problem(
            seed=11)
        res_off = ba.solve_ba(T_init, T_C_B, lms, obs, mask, lm_valid,
                              ba.BAConfig())
        res_on = ba.solve_ba(T_init, T_C_B, lms, obs, mask, lm_valid,
                             ba.BAConfig(chi2_gate=0.05))
        assert bool(res_on.success)
        d = float(jnp.abs(res_on.T_W_B - res_off.T_W_B).max())
        assert d < 1e-4, d


class TestObsWeights:
    """Score-weighted observations (round-4, EstimatorConfig.use_obs_weights):
    per-slot sqrt-weights scale the whitened system after robustification."""

    def test_unit_weights_match_unweighted(self):
        (T_init, T_C_B, lms, obs, mask, lm_valid, T_gt, p_gt) = make_problem(
            seed=5)
        ones = jnp.ones((T_init.shape[0], lms.shape[0]), jnp.float32)
        r0 = ba.solve_ba(T_init, T_C_B, lms, obs, mask, lm_valid)
        r1 = ba.solve_ba(T_init, T_C_B, lms, obs, mask, lm_valid,
                         obs_weight=ones)
        assert bool(r0.success) and bool(r1.success)
        np.testing.assert_array_equal(np.asarray(r0.T_W_B),
                                      np.asarray(r1.T_W_B))
        np.testing.assert_array_equal(np.asarray(r0.landmarks),
                                      np.asarray(r1.landmarks))

    def test_downweighting_discounts_noisy_observations(self):
        """Corrupt half the observations with noise; down-weighting exactly
        the corrupted ones must recover the poses better than equal
        weighting."""
        (T_init, T_C_B, lms, obs, mask, lm_valid, T_gt, p_gt) = make_problem(
            seed=6, pose_noise=0.05, lm_noise=0.1)
        rng = np.random.default_rng(6)
        W_, L = mask.shape[0], mask.shape[2]
        noisy = rng.uniform(size=L) < 0.5
        obs_n = np.asarray(obs).copy()
        obs_n[:, :, noisy] += rng.normal(scale=8e-3,
                                         size=obs_n[:, :, noisy].shape)
        obs_n = jnp.asarray(obs_n)
        w = jnp.asarray(np.where(noisy, 0.3, 1.0)[None, :].repeat(W_, 0),
                        jnp.float32)
        r_eq = ba.solve_ba(T_init, T_C_B, lms, obs_n, mask, lm_valid)
        r_w = ba.solve_ba(T_init, T_C_B, lms, obs_n, mask, lm_valid,
                          obs_weight=w)
        assert bool(r_eq.success) and bool(r_w.success)
        err_eq = float(jnp.abs(r_eq.T_W_B[:, :3, 3] - T_gt[:, :3, 3]).max())
        err_w = float(jnp.abs(r_w.T_W_B[:, :3, 3] - T_gt[:, :3, 3]).max())
        assert err_w < err_eq, (err_w, err_eq)
