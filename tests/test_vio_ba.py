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


class TestVIOBAMarginalized:
    """Prior-augmented 15-dim window solve (solve_vio_ba_marginalized)."""

    def test_matches_plain_without_prior(self):
        from rsvio_tpu.models.marginalization import empty_prior
        (st0, T_C_B, lms, obs, mask, lm_valid, pre, pre_valid,
         T_gt, v_gt, p_gt) = make_vio_problem(seed=61)
        W = st0.T_W_B.shape[0]
        res_plain = vio_ba.solve_vio_ba(st0, T_C_B, lms, obs, mask, lm_valid,
                                        pre, pre_valid)
        res_marg, prior = vio_ba.solve_vio_ba_marginalized(
            st0, T_C_B, lms, obs, mask, lm_valid, pre, pre_valid,
            empty_prior(W, 15), jnp.asarray(False))
        assert bool(res_plain.success) and bool(res_marg.success)
        np.testing.assert_allclose(res_marg.state.T_W_B, res_plain.state.T_W_B,
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(res_marg.state.vel, res_plain.state.vel,
                                   rtol=1e-2, atol=1e-3)
        np.testing.assert_allclose(res_marg.landmarks, res_plain.landmarks,
                                   rtol=1e-3, atol=1e-4)
        assert not bool(prior.valid)   # will_evict=False: passes through

    def test_prior_produced_on_evict_spans_full_state(self):
        from rsvio_tpu.models.marginalization import empty_prior
        (st0, T_C_B, lms, obs, mask, lm_valid, pre, pre_valid,
         T_gt, v_gt, p_gt) = make_vio_problem(seed=62)
        W = st0.T_W_B.shape[0]
        res, prior = vio_ba.solve_vio_ba_marginalized(
            st0, T_C_B, lms, obs, mask, lm_valid, pre, pre_valid,
            empty_prior(W, 15), jnp.asarray(True))
        assert bool(res.success) and bool(prior.valid)
        H = np.asarray(prior.H)
        # Information lives on the remaining W-1 states only.
        assert np.abs(H[: (W - 1) * 15, : (W - 1) * 15]).max() > 0
        assert np.abs(H[(W - 1) * 15:, :]).max() == 0
        # The IMU factor between evicted KF0 and KF1 must leave information
        # on KF1's velocity/bias rows (velocity block is rows 6:9 of state 0
        # after the roll).
        assert np.abs(H[6:9, :]).max() > 0
        # Linearization point was rolled.
        np.testing.assert_allclose(prior.T0[0], res.state.T_W_B[1],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(prior.x0_extra[0, :3], res.state.vel[1],
                                   rtol=1e-5, atol=1e-6)

    def test_prior_anchors_gauge_after_roll(self):
        """With a valid prior the first pose is NOT gauge-fixed, yet the
        solve stays well-posed and near the prior's linearization point."""
        from rsvio_tpu.models.marginalization import empty_prior
        (st0, T_C_B, lms, obs, mask, lm_valid, pre, pre_valid,
         T_gt, v_gt, p_gt) = make_vio_problem(seed=63)
        W = st0.T_W_B.shape[0]
        res1, prior = vio_ba.solve_vio_ba_marginalized(
            st0, T_C_B, lms, obs, mask, lm_valid, pre, pre_valid,
            empty_prior(W, 15), jnp.asarray(True))
        assert bool(prior.valid)
        # Roll the window the way the estimator would (drop KF0, duplicate
        # the last slot) and re-solve consuming the prior.
        st_roll = vio_ba.VIOState(
            T_W_B=jnp.concatenate([res1.state.T_W_B[1:],
                                   res1.state.T_W_B[-1:]]),
            vel=jnp.concatenate([res1.state.vel[1:], res1.state.vel[-1:]]),
            bg=jnp.concatenate([res1.state.bg[1:], res1.state.bg[-1:]]),
            ba=jnp.concatenate([res1.state.ba[1:], res1.state.ba[-1:]]))
        obs_roll = jnp.concatenate([obs[1:], obs[-1:]])
        mask_roll = jnp.concatenate([mask[1:], mask[-1:]])
        # Drop the duplicated last frame's observations to avoid a double
        # constraint; keep intervals 1..W-2 (the rolled IMU chain).
        mask_roll = mask_roll.at[-1].set(False)
        pre_roll = jax.tree.map(lambda x: jnp.concatenate([x[1:], x[-1:]]), pre)
        pv_roll = jnp.concatenate([pre_valid[1:],
                                   jnp.zeros((1,), bool)])
        res2, prior2 = vio_ba.solve_vio_ba_marginalized(
            st_roll, T_C_B, res1.landmarks, obs_roll, mask_roll, lm_valid,
            pre_roll, pv_roll, prior, jnp.asarray(False))
        assert bool(res2.success)
        # Anchored by the prior: the first pose should not drift far from
        # its linearization point even though it is unfixed.
        d = np.abs(np.asarray(res2.state.T_W_B[0][:3, 3])
                   - np.asarray(prior.T0[0][:3, 3])).max()
        assert d < 0.05, d


def test_vio_metrics_recorded():
    """Per-iteration metrics for the VIO solvers (TerminalObserver parity)."""
    from rsvio_tpu.models.marginalization import empty_prior
    (st0, T_C_B, lms, obs, mask, lm_valid, pre, pre_valid,
     *_r) = make_vio_problem(seed=81)
    res = vio_ba.solve_vio_ba(st0, T_C_B, lms, obs, mask, lm_valid,
                              pre, pre_valid)
    m = np.asarray(res.metrics)
    it = int(res.iterations)
    assert it >= 1 and np.any(m[:it, 0] > 0) and np.all(m[it:] == 0)
    res2, _ = vio_ba.solve_vio_ba_marginalized(
        st0, T_C_B, lms, obs, mask, lm_valid, pre, pre_valid,
        empty_prior(st0.T_W_B.shape[0], 15), jnp.asarray(False))
    m2 = np.asarray(res2.metrics)
    assert int(res2.iterations) >= 1 and np.any(m2[:int(res2.iterations), 0] > 0)


class TestVIOObsWeights:
    def test_unit_weights_match_unweighted(self):
        """Round-4 score weighting in the VIO solver: all-ones weights are
        bitwise-identical to the unweighted solve (the YAML knob must never
        be silently different in --vio mode)."""
        (st, T_C_B, lms, obs, mask, lm_valid, pre, pv, T_gt, v_gt,
         p_gt) = make_vio_problem(seed=9)
        W_, L = mask.shape[0], mask.shape[2]
        ones = jnp.ones((W_, L), jnp.float32)
        r0 = vio_ba.solve_vio_ba(st, T_C_B, lms, obs, mask, lm_valid, pre, pv)
        r1 = vio_ba.solve_vio_ba(st, T_C_B, lms, obs, mask, lm_valid, pre, pv,
                                 obs_weight=ones)
        assert bool(r0.success) and bool(r1.success)
        np.testing.assert_array_equal(np.asarray(r0.state.T_W_B),
                                      np.asarray(r1.state.T_W_B))
        np.testing.assert_array_equal(np.asarray(r0.landmarks),
                                      np.asarray(r1.landmarks))

    def test_downweighting_discounts_noisy_observations(self):
        (st, T_C_B, lms, obs, mask, lm_valid, pre, pv, T_gt, v_gt,
         p_gt) = make_vio_problem(seed=10, pose_noise=0.04, lm_noise=0.08)
        rng = np.random.default_rng(10)
        W_, L = mask.shape[0], mask.shape[2]
        noisy = rng.uniform(size=L) < 0.5
        obs_n = np.asarray(obs).copy()
        obs_n[:, :, noisy] += rng.normal(scale=8e-3,
                                         size=obs_n[:, :, noisy].shape)
        obs_n = jnp.asarray(obs_n)
        w = jnp.asarray(np.where(noisy, 0.2, 1.0)[None, :].repeat(W_, 0),
                        jnp.float32)
        r_eq = vio_ba.solve_vio_ba(st, T_C_B, lms, obs_n, mask, lm_valid,
                                   pre, pv)
        r_w = vio_ba.solve_vio_ba(st, T_C_B, lms, obs_n, mask, lm_valid,
                                  pre, pv, obs_weight=w)
        assert bool(r_eq.success) and bool(r_w.success)
        err_eq = float(jnp.abs(r_eq.state.T_W_B[:, :3, 3]
                               - T_gt[:, :3, 3]).max())
        err_w = float(jnp.abs(r_w.state.T_W_B[:, :3, 3]
                              - T_gt[:, :3, 3]).max())
        assert err_w < err_eq, (err_w, err_eq)


class TestDesertBiasStiffness:
    """Health-gated bias random-walk stiffness (vio_ba.bias_desert_scales):
    alpha=0 must be EXACTLY the base solve; alpha=1 must reproduce a solve
    with statically boosted bias weights; and pinned links must hold the
    biases when drag-shaped visual noise would otherwise walk them."""

    CFG_DESERT = vio_ba.VIOBAConfig(bias_gyro_weight_desert=1e5,
                                    bias_accel_weight_desert=1e6)

    def test_alpha_zero_matches_base(self):
        (st, T_C_B, lms, obs, mask, lm_valid, pre, pv, T_gt, v_gt,
         p_gt) = make_vio_problem(seed=3)
        r0 = vio_ba.solve_vio_ba(st, T_C_B, lms, obs, mask, lm_valid,
                                 pre, pv, self.CFG_DESERT)
        ra = vio_ba.solve_vio_ba(st, T_C_B, lms, obs, mask, lm_valid,
                                 pre, pv, self.CFG_DESERT,
                                 bias_alpha=jnp.zeros(W_KF - 1))
        assert bool(r0.success) and bool(ra.success)
        np.testing.assert_allclose(np.asarray(r0.state.T_W_B),
                                   np.asarray(ra.state.T_W_B), atol=1e-6)
        np.testing.assert_allclose(np.asarray(r0.state.ba),
                                   np.asarray(ra.state.ba), atol=1e-6)

    def test_alpha_one_matches_static_boost(self):
        (st, T_C_B, lms, obs, mask, lm_valid, pre, pv, T_gt, v_gt,
         p_gt) = make_vio_problem(seed=4)
        ra = vio_ba.solve_vio_ba(st, T_C_B, lms, obs, mask, lm_valid,
                                 pre, pv, self.CFG_DESERT,
                                 bias_alpha=jnp.ones(W_KF - 1))
        r_static = vio_ba.solve_vio_ba(
            st, T_C_B, lms, obs, mask, lm_valid, pre, pv,
            vio_ba.VIOBAConfig(bias_gyro_weight=1e5, bias_accel_weight=1e6))
        assert bool(ra.success) and bool(r_static.success)
        np.testing.assert_allclose(np.asarray(ra.state.T_W_B),
                                   np.asarray(r_static.state.T_W_B),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(ra.state.ba),
                                   np.asarray(r_static.state.ba), atol=1e-5)

    def test_stiff_links_pin_biases_under_drag(self):
        # Coherent observation drag (all features shifted the same way in
        # the newest KF) tries to walk the biases; the desert-stiff solve
        # must keep them near the (true zero) initial estimate.
        (st, T_C_B, lms, obs, mask, lm_valid, pre, pv, T_gt, v_gt,
         p_gt) = make_vio_problem(seed=5)
        obs_drag = obs.at[-1].add(5e-3)
        r_loose = vio_ba.solve_vio_ba(st, T_C_B, lms, obs_drag, mask,
                                      lm_valid, pre, pv, self.CFG_DESERT)
        r_stiff = vio_ba.solve_vio_ba(st, T_C_B, lms, obs_drag, mask,
                                      lm_valid, pre, pv, self.CFG_DESERT,
                                      bias_alpha=jnp.ones(W_KF - 1))
        assert bool(r_loose.success) and bool(r_stiff.success)
        ba_loose = float(jnp.abs(r_loose.state.ba).max())
        ba_stiff = float(jnp.abs(r_stiff.state.ba).max())
        assert ba_stiff < ba_loose, (ba_stiff, ba_loose)
        assert ba_stiff < 1e-4, ba_stiff

    def test_marginalized_accepts_alpha(self):
        from rsvio_tpu.models.marginalization import empty_prior
        (st, T_C_B, lms, obs, mask, lm_valid, pre, pv, T_gt, v_gt,
         p_gt) = make_vio_problem(seed=6)
        prior = empty_prior(W_KF, 15, jnp.float32)
        res, _ = vio_ba.solve_vio_ba_marginalized(
            st, T_C_B, lms, obs, mask, lm_valid, pre, pv, prior,
            jnp.asarray(False), self.CFG_DESERT,
            bias_alpha=0.5 * jnp.ones(W_KF - 1))
        assert bool(res.success)
        err = float(jnp.abs(res.state.T_W_B[:, :3, 3]
                            - T_gt[:, :3, 3]).max())
        assert err < 0.02, err
