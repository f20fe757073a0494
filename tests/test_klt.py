"""KLT tracker tests on synthetic images: known translations must be recovered
sub-pixel; bidirectional gate must kill tracks that leave the image or land on
textureless regions (mirrors the runtime self-checks of the reference,
ref src/feature_tracker/feature_tracker.rs:252-291)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rsvio_tpu.ops import klt, pyramid

RNG = np.random.default_rng(3)


def textured_image(H=120, W=160, seed=0):
    """Smooth random texture with enough gradient everywhere."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, size=(H // 4, W // 4)).astype(np.float32)
    import cv2
    img = cv2.resize(base, (W, H), interpolation=cv2.INTER_CUBIC)
    img = cv2.GaussianBlur(img, (5, 5), 1.0)
    return img.astype(np.float32)


def shift_image(img, dx, dy):
    """Subpixel shift via cv2 warpAffine (linear)."""
    import cv2
    M = np.float32([[1, 0, dx], [0, 1, dy]])
    return cv2.warpAffine(img, M, (img.shape[1], img.shape[0]),
                          flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT)


CFG = klt.KLTConfig(max_iterations=20, convergence_threshold=0.005, levels=3)


def make_points(n=16, H=120, W=160):
    pts = RNG.uniform([30, 30], [W - 30, H - 30], size=(n, 2)).astype(np.float32)
    return jnp.asarray(pts)


class TestTrackTranslation:
    def test_recovers_integer_shift(self):
        img0 = textured_image()
        dx, dy = 3.0, -2.0
        img1 = shift_image(img0, dx, dy)
        pyr0 = pyramid.build_pyramid(jnp.asarray(img0), CFG.levels)
        pyr1 = pyramid.build_pyramid(jnp.asarray(img1), CFG.levels)
        pts = make_points()
        alive = jnp.ones(pts.shape[0], dtype=bool)
        pos, _, ok = klt.track_points_bidirectional(pyr0, pyr1, pts, alive, CFG)
        ok = np.asarray(ok)
        assert ok.sum() >= pts.shape[0] * 0.75, f"only {ok.sum()} tracks survived"
        flow = np.asarray(pos) - np.asarray(pts)
        err = np.abs(flow[ok] - np.array([dx, dy]))
        assert np.median(err) < 0.25, f"median err {np.median(err)}"

    def test_recovers_subpixel_shift(self):
        img0 = textured_image(seed=1)
        dx, dy = 1.3, 0.7
        img1 = shift_image(img0, dx, dy)
        pyr0 = pyramid.build_pyramid(jnp.asarray(img0), CFG.levels)
        pyr1 = pyramid.build_pyramid(jnp.asarray(img1), CFG.levels)
        pts = make_points()
        alive = jnp.ones(pts.shape[0], dtype=bool)
        pos, _, ok = klt.track_points_bidirectional(pyr0, pyr1, pts, alive, CFG)
        ok = np.asarray(ok)
        assert ok.sum() >= pts.shape[0] * 0.75
        flow = np.asarray(pos) - np.asarray(pts)
        err = np.abs(flow[ok] - np.array([dx, dy]))
        assert np.median(err) < 0.3

    def test_brightness_invariance(self):
        # Mean-normalized patches should tolerate a global gain change.
        img0 = textured_image(seed=2)
        img1 = shift_image(img0, 2.0, 1.0) * 1.3
        pyr0 = pyramid.build_pyramid(jnp.asarray(img0), CFG.levels)
        pyr1 = pyramid.build_pyramid(jnp.asarray(img1), CFG.levels)
        pts = make_points()
        alive = jnp.ones(pts.shape[0], dtype=bool)
        pos, _, ok = klt.track_points_bidirectional(pyr0, pyr1, pts, alive, CFG)
        ok = np.asarray(ok)
        assert ok.sum() >= pts.shape[0] * 0.6
        flow = np.asarray(pos) - np.asarray(pts)
        err = np.abs(flow[ok] - np.array([2.0, 1.0]))
        assert np.median(err) < 0.3


class TestFailureModes:
    def test_textureless_region_dies(self):
        img0 = np.full((120, 160), 100.0, dtype=np.float32)
        img1 = img0.copy()
        pyr0 = pyramid.build_pyramid(jnp.asarray(img0), CFG.levels)
        pyr1 = pyramid.build_pyramid(jnp.asarray(img1), CFG.levels)
        pts = make_points(8)
        alive = jnp.ones(8, dtype=bool)
        _, _, ok = klt.track_points_bidirectional(pyr0, pyr1, pts, alive, CFG)
        # Flat image -> degenerate Hessian -> all tracks should die or at
        # minimum not diverge (positions finite).
        assert np.asarray(ok).sum() <= 2

    def test_dead_slots_stay_dead(self):
        img0 = textured_image(seed=4)
        pyr0 = pyramid.build_pyramid(jnp.asarray(img0), CFG.levels)
        pts = make_points(8)
        alive = jnp.zeros(8, dtype=bool)
        _, _, ok = klt.track_points_bidirectional(pyr0, pyr0, pts, alive, CFG)
        assert not np.asarray(ok).any()

    def test_identity_track_is_fixed_point(self):
        img0 = textured_image(seed=5)
        pyr0 = pyramid.build_pyramid(jnp.asarray(img0), CFG.levels)
        pts = make_points(16)
        alive = jnp.ones(16, dtype=bool)
        pos, _, ok = klt.track_points_bidirectional(pyr0, pyr0, pts, alive, CFG)
        ok = np.asarray(ok)
        assert ok.sum() >= 12
        drift = np.abs(np.asarray(pos)[ok] - np.asarray(pts)[ok])
        assert drift.max() < 0.1


def test_build_patch_flat_invalid():
    img = jnp.full((64, 64), 50.0)
    p = klt.build_patch(img, jnp.asarray([32.0, 32.0]))
    # A flat patch has zero gradients -> near-singular H; data should still be
    # finite and ok=False is acceptable (mean is fine but H is singular).
    assert bool(jnp.all(jnp.isfinite(p.data)))


def test_pattern_layout():
    assert klt.PATTERN.shape == (64, 2)
    assert float(jnp.max(jnp.abs(klt.PATTERN))) == 7.0
    # zero-mean symmetric pattern
    assert float(jnp.abs(jnp.sum(klt.PATTERN))) < 1e-5


class TestResidualModes:
    """SSD vs LSSD residual options + fixed-lambda LM damping (parity with
    the reference experimental crate's Patch residual variants and its
    precomputed (lambda I + J^T J)^-1 LM step, ref
    feature_tracker/src/patch.rs:57-105,239-255)."""

    def _track(self, img0, img1, cfg):
        pyr0 = pyramid.build_pyramid(jnp.asarray(img0), cfg.levels)
        pyr1 = pyramid.build_pyramid(jnp.asarray(img1), cfg.levels)
        pts = make_points()
        alive = jnp.ones(pts.shape[0], dtype=bool)
        pos, _, ok = klt.track_points_bidirectional(pyr0, pyr1, pts, alive, cfg)
        return np.asarray(pos), np.asarray(ok), np.asarray(pts)

    def test_ssd_recovers_shift(self):
        img0 = textured_image(seed=5)
        dx, dy = 2.0, -1.5
        img1 = shift_image(img0, dx, dy)
        cfg = CFG._replace(residual_mode="ssd")
        pos, ok, pts = self._track(img0, img1, cfg)
        assert ok.sum() >= pts.shape[0] * 0.75
        err = np.abs((pos - pts)[ok] - np.array([dx, dy]))
        assert np.median(err) < 0.25

    def test_lm_damped_recovers_shift(self):
        img0 = textured_image(seed=6)
        dx, dy = -2.5, 1.0
        img1 = shift_image(img0, dx, dy)
        cfg = CFG._replace(lm_lambda=1.0)
        pos, ok, pts = self._track(img0, img1, cfg)
        assert ok.sum() >= pts.shape[0] * 0.75
        err = np.abs((pos - pts)[ok] - np.array([dx, dy]))
        assert np.median(err) < 0.25

    def test_lssd_is_gain_invariant_ssd_is_not(self):
        """A global gain change: the mean-normalized residual tracks through
        it; plain SSD sees a large residual everywhere (documented behavioral
        difference between the two modes)."""
        img0 = textured_image(seed=7)
        dx, dy = 1.5, -1.0
        img1 = np.clip(shift_image(img0, dx, dy) * 1.6, 0, 255)
        pos_l, ok_l, pts = self._track(
            img0, img1, CFG._replace(residual_mode="lssd"))
        err_l = np.abs((pos_l - pts)[ok_l] - np.array([dx, dy]))
        assert ok_l.sum() >= pts.shape[0] * 0.6
        assert np.median(err_l) < 0.3
        # SSD under a 1.6x gain: tracking quality must degrade measurably
        # (fewer survivors or worse flow) relative to LSSD.
        pos_s, ok_s, _ = self._track(
            img0, img1, CFG._replace(residual_mode="ssd"))
        flow_err_s = np.abs((pos_s - pts)[ok_s] - np.array([dx, dy]))
        degraded = (ok_s.sum() < ok_l.sum()) or (
            ok_s.sum() == 0) or (np.median(flow_err_s) > np.median(err_l))
        assert degraded


class TestRatioPyramid:
    def test_arbitrary_ratio_recovers_shift(self):
        """Tracking over a non-power-of-two pyramid (experimental-crate
        capability: arbitrary-ratio pyramids with per-level position scaling,
        ref feature_tracker/src/image_operations.rs:47-78 +
        feature_tracking.rs:88-122)."""
        img0 = textured_image(seed=9)
        dx, dy = 4.0, -3.0
        img1 = shift_image(img0, dx, dy)
        ratio = 1.0 / 1.6
        cfg = CFG._replace(levels=4, pyramid_ratio=ratio, backend="xla")
        pyr0 = pyramid.build_pyramid_ratio(jnp.asarray(img0), 4, ratio,
                                           blur=True)
        pyr1 = pyramid.build_pyramid_ratio(jnp.asarray(img1), 4, ratio,
                                           blur=True)
        pts = make_points()
        alive = jnp.ones(pts.shape[0], dtype=bool)
        pos, _, ok = klt.track_points_bidirectional(pyr0, pyr1, pts, alive,
                                                    cfg)
        ok = np.asarray(ok)
        assert ok.sum() >= pts.shape[0] * 0.7, f"only {ok.sum()} survived"
        err = np.abs((np.asarray(pos) - np.asarray(pts))[ok]
                     - np.array([dx, dy]))
        assert np.median(err) < 0.3, f"median err {np.median(err)}"


class TestStereoBatchedTemporal:
    def test_matches_two_separate_calls(self):
        """track_points_bidirectional_stereo (fused camera batch, Pallas
        path in interpret mode) must agree with two independent
        track_points_bidirectional runs."""
        img0 = textured_image(seed=12)
        img1 = textured_image(seed=13)
        dst0 = shift_image(img0, 2.0, -1.5)
        dst1 = shift_image(img1, -1.0, 0.5)
        p0 = pyramid.build_pyramid(jnp.asarray(img0), 3)
        p1 = pyramid.build_pyramid(jnp.asarray(img1), 3)
        d0 = pyramid.build_pyramid(jnp.asarray(dst0), 3)
        d1 = pyramid.build_pyramid(jnp.asarray(dst1), 3)
        pts0 = make_points(12)
        pts1 = make_points(12)
        alive = jnp.ones(12, dtype=bool)
        cfg = CFG._replace(backend="pallas")
        a0, _, k0 = klt.track_points_bidirectional(p0, d0, pts0, alive, cfg)
        a1, _, k1 = klt.track_points_bidirectional(p1, d1, pts1, alive, cfg)
        b0, _, s0, b1, _, s1 = klt.track_points_bidirectional_stereo(
            p0, p1, d0, d1, pts0, pts1, alive, cfg)
        np.testing.assert_array_equal(np.asarray(s0), np.asarray(k0))
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(k1))
        np.testing.assert_allclose(np.asarray(b0), np.asarray(a0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(b1), np.asarray(a1), atol=1e-5)


class TestFusedBidirectional:
    def test_fused_matches_per_level_composition(self):
        """The single-launch fused bidirectional kernel must reproduce the
        composition of per-level Pallas tracking calls (forward, backward,
        distance gate) exactly."""
        img0 = textured_image(seed=14)
        img1 = shift_image(img0, 2.5, -1.5)
        p0 = pyramid.build_pyramid(jnp.asarray(img0), 3)
        d0 = pyramid.build_pyramid(jnp.asarray(img1), 3)
        pts = make_points(12)
        alive = jnp.ones(12, dtype=bool)
        cfg = CFG._replace(backend="pallas")

        # Unfused reference: per-level pallas calls composed by hand (the
        # pre-fusion track_points_bidirectional logic).
        N = pts.shape[0]
        eye = jnp.broadcast_to(jnp.eye(2, dtype=pts.dtype), (N, 2, 2))
        pos_fwd, A_fwd, ok_fwd = klt.track_points(p0, d0, pts, pts, eye,
                                                  alive, cfg)
        A_inv = jnp.swapaxes(A_fwd, -1, -2)
        pos_back, _, ok_back = klt.track_points(d0, p0, pos_fwd, pts, A_inv,
                                                ok_fwd, cfg)
        dist_sq = jnp.sum((pos_back - pts) ** 2, axis=1)
        ok_ref = ok_fwd & ok_back & (dist_sq < cfg.bidir_threshold_sq)

        pos, _, ok = klt.track_points_bidirectional(p0, d0, pts, alive, cfg)
        np.testing.assert_array_equal(np.asarray(ok), np.asarray(ok_ref))
        np.testing.assert_allclose(np.asarray(pos), np.asarray(pos_fwd),
                                   atol=1e-6)

    def test_fused_matches_composition_with_rotation(self):
        """Fused bidirectional with track_rotation (backward pass starts at
        the negated forward angle) must match the per-level composition."""
        img0 = textured_image(seed=15)
        import cv2
        M = cv2.getRotationMatrix2D((80.0, 60.0), 4.0, 1.0)
        M[:, 2] += [1.5, -1.0]
        img1 = cv2.warpAffine(img0, M, (img0.shape[1], img0.shape[0]),
                              flags=cv2.INTER_LINEAR,
                              borderMode=cv2.BORDER_REFLECT)
        p0 = pyramid.build_pyramid(jnp.asarray(img0), 3)
        d0 = pyramid.build_pyramid(jnp.asarray(img1), 3)
        pts = make_points(12)
        alive = jnp.ones(12, dtype=bool)
        cfg = CFG._replace(backend="pallas", track_rotation=True)

        N = pts.shape[0]
        eye = jnp.broadcast_to(jnp.eye(2, dtype=pts.dtype), (N, 2, 2))
        pos_fwd, A_fwd, ok_fwd = klt.track_points(p0, d0, pts, pts, eye,
                                                  alive, cfg)
        A_inv = jnp.swapaxes(A_fwd, -1, -2)
        pos_back, _, ok_back = klt.track_points(d0, p0, pos_fwd, pts, A_inv,
                                                ok_fwd, cfg)
        dist_sq = jnp.sum((pos_back - pts) ** 2, axis=1)
        ok_ref = ok_fwd & ok_back & (dist_sq < cfg.bidir_threshold_sq)

        pos, A, ok = klt.track_points_bidirectional(p0, d0, pts, alive, cfg)
        np.testing.assert_array_equal(np.asarray(ok), np.asarray(ok_ref))
        np.testing.assert_allclose(np.asarray(pos), np.asarray(pos_fwd),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(A), np.asarray(A_fwd),
                                   atol=1e-6)


class TestSmoothSceneQuality:
    def test_pallas_survival_matches_xla_on_smooth_texture(self):
        """Regression guard for the gradient-quality bug: on SMOOTH texture
        (where the piecewise-constant bilinear-cell gradient destabilizes
        GN) the Pallas kernel must keep bidirectional survival and flow
        accuracy on par with the XLA path. High-texture shift tests alone
        do not catch this class of defect."""
        import cv2
        rng = np.random.default_rng(2)
        tex = cv2.resize(rng.uniform(40, 220, (24, 24)).astype(np.float32),
                         (480, 480), interpolation=cv2.INTER_CUBIC)
        img0 = tex[100:220, 80:240]                  # 120x160, very smooth
        img1 = shift_image(img0, -0.8, 0.3)
        p0 = pyramid.build_pyramid(jnp.asarray(img0), 4)
        p1 = pyramid.build_pyramid(jnp.asarray(img1), 4)
        pts = make_points(24)
        alive = jnp.ones(24, dtype=bool)
        res = {}
        for backend in ("xla", "pallas"):
            cfg = CFG._replace(levels=4, backend=backend)
            pos, _, ok = klt.track_points_bidirectional(p0, p1, pts, alive,
                                                        cfg)
            ok = np.asarray(ok)
            flow = np.asarray(pos) - np.asarray(pts)
            err = (np.median(np.abs(flow[ok] - [-0.8, 0.3]))
                   if ok.any() else np.inf)
            res[backend] = (ok.sum(), err)
        n_x, e_x = res["xla"]
        n_p, e_p = res["pallas"]
        # A dead XLA baseline would make the comparisons below vacuous.
        assert n_x >= 12, f"xla baseline itself broken: {n_x}/24 survive"
        assert np.isfinite(e_x) and e_x < 0.1, f"xla baseline err {e_x}"
        assert n_p >= 0.8 * n_x, f"pallas survival {n_p} vs xla {n_x}"
        assert e_p < max(2.0 * e_x, 0.1), f"pallas flow err {e_p} vs {e_x}"


class TestKernelVariantParity:
    """Every KLTConfig variant must run on the Pallas kernel (VERDICT round-1
    item 3: SSD residual, fixed-lambda damping and the exact SE2 rotation
    warp may not silently fall back to the XLA gather path on TPU) with
    tracking quality on par with the XLA path."""

    def _both(self, img0, img1, cfg, n=16):
        pyr0 = pyramid.build_pyramid(jnp.asarray(img0), cfg.levels)
        pyr1 = pyramid.build_pyramid(jnp.asarray(img1), cfg.levels)
        pts = make_points(n)
        alive = jnp.ones(n, dtype=bool)
        out = {}
        for backend in ("xla", "pallas"):
            pos, _, ok = klt.track_points_bidirectional(
                pyr0, pyr1, pts, alive, cfg._replace(backend=backend))
            out[backend] = (np.asarray(pos), np.asarray(ok))
        return out, np.asarray(pts)

    def _check(self, out, pts, flow, tol=0.25):
        px, kx = out["xla"]
        pp, kp = out["pallas"]
        assert kx.sum() >= pts.shape[0] * 0.6, f"xla baseline {kx.sum()}"
        e_x = np.median(np.abs((px - pts)[kx] - flow))
        e_p = np.median(np.abs((pp - pts)[kp] - flow))
        assert e_x < tol, f"xla err {e_x}"
        assert kp.sum() >= 0.7 * kx.sum(), f"pallas survival {kp.sum()} vs {kx.sum()}"
        assert e_p < max(2.0 * e_x, tol), f"pallas err {e_p} vs xla {e_x}"

    def test_ssd_on_kernel(self):
        img0 = textured_image(seed=21)
        img1 = shift_image(img0, 2.0, -1.5)
        cfg = CFG._replace(residual_mode="ssd")
        out, pts = self._both(img0, img1, cfg)
        self._check(out, pts, np.array([2.0, -1.5]))

    def test_lm_damped_on_kernel(self):
        img0 = textured_image(seed=22)
        img1 = shift_image(img0, -1.5, 2.0)
        cfg = CFG._replace(lm_lambda=1.0)
        out, pts = self._both(img0, img1, cfg)
        self._check(out, pts, np.array([-1.5, 2.0]))

    def test_ssd_rotation_lm_combined_on_kernel(self):
        """The full variant stack at once (ssd + damping + SE2 rotation)."""
        img0 = textured_image(seed=23)
        img1 = shift_image(img0, 1.0, 1.0)
        cfg = CFG._replace(residual_mode="ssd", lm_lambda=0.5,
                           track_rotation=True)
        out, pts = self._both(img0, img1, cfg)
        self._check(out, pts, np.array([1.0, 1.0]), tol=0.35)

    def test_kernel_lssd_gain_invariance(self):
        """Brightness-gain drift through the KERNEL path (the round-1 matrix
        only exercised gain invariance on the XLA path)."""
        img0 = textured_image(seed=24)
        img1 = np.clip(shift_image(img0, 1.5, -1.0) * 1.6, 0, 255)
        cfg = CFG._replace(backend="pallas")
        pyr0 = pyramid.build_pyramid(jnp.asarray(img0), cfg.levels)
        pyr1 = pyramid.build_pyramid(jnp.asarray(img1), cfg.levels)
        pts = make_points(16)
        alive = jnp.ones(16, dtype=bool)
        pos, _, ok = klt.track_points_bidirectional(pyr0, pyr1, pts, alive,
                                                    cfg)
        ok = np.asarray(ok)
        assert ok.sum() >= 10, f"{ok.sum()} survived the 1.6x gain"
        err = np.abs((np.asarray(pos) - np.asarray(pts))[ok] - [1.5, -1.0])
        assert np.median(err) < 0.3, np.median(err)


class TestBicubicInterpolation:
    """Bicubic-sampled tracking (ref experimental crate tracks WITH bicubic:
    feature_tracker/src/feature_tracker/feature_tracking.rs:129-192 via
    d_interpolate_bicubic, image_operations.rs:140-229)."""

    def test_bicubic_recovers_subpixel_shift(self):
        img0 = textured_image(seed=7)
        dx, dy = 1.6, -0.9
        img1 = shift_image(img0, dx, dy)
        cfg = CFG._replace(interpolation="bicubic")
        assert klt.resolve_backend(cfg) == "xla"
        pyr0 = pyramid.build_pyramid(jnp.asarray(img0), cfg.levels)
        pyr1 = pyramid.build_pyramid(jnp.asarray(img1), cfg.levels)
        pts = make_points()
        alive = jnp.ones(pts.shape[0], dtype=bool)
        pos, _, ok = klt.track_points_bidirectional(pyr0, pyr1, pts, alive,
                                                    cfg)
        ok = np.asarray(ok)
        assert ok.sum() >= pts.shape[0] * 0.75, f"only {ok.sum()} survived"
        flow = np.asarray(pos) - np.asarray(pts)
        err = np.abs(flow[ok] - np.array([dx, dy]))
        assert np.median(err) < 0.3, f"median err {np.median(err)}"

    def test_bicubic_close_to_bilinear_on_same_scene(self):
        # Same scene through both samplers: results agree to a fraction of a
        # pixel on converged tracks (they solve the same alignment).
        img0 = textured_image(seed=8)
        img1 = shift_image(img0, 0.8, 1.1)
        pts = make_points()
        alive = jnp.ones(pts.shape[0], dtype=bool)
        out = {}
        for mode in ("bilinear", "bicubic"):
            cfg = CFG._replace(interpolation=mode, backend="xla")
            pyr0 = pyramid.build_pyramid(jnp.asarray(img0), cfg.levels)
            pyr1 = pyramid.build_pyramid(jnp.asarray(img1), cfg.levels)
            pos, _, ok = klt.track_points_bidirectional(
                pyr0, pyr1, pts, alive, cfg)
            out[mode] = (np.asarray(pos), np.asarray(ok))
        both = out["bilinear"][1] & out["bicubic"][1]
        assert both.sum() >= pts.shape[0] * 0.6
        d = np.abs(out["bilinear"][0][both] - out["bicubic"][0][both])
        assert d.max() < 0.5, f"max sampler disagreement {d.max()}"

    def test_pallas_backend_with_bicubic_is_an_error(self):
        cfg = CFG._replace(interpolation="bicubic", backend="pallas")
        with pytest.raises(ValueError):
            klt.resolve_backend(cfg)


class TestCoarseLevelPolicy:
    """Round-4 border-tolerant coarse-to-fine (KLTConfig.coarse_level_policy):
    a feature near the image border is unusable at coarse pyramid levels
    (its coordinates shrink below the patch footprint) — strict mode kills
    the whole track (reference parity, ref feature_tracker.rs:305-331);
    tolerant mode skips the failed coarse levels and tracks it at the fine
    levels, with the bidirectional gate still arbitrating."""

    def _border_setup(self, backend):
        img0 = textured_image(seed=4)
        img1 = shift_image(img0, 2.0, 1.0)
        pyr0 = pyramid.build_pyramid(jnp.asarray(img0), 5)
        pyr1 = pyramid.build_pyramid(jnp.asarray(img1), 5)
        # x ~ 14 px: level 4 coordinate 0.9 px -> patch out of bounds there.
        pts = jnp.asarray([[14.0, 60.0], [15.0, 40.0], [80.0, 60.0]],
                          jnp.float32)
        alive = jnp.ones(3, bool)
        return pyr0, pyr1, pts, alive

    @pytest.mark.parametrize("backend", ["xla", "pallas"])
    def test_border_feature_tracks_in_tolerant_mode(self, backend):
        pyr0, pyr1, pts, alive = self._border_setup(backend)
        strict = CFG._replace(levels=5, backend=backend,
                              coarse_level_policy="strict")
        tol = strict._replace(coarse_level_policy="tolerant")
        _, _, ok_s = klt.track_points_bidirectional(pyr0, pyr1, pts, alive,
                                                    strict)
        pos_t, _, ok_t = klt.track_points_bidirectional(pyr0, pyr1, pts,
                                                        alive, tol)
        # Strict kills the border features; tolerant tracks them accurately.
        assert not bool(ok_s[0]) and not bool(ok_s[1])
        assert bool(ok_t[0]) and bool(ok_t[1])
        err = np.abs(np.asarray(pos_t[:2]) - (np.asarray(pts[:2])
                                              + np.array([2.0, 1.0])))
        assert err.max() < 0.35, err
        # The interior feature behaves identically in both modes.
        assert bool(ok_s[2]) and bool(ok_t[2])

    def test_interior_features_unchanged(self):
        """Tolerant mode must be a no-op for interior features (all levels
        in bounds -> identical mask and positions)."""
        img0 = textured_image(seed=5)
        img1 = shift_image(img0, 1.5, -0.5)
        pyr0 = pyramid.build_pyramid(jnp.asarray(img0), CFG.levels)
        pyr1 = pyramid.build_pyramid(jnp.asarray(img1), CFG.levels)
        pts = make_points()
        alive = jnp.ones(pts.shape[0], bool)
        strict = CFG._replace(coarse_level_policy="strict")
        tol = CFG._replace(coarse_level_policy="tolerant")
        p_s, _, ok_s = klt.track_points_bidirectional(pyr0, pyr1, pts, alive,
                                                      strict)
        p_t, _, ok_t = klt.track_points_bidirectional(pyr0, pyr1, pts, alive,
                                                      tol)
        interior = np.asarray(ok_s)
        np.testing.assert_array_equal(np.asarray(ok_t)[interior],
                                      interior[interior])
        np.testing.assert_allclose(np.asarray(p_t)[interior],
                                   np.asarray(p_s)[interior], atol=1e-5)
