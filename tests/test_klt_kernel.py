"""Direct tests of the Pallas KLT level kernel (interpret mode on CPU):
identity fixed point, subpixel shift recovery, border/margin behavior,
dead-slot handling, and block padding."""

import jax.numpy as jnp
import numpy as np

from rsvio_tpu.ops.pallas import klt_kernel as K

RNG = np.random.default_rng(5)


def textured(H=96, W=144, seed=0):
    import cv2
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (H // 4, W // 4)).astype(np.float32)
    img = cv2.resize(base, (W, H), interpolation=cv2.INTER_CUBIC)
    return cv2.GaussianBlur(img, (5, 5), 1.0).astype(np.float32)


def shift(img, dx, dy):
    import cv2
    M = np.float32([[1, 0, dx], [0, 1, dy]])
    return cv2.warpAffine(img, M, (img.shape[1], img.shape[0]),
                          flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT)


def track(img_src, img_dst, pts, alive=None, iters=15):
    n = pts.shape[0]
    if alive is None:
        alive = jnp.ones(n, dtype=bool)
    return K.track_level_translation(
        jnp.asarray(img_src), jnp.asarray(img_dst), jnp.asarray(pts),
        jnp.asarray(pts), alive, iters, 1e-5, True)


class TestKernel:
    def test_identity_fixed_point(self):
        img = textured()
        pts = RNG.uniform([15, 15], [128, 80], size=(12, 2)).astype(np.float32)
        pos, ok = track(img, img, pts)
        ok = np.asarray(ok)
        assert ok.sum() >= 10
        drift = np.abs(np.asarray(pos)[ok] - pts[ok]).max()
        assert drift < 1e-3, drift

    def test_subpixel_shift(self):
        img = textured(seed=1)
        img2 = shift(img, 1.7, -0.6)
        pts = RNG.uniform([15, 15], [128, 80], size=(12, 2)).astype(np.float32)
        pos, ok = track(img, img2, pts)
        ok = np.asarray(ok)
        assert ok.sum() >= 9
        flow = np.asarray(pos)[ok] - pts[ok]
        err = np.abs(flow - np.array([1.7, -0.6]))
        assert np.median(err) < 0.15, np.median(err)

    def test_border_features_survive_with_replication(self):
        """Features within the center margin but whose patch overhangs the
        border sample edge-replicated pixels and may still track."""
        img = textured(seed=2)
        pts = np.array([[4.0, 4.0], [139.0, 91.0], [4.0, 91.0]],
                       dtype=np.float32)
        pos, ok = track(img, img, pts)
        # margin-2 validity keeps them; positions unchanged on identity
        ok = np.asarray(ok)
        assert ok.all()
        np.testing.assert_allclose(np.asarray(pos), pts, atol=1e-2)

    def test_out_of_image_rejected(self):
        img = textured(seed=3)
        pts = np.array([[1.0, 50.0], [143.5, 50.0], [50.0, 0.5]],
                       dtype=np.float32)
        _, ok = track(img, img, pts)
        assert not np.asarray(ok).any()

    def test_dead_slots_stay_dead(self):
        img = textured(seed=4)
        pts = RNG.uniform([15, 15], [128, 80], size=(8, 2)).astype(np.float32)
        alive = jnp.zeros(8, dtype=bool)
        _, ok = track(img, img, pts, alive=alive)
        assert not np.asarray(ok).any()

    def test_block_padding(self):
        """Feature counts that don't divide BLOCK pad correctly and the tail
        slots never leak into results."""
        img = textured(seed=6)
        n = K.BLOCK + 7
        pts = RNG.uniform([15, 15], [128, 80], size=(n, 2)).astype(np.float32)
        pos, ok = track(img, img, pts)
        assert pos.shape == (n, 2)
        assert ok.shape == (n,)
        okn = np.asarray(ok)
        assert okn.sum() >= n * 0.8
        np.testing.assert_allclose(np.asarray(pos)[okn], pts[okn], atol=1e-2)

    def test_flat_region_dies(self):
        img = np.full((96, 144), 100.0, dtype=np.float32)
        pts = RNG.uniform([20, 20], [120, 70], size=(6, 2)).astype(np.float32)
        _, ok = track(img, img, pts)
        assert not np.asarray(ok).any()


def rotate(img, deg, center):
    import cv2
    M = cv2.getRotationMatrix2D(center, deg, 1.0)
    return cv2.warpAffine(img, M, (img.shape[1], img.shape[0]),
                          flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT)


def track_se2(img_src, img_dst, pts, theta0=None, iters=25):
    n = pts.shape[0]
    alive = jnp.ones(n, dtype=bool)
    th0 = jnp.zeros(n, jnp.float32) if theta0 is None else jnp.asarray(theta0)
    return K.track_level(
        jnp.asarray(img_src), jnp.asarray(img_dst), jnp.asarray(pts),
        jnp.asarray(pts), th0, alive, iters, 1e-6,
        with_rotation=True, interpret=True)


class TestKernelRotation:
    """3-dof SE2 mode: first-order in-plane rotation warp."""

    def test_identity_keeps_theta_zero(self):
        img = textured(seed=3)
        pts = RNG.uniform([20, 20], [124, 76], size=(8, 2)).astype(np.float32)
        pos, th, ok = track_se2(img, img, pts)
        ok = np.asarray(ok)
        assert ok.sum() >= 7
        assert np.abs(np.asarray(th)[ok]).max() < 5e-3
        assert np.abs(np.asarray(pos)[ok] - pts[ok]).max() < 1e-2

    def test_recovers_known_rotation(self):
        """Image rotated 5 deg about its center: each feature must recover
        theta ~ -5 deg (image rotation by +a rotates patch content by -a in
        the warp convention) and land on its rotated position."""
        img = textured(H=128, W=192, seed=4)
        deg = 5.0
        cx, cy = 96.0, 64.0
        img2 = rotate(img, deg, (cx, cy))
        pts = RNG.uniform([55, 35], [137, 93], size=(16, 2)).astype(np.float32)
        # GT positions: cv2 rotates CONTENT by +deg ccw in image coords
        a = np.deg2rad(deg)
        R = np.array([[np.cos(a), np.sin(a)], [-np.sin(a), np.cos(a)]],
                     np.float32)
        gt = (pts - [cx, cy]) @ R.T + [cx, cy]
        pos, th, ok = track_se2(img, img2, pts)
        ok = np.asarray(ok)
        assert ok.sum() >= 12, ok.sum()
        perr = np.linalg.norm(np.asarray(pos)[ok] - gt[ok], axis=1)
        assert np.median(perr) < 0.3, perr
        th_ok = np.asarray(th)[ok]
        # All features see the same patch rotation: theta ~ -5 deg (the warp
        # angle is the template->target patch rotation, opposite in sign to
        # cv2's ccw content rotation in y-down image coordinates).
        assert np.abs(np.median(th_ok) + a) < np.deg2rad(1.5), (
            np.rad2deg(th_ok))

    def test_translation_mode_unaffected(self):
        """with_rotation=False must reproduce track_level_translation."""
        img = textured(seed=5)
        img2 = shift(img, 0.9, 1.3)
        pts = RNG.uniform([20, 20], [124, 76], size=(8, 2)).astype(np.float32)
        pos_a, ok_a = track(img, img2, pts)
        pos_b, th_b, ok_b = K.track_level(
            jnp.asarray(img), jnp.asarray(img2), jnp.asarray(pts),
            jnp.asarray(pts), jnp.zeros(8, jnp.float32),
            jnp.ones(8, bool), 15, 1e-5, with_rotation=False,
            interpret=True)
        np.testing.assert_array_equal(np.asarray(ok_a), np.asarray(ok_b))
        np.testing.assert_allclose(np.asarray(pos_a), np.asarray(pos_b))
        assert np.all(np.asarray(th_b) == 0)


class TestCameraBatched:
    def test_stereo_batch_matches_separate_calls(self):
        """A (2,H,W) camera stack + per-feature cam index must reproduce the
        two single-camera runs exactly (the stereo frontend's fused temporal
        pass relies on this)."""
        img0 = textured(seed=11)
        img1 = textured(seed=12)
        dst0 = shift(img0, 2.0, -1.0)
        dst1 = shift(img1, -1.5, 0.5)
        pts0 = RNG.uniform([15, 15], [128, 80], size=(8, 2)).astype(np.float32)
        pts1 = RNG.uniform([15, 15], [128, 80], size=(8, 2)).astype(np.float32)

        pos_a, ok_a = track(img0, dst0, pts0)
        pos_b, ok_b = track(img1, dst1, pts1)

        src = jnp.stack([jnp.asarray(img0), jnp.asarray(img1)])
        dst = jnp.stack([jnp.asarray(dst0), jnp.asarray(dst1)])
        pts = jnp.concatenate([jnp.asarray(pts0), jnp.asarray(pts1)])
        cam = jnp.concatenate([jnp.zeros(8, jnp.int32),
                               jnp.ones(8, jnp.int32)])
        alive = jnp.ones(16, dtype=bool)
        pos, _, ok = K.track_level(src, dst, pts, pts,
                                   jnp.zeros(16, jnp.float32), alive,
                                   15, 1e-5, with_rotation=False,
                                   interpret=True, cam=cam)
        np.testing.assert_array_equal(np.asarray(ok),
                                      np.concatenate([ok_a, ok_b]))
        np.testing.assert_allclose(np.asarray(pos),
                                   np.concatenate([pos_a, pos_b]), atol=1e-6)


class TestKernelRotationExact:
    """The rotated-position sampling is exact bilinear (not first-order), so
    large in-plane angles — up to the |theta| < 0.346 rad gate — must be
    recovered with the same quality as small ones."""

    def test_recovers_14deg_rotation(self):
        img = textured(H=160, W=224, seed=7)
        deg = 14.0
        cx, cy = 112.0, 80.0
        img2 = rotate(img, deg, (cx, cy))
        pts = RNG.uniform([70, 45], [155, 115], size=(16, 2)).astype(np.float32)
        a = np.deg2rad(deg)
        R = np.array([[np.cos(a), np.sin(a)], [-np.sin(a), np.cos(a)]],
                     np.float32)
        gt = (pts - [cx, cy]) @ R.T + [cx, cy]
        pos, th, ok = track_se2(img, img2, pts, iters=40)
        ok = np.asarray(ok)
        assert ok.sum() >= 10, ok.sum()
        perr = np.linalg.norm(np.asarray(pos)[ok] - gt[ok], axis=1)
        assert np.median(perr) < 0.35, perr
        th_ok = np.asarray(th)[ok]
        assert np.abs(np.median(th_ok) + a) < np.deg2rad(1.5), (
            np.rad2deg(th_ok))

    def test_ssd_variant_on_kernel_level(self):
        """SSD residual runs in-kernel and recovers a known shift."""
        img = textured(seed=8)
        img2 = shift(img, 1.2, -0.8)
        pts = RNG.uniform([15, 15], [128, 80], size=(12, 2)).astype(np.float32)
        pos, _, ok = K.track_level(
            jnp.asarray(img), jnp.asarray(img2), jnp.asarray(pts),
            jnp.asarray(pts), jnp.zeros(12, jnp.float32),
            jnp.ones(12, bool), 20, 1e-5, residual_mode="ssd",
            interpret=True)
        ok = np.asarray(ok)
        assert ok.sum() >= 9
        err = np.abs((np.asarray(pos) - pts)[ok] - [1.2, -0.8])
        assert np.median(err) < 0.15, np.median(err)

    def test_lm_damped_on_kernel_level(self):
        """Fixed-lambda damping shrinks steps but still converges."""
        img = textured(seed=9)
        img2 = shift(img, -0.9, 0.6)
        pts = RNG.uniform([15, 15], [128, 80], size=(12, 2)).astype(np.float32)
        pos, _, ok = K.track_level(
            jnp.asarray(img), jnp.asarray(img2), jnp.asarray(pts),
            jnp.asarray(pts), jnp.zeros(12, jnp.float32),
            jnp.ones(12, bool), 30, 1e-6, lm_lambda=0.5, interpret=True)
        ok = np.asarray(ok)
        assert ok.sum() >= 9
        err = np.abs((np.asarray(pos) - pts)[ok] - [-0.9, 0.6])
        assert np.median(err) < 0.15, np.median(err)
