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
