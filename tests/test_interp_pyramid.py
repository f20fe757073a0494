"""Sampling + pyramid tests, including the derivative-check harness pattern
from the reference (bicubic analytic gradient vs central finite differences,
ref feature_tracker/src/image_operations.rs:305-368)."""

import jax
import jax.numpy as jnp
import numpy as np

from rsvio_tpu.ops import interp, pyramid

RNG = np.random.default_rng(7)


def smooth_image(H=64, W=80):
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    img = (128 + 60 * np.sin(x * 0.21) * np.cos(y * 0.17)
           + 30 * np.sin((x + y) * 0.07))
    return jnp.asarray(img, dtype=jnp.float32)


class TestBilinear:
    def test_exact_at_integer_coords(self):
        img = smooth_image()
        v, ok = interp.bilinear(img, jnp.asarray([5.0, 7.0]))
        assert bool(ok)
        np.testing.assert_allclose(v, img[7, 5], atol=1e-5)

    def test_linear_ramp_exact(self):
        # bilinear is exact on a plane
        y, x = np.mgrid[0:32, 0:32].astype(np.float32)
        img = jnp.asarray(2.0 * x + 3.0 * y)
        for _ in range(10):
            p = RNG.uniform(1, 30, size=2).astype(np.float32)
            v, ok = interp.bilinear(img, jnp.asarray(p))
            assert bool(ok)
            np.testing.assert_allclose(v, 2 * p[0] + 3 * p[1], rtol=1e-5)

    def test_out_of_bounds(self):
        img = smooth_image()
        _, ok = interp.bilinear(img, jnp.asarray([-1.0, 5.0]))
        assert not bool(ok)
        _, ok = interp.bilinear(img, jnp.asarray([5.0, 1000.0]))
        assert not bool(ok)

    def test_gradient_on_ramp(self):
        y, x = np.mgrid[0:32, 0:32].astype(np.float32)
        img = jnp.asarray(2.0 * x + 3.0 * y)
        _, g, ok = interp.bilinear_with_grad(img, jnp.asarray([10.3, 12.7]))
        assert bool(ok)
        np.testing.assert_allclose(g, [2.0, 3.0], atol=1e-4)


class TestBicubic:
    def test_close_to_bilinear_on_smooth(self):
        img = smooth_image()
        for _ in range(10):
            p = jnp.asarray(RNG.uniform(5, 50, size=2).astype(np.float32))
            v1, _ = interp.bilinear(img, p)
            v2, ok = interp.bicubic(img, p)
            assert bool(ok)
            assert abs(float(v1) - float(v2)) < 2.0

    def test_gradient_matches_finite_differences(self):
        # The reference's derivative-check harness pattern.
        img = smooth_image()
        eps = 1e-3
        for _ in range(20):
            p = RNG.uniform(5, 50, size=2).astype(np.float32)
            _, g, ok = interp.bicubic_with_grad(img, jnp.asarray(p))
            assert bool(ok)
            vxp, _ = interp.bicubic(img, jnp.asarray([p[0] + eps, p[1]]))
            vxm, _ = interp.bicubic(img, jnp.asarray([p[0] - eps, p[1]]))
            vyp, _ = interp.bicubic(img, jnp.asarray([p[0], p[1] + eps]))
            vym, _ = interp.bicubic(img, jnp.asarray([p[0], p[1] - eps]))
            fd = np.array([(vxp - vxm) / (2 * eps), (vyp - vym) / (2 * eps)])
            # f32 FD of O(100)-magnitude values cancels ~3 digits; loose atol.
            np.testing.assert_allclose(g, fd, atol=0.1)

    def test_interpolates_at_integer_coords(self):
        img = smooth_image()
        v, ok = interp.bicubic(img, jnp.asarray([9.0, 11.0]))
        assert bool(ok)
        np.testing.assert_allclose(v, img[11, 9], atol=1e-4)


class TestPyramid:
    def test_shapes(self):
        img = smooth_image(480, 752)
        pyr = pyramid.build_pyramid(img, 6)
        assert len(pyr) == 6
        expected = pyramid.pyramid_shapes((480, 752), 6)
        for lvl, shape in zip(pyr, expected):
            assert lvl.shape == shape

    def test_downsample_constant(self):
        img = jnp.full((64, 64), 42.0)
        d = pyramid.downsample2(img)
        np.testing.assert_allclose(d, 42.0, atol=1e-5)

    def test_downsample_preserves_mean(self):
        img = smooth_image(64, 64)
        d = pyramid.downsample2(img)
        assert abs(float(jnp.mean(d)) - float(jnp.mean(img))) < 2.0

    def test_antialias_better_than_decimation(self):
        # High-frequency checkerboard: triangle filter must kill the alias.
        y, x = np.mgrid[0:64, 0:64]
        img = jnp.asarray(((x + y) % 2 * 200.0).astype(np.float32))
        d = pyramid.downsample2(img)
        assert float(jnp.std(d[2:-2, 2:-2])) < float(jnp.std(img)) * 0.5


class TestPyramidRatio:
    def test_arbitrary_ratio_shapes(self):
        img = smooth_image(90, 120)
        pyr = pyramid.build_pyramid_ratio(img, 4, 0.7)
        assert len(pyr) == 4
        for i, lvl in enumerate(pyr):
            # Rounded (not floored) level sizes — the reference's semantics
            # (ref feature_tracker/src/image_operations.rs:69-70).
            assert lvl.shape == (max(int(round(90 * 0.7**i)), 1),
                                 max(int(round(120 * 0.7**i)), 1))

    def test_half_ratio_close_to_builtin(self):
        img = smooth_image(64, 64)
        a = pyramid.build_pyramid(img, 3)
        b = pyramid.build_pyramid_ratio(img, 3, 0.5)
        for x, y in zip(a, b):
            assert x.shape == y.shape
            # Different filters AND sampling phase (triangle decimation at
            # even pixels vs resize's half-pixel centers), so compare
            # structure, not values: same scale content -> high correlation.
            xv = np.asarray(x).ravel() - float(jnp.mean(x))
            yv = np.asarray(y).ravel() - float(jnp.mean(y))
            corr = float(np.dot(xv, yv)
                         / max(np.linalg.norm(xv) * np.linalg.norm(yv), 1e-9))
            assert corr > 0.9, corr

    def test_blur_smooths(self):
        img = smooth_image(64, 64)
        sharp = pyramid.build_pyramid_ratio(img, 2, 0.6, blur=False)[1]
        soft = pyramid.build_pyramid_ratio(img, 2, 0.6, blur=True)[1]
        assert float(jnp.std(jnp.diff(soft, axis=1))) <= \
            float(jnp.std(jnp.diff(sharp, axis=1)))
