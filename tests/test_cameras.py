"""Camera model tests: project/unproject round-trips for pinhole-radtan and
EUCM with the real EuRoC / TUM-VI calibrations, plus cross-check against
OpenCV's undistortPoints for the radtan model."""

import jax
import jax.numpy as jnp
import numpy as np

from rsvio_tpu.ops import cameras

# Real EuRoC cam0 calibration (ref config/euroc_vio.yaml)
EUROC_INTR = [458.654, 457.296, 367.215, 248.375]
EUROC_DIST = [-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05]
# Real TUM-VI cam0 EUCM calibration (ref config/tum_vi.yaml)
TUMVI_INTR = [191.75556798912652, 191.74816751185256, 254.9226487139376, 256.8780365577954]
TUMVI_DIST = [0.6246288732884442, 1.0598071085569876]

RNG = np.random.default_rng(0)


def test_pack_params_shapes():
    p = cameras.pack_params(cameras.PINHOLE_RADTAN, EUROC_INTR, EUROC_DIST)
    assert p.shape == (cameras.PARAM_WIDTH,)
    assert float(p[8]) == 0.0  # k3 defaults to 0
    p2 = cameras.pack_params("EUCM", TUMVI_INTR, TUMVI_DIST)
    assert abs(float(p2[4]) - TUMVI_DIST[0]) < 1e-6  # f32 rounding


class TestRadtan:
    params = cameras.pack_params(cameras.PINHOLE_RADTAN, EUROC_INTR, EUROC_DIST)

    def test_project_unproject_roundtrip(self):
        # Points across the frustum
        pts = RNG.uniform(-0.6, 0.6, size=(64, 2))
        p_cam = jnp.asarray(
            np.concatenate([pts, np.ones((64, 1))], axis=1) * RNG.uniform(0.5, 5, (64, 1)),
            dtype=jnp.float32)
        uv, valid = jax.vmap(lambda p: cameras.radtan_project(self.params, p))(p_cam)
        assert bool(jnp.all(valid))
        xy = jax.vmap(lambda u: cameras.radtan_unproject(self.params, u))(uv)
        expected = p_cam[:, :2] / p_cam[:, 2:3]
        np.testing.assert_allclose(xy, expected, atol=1e-4)

    def test_matches_opencv(self):
        import cv2
        K = np.array([[EUROC_INTR[0], 0, EUROC_INTR[2]],
                      [0, EUROC_INTR[1], EUROC_INTR[3]],
                      [0, 0, 1]])
        dist = np.array(EUROC_DIST + [0.0])
        uv = RNG.uniform([100, 100], [650, 380], size=(32, 2)).astype(np.float64)
        ref = cv2.undistortPoints(uv.reshape(-1, 1, 2), K, dist).reshape(-1, 2)
        ours = jax.vmap(lambda u: cameras.radtan_unproject(self.params, u))(
            jnp.asarray(uv, dtype=jnp.float32))
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_behind_camera_invalid(self):
        _, valid = cameras.radtan_project(self.params, jnp.asarray([0.1, 0.1, -1.0]))
        assert not bool(valid)


class TestEUCM:
    params = cameras.pack_params("EUCM", TUMVI_INTR, TUMVI_DIST)

    def test_project_unproject_roundtrip(self):
        pts = RNG.uniform(-0.8, 0.8, size=(64, 2))
        p_cam = jnp.asarray(
            np.concatenate([pts, np.ones((64, 1))], axis=1) * RNG.uniform(0.5, 5, (64, 1)),
            dtype=jnp.float32)
        uv, valid = jax.vmap(lambda p: cameras.eucm_project(self.params, p))(p_cam)
        assert bool(jnp.all(valid))
        xy = jax.vmap(lambda u: cameras.eucm_unproject(self.params, u))(uv)
        expected = p_cam[:, :2] / p_cam[:, 2:3]
        np.testing.assert_allclose(xy, expected, atol=1e-4)

    def test_center_pixel(self):
        uv, valid = cameras.eucm_project(self.params, jnp.asarray([0.0, 0.0, 2.0]))
        assert bool(valid)
        np.testing.assert_allclose(uv, [TUMVI_INTR[2], TUMVI_INTR[3]], atol=1e-4)

    def test_dispatch(self):
        uv1, _ = cameras.project("EUCM", self.params, jnp.asarray([0.1, 0.2, 1.5]))
        uv2, _ = cameras.eucm_project(self.params, jnp.asarray([0.1, 0.2, 1.5]))
        np.testing.assert_allclose(uv1, uv2)


def test_project_normalized_cheirality():
    xy, valid = cameras.project_normalized(jnp.asarray([1.0, 2.0, 4.0]))
    np.testing.assert_allclose(xy, [0.25, 0.5], atol=1e-6)
    assert bool(valid)
    _, invalid = cameras.project_normalized(jnp.asarray([1.0, 2.0, -4.0]))
    assert not bool(invalid)
