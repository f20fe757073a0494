"""Detection tests: FAST-9 and Shi-Tomasi scores must fire on synthetic
corners and stay silent on flat/edge regions; grid selection must respect
occupancy and borders (ref src/feature_tracker/image_utilities.rs:108-175)."""

import jax.numpy as jnp
import numpy as np

from rsvio_tpu.ops import detect

RNG = np.random.default_rng(11)


def corner_image(H=96, W=96):
    """Dark image with a bright rectangle -> 4 strong corners."""
    img = np.full((H, W), 20.0, dtype=np.float32)
    img[30:60, 40:80] = 220.0
    return jnp.asarray(img)


class TestFastScore:
    def test_fires_on_rectangle_corners(self):
        img = corner_image()
        score = np.asarray(detect.fast_score(img))
        # Strongest responses should be near the 4 rectangle corners.
        top = np.unravel_index(np.argsort(score.ravel())[-8:], score.shape)
        corners = np.array([[30, 40], [30, 79], [59, 40], [59, 79]])
        tops = np.stack(top, axis=1)
        for t in tops:
            d = np.abs(corners - t).sum(axis=1).min()
            assert d <= 4, f"top response {t} not near a corner"

    def test_silent_on_flat(self):
        img = jnp.full((64, 64), 100.0)
        score = np.asarray(detect.fast_score(img))
        assert score.max() <= 0.0

    def test_silent_on_straight_edge(self):
        # A long straight edge has at most ~8 contiguous ring points on one
        # side -> no 9-run -> much weaker than a corner.
        img = np.full((64, 64), 20.0, dtype=np.float32)
        img[:, 32:] = 220.0
        edge = float(np.asarray(detect.fast_score(jnp.asarray(img)))[16:48, 16:48].max())
        corner = float(np.asarray(detect.fast_score(corner_image())).max())
        assert edge < corner * 0.2 or edge <= 0.0


class TestShiTomasi:
    def test_corner_beats_edge_beats_flat(self):
        img = corner_image()
        s = np.asarray(detect.shi_tomasi_score(img))
        corner_s = s[28:33, 38:43].max()
        edge_s = s[43:47, 38:43].max()   # vertical edge midpoint
        flat_s = s[5:15, 5:15].max()
        assert corner_s > 5 * max(edge_s, 1e-6)
        assert flat_s < 1e-3


class TestGridSelect:
    def test_selects_in_empty_cells_only(self):
        img = corner_image()
        score = detect.fast_score(img)
        # Occupy the cell containing corner (40, 30) [x, y]
        occ_xy = jnp.asarray([[40.0, 30.0]])
        occ_mask = jnp.asarray([True])
        cand_xy, cand_ok = detect.select_grid_features(
            score, occ_xy, occ_mask, cell_size=32, margin=8, min_score=10.0)
        cand_xy, cand_ok = np.asarray(cand_xy), np.asarray(cand_ok)
        assert cand_ok.any()
        # no candidate in the occupied cell (cell row 0, col 1 for 32px cells)
        for xy, ok in zip(cand_xy, cand_ok):
            if ok:
                cell = (int(xy[1]) // 32, int(xy[0]) // 32)
                assert cell != (0, 1)

    def test_border_margin(self):
        img = np.zeros((96, 96), dtype=np.float32)
        img[2, 2] = 255.0  # corner-like blip in the border zone
        score = detect.fast_score(jnp.asarray(img))
        cand_xy, cand_ok = detect.select_grid_features(
            score, jnp.zeros((1, 2)), jnp.zeros(1, dtype=bool),
            cell_size=32, margin=19, min_score=10.0)
        cand_xy, cand_ok = np.asarray(cand_xy), np.asarray(cand_ok)
        for xy, ok in zip(cand_xy, cand_ok):
            if ok:
                assert 19 <= xy[0] < 96 - 19 and 19 <= xy[1] < 96 - 19

    def test_flat_image_no_candidates(self):
        img = jnp.full((96, 96), 77.0)
        score = detect.fast_score(img)
        _, cand_ok = detect.select_grid_features(
            score, jnp.zeros((1, 2)), jnp.zeros(1, dtype=bool),
            cell_size=32, margin=8, min_score=10.0)
        assert not np.asarray(cand_ok).any()
