"""Native C++ loader tests: build, ordered delivery, content correctness,
RGB conversion, error surfacing, and fallback behavior."""

import numpy as np
import pytest

from rsvio_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.load_library()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


@pytest.fixture()
def png_pair(tmp_path):
    import cv2
    H, W = 48, 64
    lefts, rights, truth = [], [], []
    rng = np.random.default_rng(0)
    for i in range(6):
        l = rng.integers(0, 255, (H, W), dtype=np.uint8)
        r = rng.integers(0, 255, (H, W), dtype=np.uint8)
        lp = str(tmp_path / f"l{i}.png")
        rp = str(tmp_path / f"r{i}.png")
        cv2.imwrite(lp, l)
        cv2.imwrite(rp, r)
        lefts.append(lp)
        rights.append(rp)
        truth.append((l, r))
    return lefts, rights, truth, H, W


class TestNativeLoader:
    def test_ordered_content(self, lib, png_pair):
        lefts, rights, truth, H, W = png_pair
        loader = native.NativeStereoLoader(lefts, rights, H, W, n_threads=3)
        seen = []
        for idx, l, r in loader:
            np.testing.assert_array_equal(l, truth[idx][0].astype(np.float32))
            np.testing.assert_array_equal(r, truth[idx][1].astype(np.float32))
            seen.append(idx)
        assert seen == list(range(6))
        loader.close()

    def test_rgb_converted(self, lib, tmp_path):
        import cv2
        H, W = 16, 20
        rgb = np.zeros((H, W, 3), np.uint8)
        rgb[:, :, 2] = 200  # red channel in BGR write -> red pixel
        p = str(tmp_path / "rgb.png")
        cv2.imwrite(p, rgb)
        loader = native.NativeStereoLoader([p], [p], H, W)
        _, l, r = next(iter(loader))
        # BT.601: 0.299 * 200 = 59.8 -> integer luma 59
        assert abs(float(l[0, 0]) - 59.0) <= 1.0
        loader.close()

    def test_dimension_mismatch_errors(self, lib, png_pair):
        lefts, rights, truth, H, W = png_pair
        loader = native.NativeStereoLoader(lefts[:1], rights[:1], H + 8, W)
        with pytest.raises(IOError):
            next(iter(loader))
        loader.close()

    def test_native_prefetch_over_player(self, lib, tmp_path):
        import cv2
        from rsvio_tpu.data.players import EurocPlayer
        root = tmp_path / "DS"
        for c in ["cam0", "cam1"]:
            (root / "mav0" / c / "data").mkdir(parents=True)
        rows = ["#ts,filename"]
        H, W = 32, 40
        for i in range(4):
            ts = 1000 + i
            f = f"{ts}.png"
            for c in ["cam0", "cam1"]:
                cv2.imwrite(str(root / "mav0" / c / "data" / f),
                            np.full((H, W), i * 11, np.uint8))
            rows.append(f"{ts},{f}")
        (root / "mav0" / "cam0" / "data.csv").write_text("\n".join(rows))
        (root / "mav0" / "cam1" / "data.csv").write_text("\n".join(rows))
        player = EurocPlayer(str(root))
        it = native.native_prefetch_frames(player, H, W)
        assert it is not None
        frames = list(it)
        assert len(frames) == 4
        assert frames[2].timestamp_ns == 1002
        assert float(frames[3].left[0, 0]) == 33.0
