"""EUCM end-to-end: render a synthetic fisheye-ish stereo sequence THROUGH
the EUCM camera model and run the full CLI with left/right_model: EUCM —
exercising the EUCM unprojection inside the estimator (PnP/BA observations)
rather than just the unit round-trips."""

import os

import numpy as np
import pytest

H, W = 160, 160
FX = FY = 80.0
CX, CY = W / 2, H / 2
ALPHA, BETA = 0.55, 1.05
BASELINE = 0.11
PLANE_Z = 4.0
STEP_M = 0.015
N_FRAMES = 12


def eucm_unproject_np(u, v):
    """Closed-form EUCM unprojection (numpy, for rendering)."""
    mx = (u - CX) / FX
    my = (v - CY) / FY
    r2 = mx * mx + my * my
    inner = np.maximum(1.0 - (2 * ALPHA - 1.0) * BETA * r2, 1e-9)
    mz = (1.0 - BETA * ALPHA * ALPHA * r2) / (
        ALPHA * np.sqrt(inner) + (1.0 - ALPHA))
    return mx / mz, my / mz


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp("eucm") / "EUCM_01"
    for c in ["cam0", "cam1"]:
        (root / "mav0" / c / "data").mkdir(parents=True)

    rng = np.random.default_rng(7)
    tex = sum(w * cv2.resize(rng.uniform(0, 1, (n, n)).astype(np.float32),
                             (1024, 1024), interpolation=cv2.INTER_CUBIC)
              for w, n in [(120.0, 48), (60.0, 192)]) + 40.0

    u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32))
    x_n, y_n = eucm_unproject_np(u, v)  # normalized ray for each pixel

    def render(cam_t):
        mx = ((x_n * PLANE_Z + cam_t[0]) * 90.0 + 350.0).astype(np.float32)
        my = ((y_n * PLANE_Z + cam_t[1]) * 90.0 + 350.0).astype(np.float32)
        return cv2.remap(tex, mx, my, cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_REFLECT)

    rows = ["#timestamp [ns],filename"]
    for k in range(N_FRAMES):
        ts = 10**9 + k * 5 * 10**7
        t = np.array([STEP_M * k, 0.0, 0.0])
        fname = f"{ts}.png"
        cv2.imwrite(str(root / "mav0" / "cam0" / "data" / fname),
                    np.clip(render(t), 0, 255).astype(np.uint8))
        cv2.imwrite(str(root / "mav0" / "cam1" / "data" / fname),
                    np.clip(render(t + np.array([BASELINE, 0, 0])), 0, 255).astype(np.uint8))
        rows.append(f"{ts},{fname}")
    (root / "mav0" / "cam0" / "data.csv").write_text("\n".join(rows) + "\n")
    (root / "mav0" / "cam1" / "data.csv").write_text("\n".join(rows) + "\n")

    cfg = f"""%YAML:1.0
---
camera:
  image_width: {W}
  image_height: {H}
  left_intrinsics: [{FX}, {FY}, {CX}, {CY}]
  left_distortion: [{ALPHA}, {BETA}]
  left_model: "EUCM"
  right_intrinsics: [{FX}, {FY}, {CX}, {CY}]
  right_distortion: [{ALPHA}, {BETA}]
  right_model: "EUCM"
  T_B_Cl: [1,0,0,0, 0,1,0,0, 0,0,1,0, 0,0,0,1]
  T_B_Cr: [1,0,0,{BASELINE}, 0,1,0,0, 0,0,1,0, 0,0,0,1]
keyframe_management:
  keyframe_window_size: 4
  translation_threshold: 0.01
  rotation_threshold: 0.05
feature_detection:
  grid_size: 26
  max_features_per_grid: 1
  optical_flow_max_iterations: 12
  optical_flow_convergence_threshold: 0.01
optimization:
  pnp_max_iterations: 8
  bundle_adjustment_max_iterations: 10
tracker:
  pyramid_levels: 3
  feature_capacity: 96
  detect_margin: 10
  min_corner_score: 5.0
"""
    cfg_path = root / "config.yaml"
    cfg_path.write_text(cfg)
    return str(root), str(cfg_path)


def test_eucm_cli_tracks_motion(dataset, tmp_path):
    root, cfg_path = dataset
    traj = str(tmp_path / "est.txt")
    from rsvio_tpu.cli.run_euroc import main
    rc = main([cfg_path, root, "--quiet", "--trajectory-out", traj])
    assert rc == 0
    from rsvio_tpu.utils import trajectory
    ts, pos, _ = trajectory.load_tum(traj)
    assert np.all(np.isfinite(pos))
    # Post-initialization displacement must track ground truth in x.
    d_est = pos[-1, 0] - pos[5, 0]
    d_gt = STEP_M * (N_FRAMES - 1 - 5)
    assert abs(d_est - d_gt) < 0.4 * d_gt, (pos[:, 0], d_gt)


@pytest.mark.slow
class TestEUCM512TumViGeometry:
    """Quantitative ATE bound at TUM-VI-like geometry: 512x512 fisheye
    frames rendered through EUCM with the reference's actual cam0
    calibration constants (ref config/tum_vi.yaml: fx~191.76,
    alpha=0.6246, beta=1.0598), 2-axis translation. Measured on CPU:
    ATE RMSE ~0.007 m post-fill — bound set at 0.02 m (same class as the
    radtan path's <0.03 m), replacing the old tracks-displacement-only
    check as the EUCM accuracy evidence."""

    H2 = W2 = 512
    FX2, FY2 = 191.7556, 191.7482     # ref config/tum_vi.yaml left_intrinsics
    CX2, CY2 = 254.92, 256.88
    A2, B2 = 0.6246, 1.0598           # ref left_distortion [alpha, beta]
    BASE2 = 0.101
    Z2 = 3.0
    N2 = 14
    STEP2 = np.array([0.02, 0.008, 0.0])

    def _unproject(self, u, v):
        mx = (u - self.CX2) / self.FX2
        my = (v - self.CY2) / self.FY2
        r2 = mx * mx + my * my
        inner = np.maximum(1.0 - (2 * self.A2 - 1.0) * self.B2 * r2, 1e-9)
        mz = (1.0 - self.B2 * self.A2 ** 2 * r2) / (
            self.A2 * np.sqrt(inner) + (1.0 - self.A2))
        return mx / mz, my / mz

    @pytest.fixture(scope="class")
    def dataset512(self, tmp_path_factory):
        import cv2
        root = tmp_path_factory.mktemp("eucm512") / "EUCM512"
        for c in ["cam0", "cam1"]:
            (root / "mav0" / c / "data").mkdir(parents=True)
        rng = np.random.default_rng(7)
        tex = sum(w * cv2.resize(rng.uniform(0, 1, (n, n)).astype(np.float32),
                                 (2048, 2048), interpolation=cv2.INTER_CUBIC)
                  for w, n in [(120.0, 96), (60.0, 384)]) + 40.0
        u, v = np.meshgrid(np.arange(self.W2, dtype=np.float32),
                           np.arange(self.H2, dtype=np.float32))
        xn, yn = self._unproject(u, v)

        def render(t):
            mx = ((xn * self.Z2 + t[0]) * 180.0 + 900.0).astype(np.float32)
            my = ((yn * self.Z2 + t[1]) * 180.0 + 900.0).astype(np.float32)
            return cv2.remap(tex, mx, my, cv2.INTER_LINEAR,
                             borderMode=cv2.BORDER_REFLECT)

        rows = ["#timestamp [ns],filename"]
        for k in range(self.N2):
            ts = 10 ** 9 + k * 5 * 10 ** 7
            t = self.STEP2 * k
            fname = f"{ts}.png"
            cv2.imwrite(str(root / "mav0" / "cam0" / "data" / fname),
                        np.clip(render(t), 0, 255).astype(np.uint8))
            cv2.imwrite(
                str(root / "mav0" / "cam1" / "data" / fname),
                np.clip(render(t + np.array([self.BASE2, 0, 0])), 0,
                        255).astype(np.uint8))
            rows.append(f"{ts},{fname}")
        for c in ["cam0", "cam1"]:
            (root / "mav0" / c / "data.csv").write_text(
                "\n".join(rows) + "\n")
        cfg = f"""%YAML:1.0
---
camera:
  image_width: {self.W2}
  image_height: {self.H2}
  left_intrinsics: [{self.FX2}, {self.FY2}, {self.CX2}, {self.CY2}]
  left_distortion: [{self.A2}, {self.B2}]
  left_model: "EUCM"
  right_intrinsics: [{self.FX2}, {self.FY2}, {self.CX2}, {self.CY2}]
  right_distortion: [{self.A2}, {self.B2}]
  right_model: "EUCM"
  T_B_Cl: [1,0,0,0, 0,1,0,0, 0,0,1,0, 0,0,0,1]
  T_B_Cr: [1,0,0,{self.BASE2}, 0,1,0,0, 0,0,1,0, 0,0,0,1]
keyframe_management:
  keyframe_window_size: 5
  translation_threshold: 0.012
  rotation_threshold: 0.05
feature_detection:
  grid_size: 40
  max_features_per_grid: 1
  optical_flow_max_iterations: 12
  optical_flow_convergence_threshold: 0.01
optimization:
  pnp_max_iterations: 8
  bundle_adjustment_max_iterations: 12
tracker:
  pyramid_levels: 4
  feature_capacity: 160
  detect_margin: 12
  min_corner_score: 5.0
"""
        cfg_path = root / "config.yaml"
        cfg_path.write_text(cfg)
        return str(root), str(cfg_path)

    def test_ate_bound_at_tumvi_geometry(self, dataset512, tmp_path):
        root, cfg_path = dataset512
        traj = str(tmp_path / "est512.txt")
        from rsvio_tpu.cli.run_euroc import main
        rc = main([cfg_path, root, "--quiet", "--trajectory-out", traj])
        assert rc == 0
        from rsvio_tpu.utils import trajectory
        _, pos, _ = trajectory.load_tum(traj)
        gt = np.array([self.STEP2 * k for k in range(self.N2)])
        skip = 6   # window fill
        rmse, _ = trajectory.ate_rmse(pos[skip:], gt[skip:])
        assert rmse < 0.02, f"EUCM 512x512 ATE RMSE {rmse:.4f} m"
        d_est = np.linalg.norm(pos[-1] - pos[skip])
        d_gt = np.linalg.norm(gt[-1] - gt[skip])
        assert abs(d_est - d_gt) < 0.2 * d_gt, (d_est, d_gt)
