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
