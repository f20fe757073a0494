"""North-star metric path end-to-end: generate a synthetic dataset with
KNOWN camera motion + a TUM ground-truth file, run the full CLI, and check
the resulting ATE RMSE through utils.trajectory.evaluate_ate."""

import os

import numpy as np
import pytest

from rsvio_tpu.utils import trajectory

H, W = 160, 208
FX = FY = 140.0
CX, CY = W / 2, H / 2
BASELINE = 0.11
PLANE_Z = 4.0
STEP_M = 0.015
N_FRAMES = 14
T0_NS = 1_000_000_000
DT_NS = 50_000_000


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp("ate") / "SYN_01"
    for c in ["cam0", "cam1"]:
        (root / "mav0" / c / "data").mkdir(parents=True)

    rng = np.random.default_rng(3)
    tex = sum(w * cv2.resize(rng.uniform(0, 1, (n, n)).astype(np.float32),
                             (1024, 1024), interpolation=cv2.INTER_CUBIC)
              for w, n in [(120.0, 48), (60.0, 192)]) + 40.0

    def render(cam_t):
        u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                           np.arange(H, dtype=np.float32))
        mx = (((u - CX) / FX * PLANE_Z + cam_t[0]) * 90.0 + 350.0).astype(np.float32)
        my = (((v - CY) / FY * PLANE_Z + cam_t[1]) * 90.0 + 350.0).astype(np.float32)
        return cv2.remap(tex, mx, my, cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_REFLECT)

    rows = ["#timestamp [ns],filename"]
    gt_poses, gt_ts = [], []
    for k in range(N_FRAMES):
        ts = T0_NS + k * DT_NS
        t = np.array([STEP_M * k, 0.0, 0.0])
        fname = f"{ts}.png"
        cv2.imwrite(str(root / "mav0" / "cam0" / "data" / fname),
                    np.clip(render(t), 0, 255).astype(np.uint8))
        cv2.imwrite(str(root / "mav0" / "cam1" / "data" / fname),
                    np.clip(render(t + np.array([BASELINE, 0, 0])), 0, 255).astype(np.uint8))
        rows.append(f"{ts},{fname}")
        T = np.eye(4)
        T[:3, 3] = t
        gt_poses.append(T)
        gt_ts.append(ts)
    (root / "mav0" / "cam0" / "data.csv").write_text("\n".join(rows) + "\n")
    (root / "mav0" / "cam1" / "data.csv").write_text("\n".join(rows) + "\n")

    gt_file = str(root / "gt.txt")
    trajectory.save_tum(gt_file, gt_ts, gt_poses)

    cfg = f"""%YAML:1.0
---
camera:
  image_width: {W}
  image_height: {H}
  left_intrinsics: [{FX}, {FY}, {CX}, {CY}]
  left_distortion: [0.0, 0.0, 0.0, 0.0]
  right_intrinsics: [{FX}, {FY}, {CX}, {CY}]
  right_distortion: [0.0, 0.0, 0.0, 0.0]
  T_B_Cl: [1,0,0,0, 0,1,0,0, 0,0,1,0, 0,0,0,1]
  T_B_Cr: [1,0,0,{BASELINE}, 0,1,0,0, 0,0,1,0, 0,0,0,1]
keyframe_management:
  keyframe_window_size: 4
  translation_threshold: 0.01
  rotation_threshold: 0.05
feature_detection:
  grid_size: 28
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
    return str(root), str(cfg_path), gt_file


def test_cli_trajectory_ate(dataset, tmp_path):
    root, cfg_path, gt_file = dataset
    traj = str(tmp_path / "est.txt")
    from rsvio_tpu.cli.run_euroc import main
    rc = main([cfg_path, root, "--quiet", "--trajectory-out", traj])
    assert rc == 0
    assert os.path.exists(traj)
    # Evaluate only the post-initialization segment: the estimator holds the
    # pose at identity until the window fills (reference-parity startup), so
    # drop the first window_size frames before the SE3-aligned ATE.
    ts_e, pos_e, _ = trajectory.load_tum(traj)
    ts_g, pos_g, _ = trajectory.load_tum(gt_file)
    ia, ib = trajectory.associate(ts_e, ts_g)
    keep = ia >= 5
    rmse, _ = trajectory.ate_rmse(pos_e[ia[keep]], pos_g[ib[keep]])
    # GT displacement over the evaluated span is ~0.12 m; require ATE well
    # under that (the synthetic scene tracks to a few mm in practice).
    assert rmse < 0.03, f"ATE RMSE {rmse:.4f} m"
