"""Dataset player + CLI end-to-end tests on a tiny generated EuRoC-layout
dataset (synthetic textured frames written as PNGs)."""

import os

import numpy as np
import pytest

from rsvio_tpu.data import players
from rsvio_tpu.utils import trajectory


def make_mini_euroc(root, extra_cfg: str = ""):
    """Generate a minimal EuRoC mav0 tree: 8 stereo frames of a shifting
    texture + IMU csv + config yaml. Callable outside pytest (the f64 CLI
    test builds one inside a fresh x64 interpreter)."""
    import pathlib
    import cv2
    root = pathlib.Path(root) / "MINI_01"
    cam0 = root / "mav0" / "cam0"
    cam1 = root / "mav0" / "cam1"
    imu0 = root / "mav0" / "imu0"
    (cam0 / "data").mkdir(parents=True)
    (cam1 / "data").mkdir(parents=True)
    imu0.mkdir(parents=True)

    H, W = 120, 160
    rng = np.random.default_rng(0)
    base = cv2.resize(rng.uniform(0, 255, (40, 50)).astype(np.float32),
                      (W * 2, H * 2), interpolation=cv2.INTER_CUBIC)

    rows = ["#timestamp [ns],filename"]
    t0 = 1000000000
    for k in range(8):
        ts = t0 + k * 50_000_000  # 20 Hz
        fname = f"{ts}.png"
        left = base[k:k + H, k * 2:k * 2 + W]
        right = base[k:k + H, k * 2 + 6:k * 2 + 6 + W]
        cv2.imwrite(str(cam0 / "data" / fname), left.astype(np.uint8))
        cv2.imwrite(str(cam1 / "data" / fname), right.astype(np.uint8))
        rows.append(f"{ts},{fname}")
    (cam0 / "data.csv").write_text("\n".join(rows) + "\n")
    (cam1 / "data.csv").write_text("\n".join(rows) + "\n")

    imu_rows = ["#timestamp,wx,wy,wz,ax,ay,az"]
    for k in range(80):
        ts = t0 + k * 5_000_000  # 200 Hz
        imu_rows.append(f"{ts},0.01,0.0,-0.01,0.1,0.0,9.81")
    (imu0 / "data.csv").write_text("\n".join(imu_rows) + "\n")

    cfg = f"""%YAML:1.0
---
camera:
  image_width: {W}
  image_height: {H}
  left_intrinsics: [100.0, 100.0, {W/2}, {H/2}]
  left_distortion: [0.0, 0.0, 0.0, 0.0]
  right_intrinsics: [100.0, 100.0, {W/2}, {H/2}]
  right_distortion: [0.0, 0.0, 0.0, 0.0]
  T_B_Cl: [1,0,0,0, 0,1,0,0, 0,0,1,0, 0,0,0,1]
  T_B_Cr: [1,0,0,0.11, 0,1,0,0, 0,0,1,0, 0,0,0,1]
keyframe_management:
  keyframe_window_size: 4
  translation_threshold: 0.01
  rotation_threshold: 0.05
feature_detection:
  grid_size: 24
  max_features_per_grid: 1
  optical_flow_max_iterations: 10
  optical_flow_convergence_threshold: 0.01
unknown_section:
  ignored_key: 1
optimization:
  pnp_max_iterations: 5
  bundle_adjustment_max_iterations: 8
tracker:
  pyramid_levels: 3
  feature_capacity: 64
  detect_margin: 10
  min_corner_score: 5.0
"""
    cfg_path = root / "config.yaml"
    cfg_path.write_text(cfg + extra_cfg)
    return str(root), str(cfg_path)


@pytest.fixture(scope="module")
def mini_euroc(tmp_path_factory):
    return make_mini_euroc(tmp_path_factory.mktemp("euroc"))


class TestPlayers:
    def test_manifest_and_frames(self, mini_euroc):
        root, _ = mini_euroc
        p = players.EurocPlayer(root)
        assert len(p) == 8
        f = p.load_frame(0)
        assert f.left.shape == (120, 160)
        assert f.left.dtype == np.float32
        assert f.timestamp_ns == 1000000000

    def test_imu_loading(self, mini_euroc):
        root, _ = mini_euroc
        p = players.EurocPlayer(root)
        samples = p.load_imu()
        assert len(samples) == 80
        np.testing.assert_allclose(samples[0].accel, [0.1, 0.0, 9.81])

    def test_prefetch_order(self, mini_euroc):
        root, _ = mini_euroc
        p = players.EurocPlayer(root)
        frames = list(players.prefetch_frames(p, 0, 5))
        assert len(frames) == 5
        ts = [f.timestamp_ns for f in frames]
        assert ts == sorted(ts)


class TestCLI:
    def test_run_euroc_end_to_end(self, mini_euroc, tmp_path):
        root, cfg_path = mini_euroc
        traj = str(tmp_path / "traj.txt")
        from rsvio_tpu.cli.run_euroc import main
        rc = main([cfg_path, root, "--max-frames", "8", "--quiet",
                   "--trajectory-out", traj])
        assert rc == 0
        assert os.path.exists(traj)
        ts, pos, quat = trajectory.load_tum(traj)
        assert len(ts) == 8
        assert np.all(np.isfinite(pos))
        # statistics.txt written into the dataset dir (ref euroc_player.rs:325)
        assert os.path.exists(os.path.join(root, "statistics.txt"))

    def test_run_euroc_marginalization_flag(self, mini_euroc, tmp_path):
        """--marginalization routes the CLI through the marginalized BA
        (Schur prior across window rolls) end to end."""
        root, cfg_path = mini_euroc
        traj = str(tmp_path / "traj_marg.txt")
        from rsvio_tpu.cli.run_euroc import main
        rc = main([cfg_path, root, "--max-frames", "8", "--quiet",
                   "--marginalization", "--trajectory-out", traj])
        assert rc == 0
        ts, pos, quat = trajectory.load_tum(traj)
        assert len(ts) == 8
        assert np.all(np.isfinite(pos))

    def test_marginalization_yaml_key(self, mini_euroc, tmp_path):
        """solver.marginalization in the YAML reaches EstimatorConfig."""
        _, cfg_path = mini_euroc
        from rsvio_tpu.utils.config import load_config, make_estimator_config
        cfg = load_config(cfg_path)
        cfg.solver.marginalization = True
        ecfg, _ = make_estimator_config(cfg)
        assert ecfg.use_marginalization


class TestTrajectoryUtils:
    def test_tum_roundtrip(self, tmp_path):
        from rsvio_tpu.ops import lie
        import jax.numpy as jnp
        rng = np.random.default_rng(1)
        poses = []
        ts = []
        for k in range(5):
            R = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(size=3) * 0.3,
                                                   dtype=jnp.float32)))
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = rng.normal(size=3)
            poses.append(T)
            ts.append(1000000000 + k * 50_000_000)
        path = str(tmp_path / "t.txt")
        trajectory.save_tum(path, ts, poses)
        ts2, pos2, quat2 = trajectory.load_tum(path)
        np.testing.assert_allclose(ts2, np.asarray(ts) * 1e-9, atol=1e-9)
        np.testing.assert_allclose(pos2, [p[:3, 3] for p in poses], atol=1e-5)

    def test_ate_identity(self):
        rng = np.random.default_rng(2)
        pos = rng.normal(size=(20, 3))
        rmse, _ = trajectory.ate_rmse(pos, pos)
        assert rmse < 1e-9

    def test_ate_invariant_to_rigid_transform(self):
        from scipy.spatial.transform import Rotation
        rng = np.random.default_rng(3)
        pos = rng.normal(size=(30, 3))
        R = Rotation.from_rotvec([0.3, -0.2, 0.5]).as_matrix()
        moved = (R @ pos.T).T + np.array([1.0, -2.0, 3.0])
        rmse, _ = trajectory.ate_rmse(moved, pos)
        assert rmse < 1e-9

    def test_ate_detects_error(self):
        rng = np.random.default_rng(4)
        pos = rng.normal(size=(30, 3))
        noisy = pos + rng.normal(size=(30, 3)) * 0.1
        rmse, _ = trajectory.ate_rmse(noisy, pos)
        assert 0.02 < rmse < 0.3

    def test_associate(self):
        a = np.array([0.0, 0.1, 0.2, 0.35])
        b = np.array([0.005, 0.105, 0.3])
        ia, ib = trajectory.associate(a, b, max_dt=0.02)
        assert list(ia) == [0, 1]
        assert list(ib) == [0, 1]


class TestCLIEvalAndCheckpointing:
    def test_eval_ate_and_periodic_checkpoint(self, mini_euroc, tmp_path):
        """--eval-ate associates against mav0 ground truth and records the
        RMSE in statistics.txt; --checkpoint-every writes snapshots."""
        root, cfg_path = mini_euroc
        gt_dir = os.path.join(root, "mav0", "state_groundtruth_estimate0")
        os.makedirs(gt_dir, exist_ok=True)
        # GT stamps in seconds (the loader auto-detects epoch-scale ns as in
        # real EuRoC files; the fixture's toy stamps are too small for that).
        rows = ["#timestamp, px, py, pz, qw, qx, qy, qz"]
        for k in range(8):
            rows.append(f"{1.0 + k * 0.05:.3f},{0.02 * k},0.0,0.0,1,0,0,0")
        with open(os.path.join(gt_dir, "data.csv"), "w") as f:
            f.write("\n".join(rows) + "\n")
        ckpt = str(tmp_path / "state.ckpt")
        from rsvio_tpu.cli.run_euroc import main
        rc = main([cfg_path, root, "--max-frames", "8", "--quiet",
                   "--eval-ate", "--checkpoint-out", ckpt,
                   "--checkpoint-every", "3"])
        assert rc == 0
        assert os.path.exists(ckpt)
        stats = open(os.path.join(root, "statistics.txt")).read()
        assert "ate_rmse_m:" in stats, stats
        rmse = float([ln for ln in stats.splitlines()
                      if ln.startswith("ate_rmse_m")][0].split()[-1])
        assert np.isfinite(rmse)


class TestArtifactViewer:
    def test_viewer_dir_writes_artifacts(self, mini_euroc, tmp_path):
        """--viewer-dir produces PNG overlays, a PLY map, a trajectory
        polyline + SVG, and a poses.json without any viewer SDK."""
        root, cfg_path = mini_euroc
        vdir = str(tmp_path / "viz")
        from rsvio_tpu.cli.run_euroc import main
        rc = main([cfg_path, root, "--max-frames", "8", "--quiet",
                   "--viewer-dir", vdir])
        assert rc == 0
        frames = os.listdir(os.path.join(vdir, "frames"))
        assert any(f.startswith("stereo_left") for f in frames), frames
        assert os.path.exists(os.path.join(vdir, "trajectory.txt"))
        assert os.path.exists(os.path.join(vdir, "trajectory.svg"))
        assert os.path.exists(os.path.join(vdir, "poses.json"))
        ply = os.path.join(vdir, "map_points.ply")
        if os.path.exists(ply):   # present once landmarks exist
            head = open(ply).read(100)
            assert head.startswith("ply")


class TestTartanAirCLI:
    def test_run_tartanair_end_to_end(self, tmp_path):
        """Mono tracking CLI over a generated image_left sequence
        (parity with ref feature_tracker play_tartanair bin)."""
        import cv2
        seq = tmp_path / "seq"
        (seq / "image_left").mkdir(parents=True)
        rng = np.random.default_rng(0)
        base = cv2.resize(rng.uniform(0, 255, (40, 50)).astype(np.float32),
                          (320, 240), interpolation=cv2.INTER_CUBIC)
        for k in range(5):
            cv2.imwrite(str(seq / "image_left" / f"{k:06d}_left.png"),
                        base[k:k + 120, k * 2:k * 2 + 160].astype(np.uint8))
        vdir = str(tmp_path / "viz")
        from rsvio_tpu.cli.run_tartanair import main
        rc = main([str(seq), "--max-frames", "5", "--levels", "3",
                   "--capacity", "64", "--quiet", "--viewer-dir", vdir])
        assert rc == 0
        frames = os.listdir(os.path.join(vdir, "frames"))
        assert any(f.startswith("tartanair_left") for f in frames)
        # FT debug surface (ref feature_tracker/src/viewer.rs:6-97):
        # pyramid levels, colormapped score map, labeled points.
        assert any("tartanair_pyramid_level" in f for f in frames), frames
        assert any(f.startswith("tartanair_shi_tomasi") for f in frames)
        assert os.path.exists(os.path.join(vdir, "tartanair_labels_labels.txt"))

    def test_run_tartanair_with_config_file(self, tmp_path):
        """--config drives the experimental-crate tracker schema (arbitrary
        ratio, pre-blur, LM damping — ref feature_tracker/config/config.yaml
        via play_tartanair.rs)."""
        import cv2
        seq = tmp_path / "seq"
        (seq / "image_left").mkdir(parents=True)
        rng = np.random.default_rng(1)
        base = cv2.resize(rng.uniform(0, 255, (40, 50)).astype(np.float32),
                          (320, 240), interpolation=cv2.INTER_CUBIC)
        for k in range(4):
            cv2.imwrite(str(seq / "image_left" / f"{k:06d}_left.png"),
                        base[k:k + 120, k * 2:k * 2 + 160].astype(np.uint8))
        cfg = tmp_path / "tracker.yaml"
        cfg.write_text(
            "nlevels: 3\nratio: 1.6\npreprocessing_blur: true\n"
            "detection_min_dist: 20\ndetection_threshold: 2.5\n"
            "optical_flow_max_iter: 15\noptical_flow_lm_lambda: 0.1\n")
        from rsvio_tpu.cli.run_tartanair import main
        rc = main([str(seq), "--config", str(cfg), "--capacity", "64",
                   "--quiet"])
        assert rc == 0
