#!/usr/bin/env python
"""Evaluate ATE RMSE between an estimated trajectory and ground truth.

Usage:
  python tools/evaluate_ate.py <estimate.tum> <groundtruth> [--max-dt S]
      [--scale] [--gnss]

Both files are TUM format (`t x y z qx qy qz qw`); EuRoC
state_groundtruth_estimate0/data.csv also parses (comma-separated, ns
timestamps are auto-detected by magnitude). --gnss treats the ground-truth
file as 4Seasons GNSSPoses.txt. --scale aligns with Sim(3) (monocular-style)
instead of SE(3).

The reference ships no evaluation tooling at all (its trajectory saving is a
stub, ref src/datasets/euroc_player.rs:316-323); this provides the ATE
north-star metric of SURVEY.md §6.
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np  # noqa: E402

from rsvio_tpu.utils.trajectory import (  # noqa: E402
    associate, ate_rmse, gnss_to_tum, load_tum)


def _load_any(path: str):
    """TUM or EuRoC-CSV trajectory -> (ts_s, pos, quat)."""
    ts, pos, quat = load_tum(path)
    if len(ts) and ts.max() > 1e14:   # ns timestamps -> seconds
        ts = ts * 1e-9
    return ts, pos, quat


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("estimate")
    ap.add_argument("groundtruth")
    ap.add_argument("--max-dt", type=float, default=0.02,
                    help="association window in seconds")
    ap.add_argument("--scale", action="store_true",
                    help="Sim(3) alignment (estimate scale)")
    ap.add_argument("--gnss", action="store_true",
                    help="ground truth is 4Seasons GNSSPoses.txt")
    args = ap.parse_args(argv)

    gt_path = args.groundtruth
    if args.gnss:
        tmp = tempfile.NamedTemporaryFile(suffix=".tum", delete=False)
        tmp.close()
        gnss_to_tum(gt_path, tmp.name)
        gt_path = tmp.name

    ts_e, pos_e, _ = _load_any(args.estimate)
    ts_g, pos_g, _ = _load_any(gt_path)
    ia, ib = associate(ts_e, ts_g, args.max_dt)
    if len(ia) < 3:
        print(f"ERROR: only {len(ia)} associations (est {len(ts_e)}, "
              f"gt {len(ts_g)}); check timestamps / --max-dt")
        return 1
    rmse, aligned = ate_rmse(pos_e[ia], pos_g[ib], with_scale=args.scale)
    err = np.linalg.norm(aligned - pos_g[ib], axis=1)
    print(f"associations: {len(ia)}")
    print(f"ate_rmse_m:   {rmse:.6f}")
    print(f"ate_mean_m:   {err.mean():.6f}")
    print(f"ate_median_m: {np.median(err):.6f}")
    print(f"ate_max_m:    {err.max():.6f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
