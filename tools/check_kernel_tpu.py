"""On-device correctness probe for the Pallas KLT kernel paths (run on the
real TPU; compares compiled results against known ground truth and against
the single-camera path). Usage: python tools/check_kernel_tpu.py"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsvio_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
from rsvio_tpu.utils.precision import ensure_matmul_precision
ensure_matmul_precision()

import cv2  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from rsvio_tpu.ops.pallas import klt_kernel as K  # noqa: E402


def textured(H=96, W=144, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (H // 4, W // 4)).astype(np.float32)
    img = cv2.resize(base, (W, H), interpolation=cv2.INTER_CUBIC)
    return cv2.GaussianBlur(img, (5, 5), 1.0).astype(np.float32)


def shift(img, dx, dy):
    M = np.float32([[1, 0, dx], [0, 1, dy]])
    return cv2.warpAffine(img, M, (img.shape[1], img.shape[0]),
                          flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT)


def main():
    rng = np.random.default_rng(5)
    img0 = textured(seed=11)
    img1 = textured(seed=12)
    dst0 = shift(img0, 2.0, -1.0)
    dst1 = shift(img1, -1.5, 0.5)
    pts0 = rng.uniform([15, 15], [128, 80], size=(8, 2)).astype(np.float32)
    pts1 = rng.uniform([15, 15], [128, 80], size=(8, 2)).astype(np.float32)
    failures = 0

    def tr(img_src, img_dst, pts):
        n = pts.shape[0]
        alive = jnp.ones(n, dtype=bool)
        pos, ok = K.track_level_translation(
            jnp.asarray(img_src), jnp.asarray(img_dst), jnp.asarray(pts),
            jnp.asarray(pts), alive, 15, 1e-5, False)
        return np.asarray(pos), np.asarray(ok)

    # 1. single-camera compiled: known shifts recovered
    pos_a, ok_a = tr(img0, dst0, pts0)
    pos_b, ok_b = tr(img1, dst1, pts1)
    err_a = np.abs(pos_a[ok_a] - (pts0[ok_a] + [2.0, -1.0])).max()
    err_b = np.abs(pos_b[ok_b] - (pts1[ok_b] + [-1.5, 0.5])).max()
    print(f"single-cam: ok={ok_a.sum()}/{ok_b.sum()} err={err_a:.4f}/{err_b:.4f}")
    if not (ok_a.sum() >= 6 and ok_b.sum() >= 6 and max(err_a, err_b) < 0.5):
        print("FAIL: single-camera baseline broken")
        failures += 1

    # 2. camera-batched compiled vs single-camera compiled
    src = jnp.stack([jnp.asarray(img0), jnp.asarray(img1)])
    dst = jnp.stack([jnp.asarray(dst0), jnp.asarray(dst1)])
    pts = jnp.concatenate([jnp.asarray(pts0), jnp.asarray(pts1)])
    cam = jnp.concatenate([jnp.zeros(8, jnp.int32), jnp.ones(8, jnp.int32)])
    alive = jnp.ones(16, dtype=bool)
    pos, _, ok = K.track_level(src, dst, pts, pts,
                               jnp.zeros(16, jnp.float32), alive,
                               15, 1e-5, with_rotation=False,
                               interpret=False, cam=cam)
    pos, ok = np.asarray(pos), np.asarray(ok)
    ok_ref = np.concatenate([ok_a, ok_b])
    pos_ref = np.concatenate([pos_a, pos_b])
    ok_match = (ok == ok_ref).all()
    pos_err = np.abs(pos[ok_ref & ok] - pos_ref[ok_ref & ok]).max() if (ok_ref & ok).any() else np.inf
    print(f"cam-batched vs single: ok_match={ok_match} pos_err={pos_err:.2e}")
    if not (ok_match and pos_err < 1e-5):
        print("FAIL: camera-batched path diverges on device")
        failures += 1

    # 3. fused bidirectional vs composed per-level (both compiled)
    from rsvio_tpu.ops import klt as klt_mod
    from rsvio_tpu.ops import pyramid
    cfg = klt_mod.KLTConfig(max_iterations=15, convergence_threshold=0.005,
                            levels=3, backend="pallas")
    p0 = pyramid.build_pyramid(jnp.asarray(img0), 3)
    d0 = pyramid.build_pyramid(jnp.asarray(shift(img0, 2.5, -1.5)), 3)
    ptsj = jnp.asarray(pts0)
    alive8 = jnp.ones(8, dtype=bool)
    eye = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), (8, 2, 2))
    pos_fwd, A_fwd, ok_fwd = klt_mod.track_points(p0, d0, ptsj, ptsj, eye,
                                                  alive8, cfg)
    A_inv = jnp.swapaxes(A_fwd, -1, -2)
    pos_back, _, ok_back = klt_mod.track_points(d0, p0, pos_fwd, ptsj, A_inv,
                                                ok_fwd, cfg)
    dist_sq = jnp.sum((pos_back - ptsj) ** 2, axis=1)
    ok_comp = np.asarray(ok_fwd & ok_back & (dist_sq < cfg.bidir_threshold_sq))
    pos_f, _, ok_f = klt_mod.track_points_bidirectional(p0, d0, ptsj, alive8,
                                                        cfg)
    pos_f, ok_f = np.asarray(pos_f), np.asarray(ok_f)
    both = ok_comp & ok_f
    perr = np.abs(pos_f[both] - np.asarray(pos_fwd)[both]).max() if both.any() else np.inf
    print(f"fused vs composed: ok_match={(ok_f == ok_comp).all()} "
          f"pos_err={perr:.2e} n_ok={ok_f.sum()}")
    if not ((ok_f == ok_comp).all() and perr < 1e-5):
        print("FAIL: fused bidirectional diverges on device")
        failures += 1

    # 4. static variants compiled on device: SSD residual, fixed-lambda
    # damping, and the exact rotated-sampling SE2 mode (all were XLA-only
    # fallbacks in round 1 — each must COMPILE via Mosaic and track).
    img = textured(H=128, W=192, seed=21)
    ptsv = rng.uniform([25, 25], [165, 100], size=(12, 2)).astype(np.float32)
    alv = jnp.ones(12, dtype=bool)
    th0 = jnp.zeros(12, jnp.float32)

    def run_variant(name, img_dst, gt_flow=None, gt_pos=None, gt_th=None,
                    **kw):
        nonlocal failures
        pos, th, ok = K.track_level(
            jnp.asarray(img), jnp.asarray(img_dst), jnp.asarray(ptsv),
            jnp.asarray(ptsv), th0, alv, 30, 1e-6, interpret=False, **kw)
        pos, th, ok = np.asarray(pos), np.asarray(th), np.asarray(ok)
        if gt_pos is None:
            gt_pos = ptsv + gt_flow
        err = (np.linalg.norm((pos - gt_pos)[ok], axis=1)
               if ok.any() else np.array([np.inf]))
        th_err = (float(np.median(np.abs(th[ok] - gt_th)))
                  if (gt_th is not None and ok.any()) else 0.0)
        print(f"{name}: ok={ok.sum()}/{len(ptsv)} "
              f"med_err={np.median(err):.3f} med_th_err={th_err:.4f}")
        if not (ok.sum() >= 8 and np.median(err) < 0.3 and th_err < 0.03):
            print(f"FAIL: variant {name} broken on device")
            failures += 1

    run_variant("ssd", shift(img, 1.5, -1.0), gt_flow=[1.5, -1.0],
                residual_mode="ssd")
    run_variant("lm", shift(img, -1.0, 2.0), gt_flow=[-1.0, 2.0],
                lm_lambda=1.0)
    # Single-LEVEL tracking initializes at the un-rotated positions, so keep
    # features within ~30 px of the rotation center (displacement < 7 px,
    # within single-level capture range — the pipeline proper is always
    # coarse-to-fine). This still exercises the exact rotated sampling: 12
    # deg is far beyond the old first-order warp's accuracy.
    deg = 12.0
    a = np.deg2rad(deg)
    cx, cy = 96.0, 64.0
    ptsv = rng.uniform([cx - 35, cy - 28], [cx + 35, cy + 28],
                       size=(12, 2)).astype(np.float32)
    M = cv2.getRotationMatrix2D((cx, cy), deg, 1.0)
    img_rot = cv2.warpAffine(img, M, (img.shape[1], img.shape[0]),
                             flags=cv2.INTER_LINEAR,
                             borderMode=cv2.BORDER_REFLECT)
    Rm = np.array([[np.cos(a), np.sin(a)], [-np.sin(a), np.cos(a)]],
                  np.float32)
    gt_rot = (ptsv - [cx, cy]) @ Rm.T + [cx, cy]
    run_variant("se2_exact_12deg", img_rot, gt_pos=gt_rot, gt_th=-a,
                with_rotation=True)
    run_variant("ssd+lm+rot", shift(img, 1.0, 1.0), gt_flow=[1.0, 1.0],
                gt_th=0.0, residual_mode="ssd", lm_lambda=0.5,
                with_rotation=True)

    print("RESULT:", "PASS" if failures == 0 else f"FAIL ({failures})")
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
