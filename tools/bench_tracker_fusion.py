"""Interleaved warm-cache A/B of the fused single-launch bidirectional KLT
pass vs the per-level composition (both Pallas, both compiled).

The 50 passes are CHAINED INSIDE one jitted lax.scan (each iteration's input
positions depend on the previous output) so one host dispatch measures pure
device time — per-call host dispatch through the tunnel is 60-90 ms RTT and
would swamp the kernel. Usage: python tools/bench_tracker_fusion.py"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsvio_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
from rsvio_tpu.utils.precision import ensure_matmul_precision
ensure_matmul_precision()

import cv2  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from rsvio_tpu.ops import klt, pyramid  # noqa: E402

H, W, N, LEVELS, CHAIN = 480, 752, 256, 6, 50


def composed(p0, p1, pts, alive, cfg):
    eye = jnp.broadcast_to(jnp.eye(2, dtype=pts.dtype), (N, 2, 2))
    pos_fwd, A_fwd, ok_fwd = klt.track_points(p0, p1, pts, pts, eye, alive,
                                              cfg)
    A_inv = jnp.swapaxes(A_fwd, -1, -2)
    pos_back, _, ok_back = klt.track_points(p1, p0, pos_fwd, pts, A_inv,
                                            ok_fwd, cfg)
    dist_sq = jnp.sum((pos_back - pts) ** 2, axis=1)
    return pos_fwd, ok_fwd & ok_back & (dist_sq < cfg.bidir_threshold_sq)


def main():
    rng = np.random.default_rng(0)
    base = cv2.resize(rng.uniform(0, 255, (120, 188)).astype(np.float32),
                      (W, H), interpolation=cv2.INTER_CUBIC)
    img0 = cv2.GaussianBlur(base, (5, 5), 1.0)
    M = np.float32([[1, 0, 1.3], [0, 1, -0.9]])
    img1 = cv2.warpAffine(img0, M, (W, H), flags=cv2.INTER_LINEAR,
                          borderMode=cv2.BORDER_REFLECT)
    p0 = pyramid.build_pyramid(jnp.asarray(img0), LEVELS)
    p1 = pyramid.build_pyramid(jnp.asarray(img1), LEVELS)
    pts0 = jnp.asarray(rng.uniform([20, 20], [W - 20, H - 20],
                                   size=(N, 2)).astype(np.float32))
    alive = jnp.ones(N, dtype=bool)
    cfg = klt.KLTConfig(levels=LEVELS, backend="pallas")

    def chain(fn):
        @jax.jit
        def run():
            def body(pts, _):
                pos, ok = fn(pts)
                # serialize iterations without changing the work: next input
                # = original positions + a 0-weighted dependency on pos
                nxt = pts0 + 1e-30 * pos
                return nxt, ok
            _, oks = jax.lax.scan(body, pts0, None, length=CHAIN)
            return oks
        return run

    fused = chain(lambda pts: (
        lambda r: (r[0], r[2]))(klt.track_points_bidirectional(
            p0, p1, pts, alive, cfg)))
    comp = chain(lambda pts: composed(p0, p1, pts, alive, cfg))

    jax.block_until_ready(fused())
    jax.block_until_ready(comp())

    results = {}
    for _ in range(4):  # interleave epochs
        for name, fn in (("fused", fused), ("composed", comp)):
            t0 = time.time()
            out = fn()
            jax.block_until_ready(out)
            dt = (time.time() - t0) / CHAIN * 1e3
            results.setdefault(name, []).append(dt)
    for name, ts in results.items():
        print(f"{name:9s}: best {min(ts):.3f} ms/pass  "
              f"all {[f'{t:.3f}' for t in ts]}")
    print(f"survivors fused={int(np.asarray(fused()).sum(axis=1)[0])} "
          f"composed={int(np.asarray(comp()).sum(axis=1)[0])}")


if __name__ == "__main__":
    main()
