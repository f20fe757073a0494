"""Shape-targeted device probe: compiled vs interpret-mode results of the
3-D (C, Hp, Wp) slab-DMA path at the e2e pyramid shapes (240x320, 4 levels).
Localizes Mosaic miscompiles that small power-of-two probes miss."""

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


def textured(H, W, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (max(H // 4, 8), max(W // 4, 8))).astype(np.float32)
    img = cv2.resize(base, (W, H), interpolation=cv2.INTER_CUBIC)
    return cv2.GaussianBlur(img, (5, 5), 1.0).astype(np.float32)


def shift(img, dx, dy):
    M = np.float32([[1, 0, dx], [0, 1, dy]])
    return cv2.warpAffine(img, M, (img.shape[1], img.shape[0]),
                          flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT)


def probe(H, W, n=128, cams=1, seed=0):
    rng = np.random.default_rng(seed)
    imgs = [textured(H, W, seed=seed + c) for c in range(cams)]
    dsts = [shift(im, 1.5, -1.0) for im in imgs]
    pts = rng.uniform([12, 12], [W - 12, H - 12], size=(n, 2)).astype(np.float32)
    cam = jnp.asarray(rng.integers(0, cams, size=n).astype(np.int32))
    alive = jnp.ones(n, dtype=bool)
    src = jnp.stack([jnp.asarray(im) for im in imgs])
    dst = jnp.stack([jnp.asarray(im) for im in dsts])
    th = jnp.zeros(n, jnp.float32)
    outs = {}
    for interp in (True, False):
        pos, _, ok = K.track_level(src, dst, jnp.asarray(pts),
                                   jnp.asarray(pts), th, alive,
                                   12, 1e-5, with_rotation=False,
                                   interpret=interp, cam=cam)
        outs[interp] = (np.asarray(pos), np.asarray(ok))
    pos_i, ok_i = outs[True]
    pos_c, ok_c = outs[False]
    ok_match = (ok_i == ok_c).all()
    both = ok_i & ok_c
    perr = np.abs(pos_i[both] - pos_c[both]).max() if both.any() else 0.0
    flow_ok = np.abs(pos_c[ok_c] - (pts[ok_c] + [1.5, -1.0])).max() if ok_c.any() else np.inf
    print(f"H={H:4d} W={W:4d} cams={cams}: ok_i={ok_i.sum():3d} ok_c={ok_c.sum():3d} "
          f"match={ok_match} pos_err={perr:.2e} flow_err={flow_ok:.3f}")
    # Gate BOTH on compiled-vs-interpret agreement and on absolute flow
    # accuracy vs the known shift — agreement alone would pass a bug traced
    # identically into both modes.
    return ok_match and perr < 1e-5 and ok_c.sum() > 0 and flow_ok < 0.5


def main():
    ok = True
    # e2e pyramid level shapes (240x320, /2 levels)
    for (h, w) in [(240, 320), (120, 160), (60, 80), (30, 40)]:
        ok &= probe(h, w, cams=1, seed=h)
        ok &= probe(h, w, cams=2, seed=h + 1)
    # the earlier probe's shape (sanity)
    ok &= probe(96, 144, cams=2, seed=3)
    print("RESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
