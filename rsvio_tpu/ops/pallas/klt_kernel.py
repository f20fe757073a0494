"""Pallas TPU kernel for batched inverse-compositional KLT at one pyramid
level — the front-end hot loop (SURVEY.md §3.5 hot-loop ranking #1).

Why a kernel: the XLA path samples patches with vmapped arbitrary-index
gathers (features x pattern points x 4 taps x ~20 GN iterations x levels x
passes per frame), and TPU lowers arbitrary gathers to slow scalar loops —
measured 186 ms per bidirectional pass at 256 features. This kernel removes
gathers entirely:

  * Level images stay in HBM or VMEM (coarse levels pinned on-chip). Per
    feature, ONE aligned slab DMA (32x256 — 8/128-aligned starts as the
    tiled layout requires) plus two dynamic rolls (tpu dynamic_rotate)
    materializes an arbitrary-position 20x20 window into VMEM scratch
    (16x16 pattern + bilinear taps + a ring for central-difference
    gradients).
  * Windows are re-extracted EVERY GN iteration at the current positions, so
    sampling needs no dynamic in-register slicing (unaligned value slices
    lower to catastrophic scalar relayouts — measured ~1000x slower than the
    DMA path).
  * The dense 16x16 unit-spacing pattern (footprint +-8 px, same support
    class as the reference's scaled 52-point pattern) makes every bilinear
    tap a unit-stride static view of the window, so sampling, mean
    normalization, Jacobians and the GN update are dense vectorized VPU math
    over the whole (BLOCK, 16, 16) feature batch.
  * All GN iterations for all features run inside one pallas_call per level.

Mosaic restrictions found empirically and worked around here:
  - no stride-2 vector slices, no 1-D->3-D reshapes (use broadcast_to),
  - multi-axis reductions crash the compiler (use two single-axis sums),
  - bool vectors cannot be loop carries (carry 0/1 floats),
  - 1-D blocked operands get conflicting XLA/Mosaic layouts (use (N,1)),
  - DMA slices need 8-aligned row starts/sizes and 128-aligned col starts
    (hence aligned slab + dynamic roll),
  - compiled dynamic rolls are only correct on power-of-two axis sizes,
  - while_loops with vector carries and pl.when around ref-mutating regions
    fail to compile ("Offset change") — the GN loop is a fori_loop with
    float-mask carries.

Measured on a v5e chip inside the fully-jitted estimator step: the whole
frame (3 bidirectional tracking passes + detection + PnP + BA at 752x480,
W=10, ~160 live tracks) sustains ~6600 fps vs ~2 fps with the XLA gather
path; one fused bidirectional pass is ~0.05 ms pipelined.

The kernel tracks translation (2-dof) or translation + in-plane rotation
(3-dof SE2) selected by a static flag. Rotation sampling is EXACT bilinear
at the rotated pattern positions (parity with the reference's full SE2 warp,
ref src/feature_tracker/feature_tracker.rs:292-342 + patch.rs:75-123) and
still needs NO gathers: the rotated position of pattern point u is
u + d(u) with d = (R(th)-I)u bounded by ~3.94 px at the |th| <= 0.346 rad
step gate, so bilinear sampling decomposes into a sum over STATIC window
shifts k in [-4, 5]^2 weighted by hat(d + frac - k) — dense vectorized
multiply-adds over the whole feature batch, numerically identical to true
bilinear sampling at the rotated coordinates. Rotation mode uses a 25x25
window (vs 20x20) which still fits the 32-row DMA slab.

The kernel also implements the SSD residual (no mean normalization; the
experimental crate's alternative residual, ref feature_tracker/src/patch.rs:57-105)
and fixed-lambda Levenberg damping of the precomputed IC system
(ref patch.rs:239-255) as static variants, so EVERY tracker configuration
runs on the kernel — nothing silently falls back to the slow XLA gather
path on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 64           # features per grid step (VMEM-bounded)
WIN = 20             # translation-mode window edge: 16x16 pattern + bilinear
                     # taps + a 1-px ring for central-difference gradients
WIN_ROT = 25         # rotation-mode window edge: adds the +-4(+1) px rotated-
                     # sampling shift range (see ROT_K); 7 + 25 = 32 still
                     # fits the slab row count
PATCH = 16           # dense PATCH x PATCH pattern, unit spacing, +-8 px
ROT_K = 4            # max |integer shift| of rotated sampling: displacement
                     # d = (R(th)-I)u is <= 2*sin(0.35/2)*|u|max = 3.94 px at
                     # the theta step gate, so floor(d+frac) in [-4, 4] and
                     # the +1 bilinear neighbor reaches shift +5
SLAB_R = 32          # DMA slab rows: power of two (compiled dynamic sublane
                     # rolls are only correct for power-of-two row counts);
                     # covers row offset <= 7 + 25-row window (32 <= 32)
SLAB_C = 256         # DMA slab cols (two 128-lane tiles for column roll)
ROW_PAD = 16         # top edge-padding: windows may overhang the image top
                     # (window base is floor(pos) - center, center <= 12)
COL_PAD = 128        # left edge-padding (aligned): windows may overhang left
MARGIN = 2.0         # center-validity margin in px (ref feature_tracker.rs:389)
_MIN_GRAD_ENERGY = 1e-4
_MIN_MEAN = 1e-3
# SSD intensities are ~255x the mean-normalized ones (8-bit image scale), so
# the degenerate-patch gradient-energy floor scales accordingly (mirrors
# ops.klt.build_patch).
_MIN_GRAD_ENERGY_SSD = 1e-4 * 255.0 ** 2


def _win_geom(with_rotation: bool):
    """(window edge, window center index, pattern base index) per mode.

    Pattern offsets o in [-8, 7] sample at window index o + center; the
    pattern base is center - 8. Translation mode: center 9, taps [1, 17],
    gradient ring at 0/18 within a 20-edge window. Rotation mode: center 12,
    taps [4, 20] plus rotated-sampling shifts +-4/+5 -> indices [0, 24]
    within a 25-edge window."""
    return (WIN_ROT, 12, 4) if with_rotation else (WIN, 9, 1)


def _views(win, b: int = 1):
    """4 bilinear-tap views of windows (B, E, E) -> 4 x (B, 16, 16).

    Pattern offsets o in [-8, 7] relative to the sampling base at window
    center c -> tap indices o+c in [b, b+15] (b = c-8 the pattern base), +1
    neighbors in [b+1, b+16] — plain unit-stride static slices (the 1-px ring
    at b-1/b+17 exists for the central-difference gradient views below).
    """
    v00 = win[:, b:b + PATCH, b:b + PATCH]
    v01 = win[:, b:b + PATCH, b + 1:b + PATCH + 1]
    v10 = win[:, b + 1:b + PATCH + 1, b:b + PATCH]
    v11 = win[:, b + 1:b + PATCH + 1, b + 1:b + PATCH + 1]
    return v00, v01, v10, v11


def _grad_views(win, fx, fy, b: int = 1):
    """Bilinearly-interpolated central-difference gradient at each pattern
    point — the reference's image_grad semantics (ref image_utilities.rs:5-66)
    and what the XLA path samples (interp.bilinear_with_grad).

    The gradient grid g[j,i] = (win[j,i+1] - win[j,i-1])/2 is formed at the 4
    bilinear corners (tap indices [b, b+15] and their +1 neighbors) and lerped
    with the same (fx, fy). This replaces the earlier derivative-of-the-
    bilinear-interpolant form, which is piecewise-constant inside each pixel
    cell and measurably destabilizes Gauss-Newton on smooth scenes (the same
    failure documented and reverted in the XLA path; on a smooth synthetic
    plane ~20% of corner tracks diverged through the bidirectional gate).
    """
    P = PATCH

    def sl(dy, dx):
        return win[:, b + dy:b + dy + P, b + dx:b + dx + P]

    # d/dx grids at the 4 corners
    gx00 = sl(0, 1) - sl(0, -1)
    gx01 = sl(0, 2) - sl(0, 0)
    gx10 = sl(1, 1) - sl(1, -1)
    gx11 = sl(1, 2) - sl(1, 0)
    # d/dy grids
    gy00 = sl(1, 0) - sl(-1, 0)
    gy01 = sl(1, 1) - sl(-1, 1)
    gy10 = sl(2, 0) - sl(0, 0)
    gy11 = sl(2, 1) - sl(0, 1)
    gx = _lerp(gx00, gx01, gx10, gx11, fx, fy) * 0.5
    gy = _lerp(gy00, gy01, gy10, gy11, fx, fy) * 0.5
    return gx, gy


def _rot_sample(win, disp_x, disp_y, b: int):
    """Exact bilinear sampling of each pattern point at its rotated position
    via STATIC window shifts (no gathers).

    The sample position of pattern point u is (window coords) u + c +
    disp(u), where disp = (R(th)-I)u + frac is bounded by |d| <= 3.94 + 1 at
    the theta gate. Bilinear interpolation is val(u) = sum_k hat(disp - k) *
    win[u + c + k] over integer shifts k — with disp in (-4, 4.94) only
    k in [-ROT_K, ROT_K+1] contribute, each a static 2-D slice of the window
    weighted by dense hat masks. Numerically identical to true bilinear
    sampling at the rotated coordinates.

    Args: win (B, E, E); disp_x/disp_y (B, 16, 16) displacement incl. the
    fractional part of the center position; b static pattern base.
    Returns (B, 16, 16) sampled values.
    """
    P = PATCH
    wxs = [jnp.maximum(0.0, 1.0 - jnp.abs(disp_x - kx))
           for kx in range(-ROT_K, ROT_K + 2)]
    val = None
    for ky in range(-ROT_K, ROT_K + 2):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(disp_y - ky))
        row = None
        for j, kx in enumerate(range(-ROT_K, ROT_K + 2)):
            term = wxs[j] * win[:, b + ky:b + ky + P, b + kx:b + kx + P]
            row = term if row is None else row + term
        val = wy * row if val is None else val + wy * row
    return val


def _lerp(v00, v01, v10, v11, fx, fy):
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def _b3(v, shape):
    """Broadcast a (B,) vector to 3-D (Mosaic rejects bare 1-D->3-D
    reshapes; broadcast_to of v[:, None, None] lowers cleanly)."""
    return jnp.broadcast_to(v[:, None, None], shape)


def _sum12(x):
    """Sum over the last two dims via two single-axis reductions (multi-axis
    reductions crash the Mosaic compiler)."""
    return jnp.sum(jnp.sum(x, axis=2), axis=1)


def _extract_windows(img_ref, pos_ref, cam_ref, win_ref, slab_ref, sem,
                     center: int = 9):
    """win_ref[i] <- E x E window of the PADDED image at base
    (floor(pos_i) - center), for all i, via aligned slab DMA + dynamic rolls.

    img_ref is a (C, Hp, Wp) stack of same-shape padded images (C=1 for the
    single-camera case); cam_ref[i] selects which image feature i samples —
    this is what lets one pallas_call track features of BOTH cameras of a
    stereo rig (the DMA base simply gains a leading index; everything
    downstream is per-feature vector math that never looks at the image).

    Positions are in true-image coordinates; the image was padded by
    (ROW_PAD, COL_PAD) at the top/left (edge values), so windows may overhang
    the true image and sample replicated border pixels — validity by center
    margin is the caller's (vectorized) concern. Bases are clamped so the
    slab load always stays inside the padded image (garbage positions in
    dead slots produce garbage windows that the masks discard)."""
    _, Hp, Wp = img_ref.shape
    # Largest bases whose ALIGNED slab start keeps the slab in bounds.
    max_bx = 128 * ((Wp - SLAB_C) // 128) + 127
    max_by = 8 * ((Hp - SLAB_R) // 8) + 7

    B = win_ref.shape[0]
    E = win_ref.shape[1]  # window edge (WIN or WIN_ROT)

    def bases(i):
        bx = jnp.clip(
            jnp.floor(pos_ref[i, 0]).astype(jnp.int32) - center + COL_PAD,
            0, max_bx)
        by = jnp.clip(
            jnp.floor(pos_ref[i, 1]).astype(jnp.int32) - center + ROW_PAD,
            0, max_by)
        return bx, by

    def body(i, _):
        bx, by = bases(i)
        by8 = pl.multiple_of((by // 8) * 8, 8)
        ca = pl.multiple_of((bx // 128) * 128, 128)
        c = pltpu.make_async_copy(
            img_ref.at[cam_ref[i, 0], pl.ds(by8, SLAB_R), pl.ds(ca, SLAB_C)],
            slab_ref.at[0], sem)
        c.start()
        c.wait()
        # Lane roll first, crop to one 128-lane tile, then sublane roll:
        # compiled dynamic sublane rolls are only correct on power-of-two
        # rows, and lane rolls on power-of-two lane counts. (A double-
        # buffered DMA pipeline was measured SLOWER than this serialized
        # form — the descriptor bookkeeping costs more than the latency it
        # hides.)
        r1 = pltpu.roll(slab_ref[0], -(bx - ca), 1)[:, :128]
        rolled = pltpu.roll(r1, -(by - by8), 0)
        win_ref[i] = rolled[:E, :E]
        return 0

    jax.lax.fori_loop(0, B, body, 0)


_MAX_THETA_SQ = 0.12  # |theta| step gate ~19.9 deg: the rotated-sampling
                      # shift range (ROT_K, WIN_ROT) supports exact sampling
                      # up to 0.35 rad; steps beyond the gate are rejected


def _level_pass(max_iterations: int, conv_thresh_sq: float,
                true_h: int, true_w: int, with_rotation: bool,
                residual_mode: str, lm_lambda: float,
                img_src_ref, img_dst_ref, cam_ref,
                pos_template, pos_init, theta0, alive_f,
                win_ref, slab_ref, posbuf_ref, statebuf_ref, sem):
    """Template construction + GN iterations for one feature block at ONE
    pyramid level, expressed over VALUES for positions/masks so callers can
    chain it (per-level pallas_call via _klt_level_kernel, or all levels and
    both bidirectional directions fused in _klt_bidir_kernel).

    Args (values, all in LEVEL coordinates):
      pos_template: (B, 2) template centers (sampled in img_src).
      pos_init: (B, 2) initial target positions (GN runs in img_dst).
      theta0: (B,) initial in-plane rotation.
      alive_f: (B,) 0/1 float mask.
    Returns (pos_out (B,2), theta_out (B,), ok_f (B,) 0/1 float).

    Static variants:
      with_rotation: False -> 2-dof translation GN; True -> 3-dof SE2 GN
        with EXACT bilinear sampling at rotated pattern positions
        (_rot_sample; see module docstring).
      residual_mode: "lssd" mean-normalizes template/target intensities
        (brightness invariance, the main tracker's Pattern52 behavior);
        "ssd" uses raw intensities (ref feature_tracker/src/patch.rs:57-105).
      lm_lambda: fixed Levenberg damping added to the precomputed IC-GN
        Hessian diagonal (ref patch.rs:239-255); 0 = pure Gauss-Newton.

    Scratch:
      win_ref: (BLOCK, E, E), E per _win_geom — window buffer (source, then
        per-iter dst)
      slab_ref: (1, SLAB_R, SLAB_C) — DMA staging
      posbuf_ref: (BLOCK, 2) — current target positions
      statebuf_ref: (BLOCK, 3) — [active, ok, theta] per-feature GN state
        (refs instead of loop carries: scalar-only while_loop carries)
    """
    eps = 1e-12
    B = BLOCK
    P3 = (B, PATCH, PATCH)
    _, center, base = _win_geom(with_rotation)
    ssd = residual_mode == "ssd"
    if with_rotation:
        # Pattern offsets relative to the rotation center (the tracked
        # point): window index k samples continuous offset k-8 (+frac).
        # Mosaic's tpu.iota only produces integers — cast to float after.
        xc = jax.lax.broadcasted_iota(jnp.int32, P3, 2).astype(jnp.float32) - 8.0
        yc = jax.lax.broadcasted_iota(jnp.int32, P3, 1).astype(jnp.float32) - 8.0

    # ---- template construction (source image) ----
    posbuf_ref[:] = pos_template
    _extract_windows(img_src_ref, posbuf_ref, cam_ref, win_ref, slab_ref,
                     sem, center)
    ps = pos_template
    # Center-margin validity (patch tails may sample replicated border
    # pixels thanks to the edge padding — matches the reference's margin-2
    # in-bound semantics rather than requiring the full patch inside).
    src_ok = ((ps[:, 0] >= MARGIN) & (ps[:, 1] >= MARGIN)
              & (ps[:, 0] <= true_w - 1 - MARGIN)
              & (ps[:, 1] <= true_h - 1 - MARGIN))
    fx = _b3(ps[:, 0] - jnp.floor(ps[:, 0]), P3)
    fy = _b3(ps[:, 1] - jnp.floor(ps[:, 1]), P3)

    win = win_ref[:]
    v00, v01, v10, v11 = _views(win, base)
    val = _lerp(v00, v01, v10, v11, fx, fy)
    # Bilinearly-interpolated central-difference gradient (the reference's
    # image_grad form; see _grad_views for why not the derivative of the
    # bilinear interpolant).
    gx, gy = _grad_views(win, fx, fy, base)

    npts = float(PATCH * PATCH)
    mean = _sum12(val) / npts
    mean_s = jnp.maximum(mean, _MIN_MEAN)
    mean3 = _b3(mean_s, P3)
    if ssd:
        # Raw-intensity residual: no normalization, raw gradient Jacobians.
        data = val
        jx, jy = gx, gy
    else:
        data = val / mean3
        # Normalization-corrected Jacobian rows (ref patch.rs:75-123):
        # Jn_i = (g_i - data_i * mean(g)) / mean
        mgx = _b3(_sum12(gx) / npts, P3)
        mgy = _b3(_sum12(gy) / npts, P3)
        jx = (gx - data * mgx) / mean3
        jy = (gy - data * mgy) / mean3

    hxx = _sum12(jx * jx)
    hxy = _sum12(jx * jy)
    hyy = _sum12(jy * jy)
    energy = hxx + hyy
    energy_floor = _MIN_GRAD_ENERGY_SSD if ssd else _MIN_GRAD_ENERGY
    tmpl = data
    if with_rotation:
        # Rotation Jacobian row: grad I . perp(u), perp(u) = (-u_y, u_x),
        # mean-normalization-corrected like jx/jy in lssd mode.
        gt = gy * xc - gx * yc
        if ssd:
            jt = gt
        else:
            mgt = _b3(_sum12(gt) / npts, P3)
            jt = (gt - data * mgt) / mean3
        hxt = _sum12(jx * jt)
        hyt = _sum12(jy * jt)
        htt = _sum12(jt * jt)
        # Fixed Levenberg damping on the diagonal (after which the adjugate
        # inverse below inverts H + lambda*I, ref patch.rs:239-255).
        hxx_d = hxx + lm_lambda
        hyy_d = hyy + lm_lambda
        htt_d = htt + lm_lambda
        # Adjugate 3x3 inverse of H=[[hxx,hxy,hxt],[hxy,hyy,hyt],[hxt,hyt,htt]]
        c00 = hyy_d * htt_d - hyt * hyt
        c01 = hxt * hyt - hxy * htt_d
        c02 = hxy * hyt - hxt * hyy_d
        c11 = hxx_d * htt_d - hxt * hxt
        c12 = hxy * hxt - hxx_d * hyt
        c22 = hxx_d * hyy_d - hxy * hxy
        det = hxx_d * c00 + hxy * c01 + hxt * c02
        det_s = jnp.where(jnp.abs(det) > eps, det, 1.0)
        hjx = (_b3(c00 / det_s, P3) * jx + _b3(c01 / det_s, P3) * jy
               + _b3(c02 / det_s, P3) * jt)
        hjy = (_b3(c01 / det_s, P3) * jx + _b3(c11 / det_s, P3) * jy
               + _b3(c12 / det_s, P3) * jt)
        hjt = (_b3(c02 / det_s, P3) * jx + _b3(c12 / det_s, P3) * jy
               + _b3(c22 / det_s, P3) * jt)
    else:
        hxx_d = hxx + lm_lambda
        hyy_d = hyy + lm_lambda
        det = hxx_d * hyy_d - hxy * hxy
        det_s = jnp.where(jnp.abs(det) > eps, det, 1.0)
        hjx = _b3(hyy_d / det_s, P3) * jx + _b3(-hxy / det_s, P3) * jy
        hjy = _b3(-hxy / det_s, P3) * jx + _b3(hxx_d / det_s, P3) * jy

    patch_ok = (src_ok & (ssd | (mean > _MIN_MEAN))
                & (energy > energy_floor) & (jnp.abs(det) > eps))

    # ---- GN iterations (target image; windows re-extracted per iteration,
    # which the DMA engine does far faster than any in-register shuffling) --
    posbuf_ref[:] = pos_init
    # TRUE early exit: a while_loop with SCALAR carries (iteration count +
    # active-feature count); the per-feature masks/angle live in a VMEM
    # scratch ref instead of the carry (vector carries hit Mosaic's "Offset
    # change", and bool carries fail to legalize — 0/1 floats in scratch).
    # Once every feature converges the loop STOPS, skipping the remaining
    # iterations' per-feature window DMAs — the dominant per-iteration cost
    # (measured 2.2x faster than the fixed-trip fori_loop at 256 features /
    # 20 max iterations on v5e; bit-identical outputs).
    alive0 = ((alive_f > 0) & patch_ok).astype(jnp.float32)
    okf0 = patch_ok.astype(jnp.float32)
    statebuf_ref[:, 0] = alive0
    statebuf_ref[:, 1] = okf0
    statebuf_ref[:, 2] = theta0

    def gn_cond(carry):
        it, n_active = carry
        return (it < max_iterations) & (n_active > 0.0)

    def gn_body(carry):
        it, _n_active = carry
        active = statebuf_ref[:, 0]
        okf = statebuf_ref[:, 1]
        th = statebuf_ref[:, 2]
        _extract_windows(img_dst_ref, posbuf_ref, cam_ref, win_ref, slab_ref,
                         sem, center)
        p = posbuf_ref[:]
        in_img = ((p[:, 0] >= MARGIN) & (p[:, 1] >= MARGIN)
                  & (p[:, 0] <= true_w - 1 - MARGIN)
                  & (p[:, 1] <= true_h - 1 - MARGIN))
        fxs = p[:, 0] - jnp.floor(p[:, 0])
        fys = p[:, 1] - jnp.floor(p[:, 1])
        if with_rotation:
            # EXACT bilinear sample at the rotated pattern positions
            # p + R(th)u: window-coordinate displacement from the integer
            # pattern tap is (R(th)-I)u + frac, bounded by the theta gate —
            # see _rot_sample.
            c = jnp.cos(th)
            s = jnp.sin(th)
            c3 = _b3(c, P3)
            s3 = _b3(s, P3)
            disp_x = (c3 - 1.0) * xc - s3 * yc + _b3(fxs, P3)
            disp_y = s3 * xc + (c3 - 1.0) * yc + _b3(fys, P3)
            val = _rot_sample(win_ref[:], disp_x, disp_y, base)
        else:
            fx = _b3(fxs, P3)
            fy = _b3(fys, P3)
            v00, v01, v10, v11 = _views(win_ref[:], base)
            val = _lerp(v00, v01, v10, v11, fx, fy)
        if ssd:
            r = val - tmpl
        else:
            mean = jnp.maximum(_sum12(val) / npts, _MIN_MEAN)
            r = val / _b3(mean, P3) - tmpl
        inc_x = -_sum12(hjx * r)
        inc_y = -_sum12(hjy * r)
        if with_rotation:
            inc_t = -_sum12(hjt * r)
            th_new = th + inc_t
            # Compose W <- W o exp(inc): the translation increment is rotated
            # into the current warp frame (exact rotation; V(dth) ~ I for the
            # small per-iteration angle step).
            ix = c * inc_x - s * inc_y
            iy = s * inc_x + c * inc_y
            inc_sq = inc_x * inc_x + inc_y * inc_y + inc_t * inc_t
            th_ok = th_new * th_new < _MAX_THETA_SQ
        else:
            th_new = th
            ix, iy = inc_x, inc_y
            inc_sq = inc_x * inc_x + inc_y * inc_y
            th_ok = jnp.full(th.shape, True)
        finite = jnp.isfinite(inc_sq) & (inc_sq < 1e12)
        step_ok = (in_img & finite & th_ok).astype(jnp.float32)
        do = (active * step_ok) > 0
        posbuf_ref[:, 0] = jnp.where(do, p[:, 0] + ix, p[:, 0])
        posbuf_ref[:, 1] = jnp.where(do, p[:, 1] + iy, p[:, 1])
        th = jnp.where(do, th_new, th)
        not_conv = (inc_sq >= conv_thresh_sq).astype(jnp.float32)
        okf = okf * jnp.where(active > 0, step_ok, 1.0)
        active = active * step_ok * not_conv
        statebuf_ref[:, 0] = active
        statebuf_ref[:, 1] = okf
        statebuf_ref[:, 2] = th
        # Scalar active count via a (B,1) axis-0 reduction + element extract
        # (the only vector->scalar reduction form Mosaic accepts here; plain
        # jnp.sum of a 1-D vector is an "Offset change" compile error).
        n_act = jnp.sum(statebuf_ref[:, 0:1], axis=0)[0]
        return it + 1, n_act

    n0 = jnp.sum(statebuf_ref[:, 0:1], axis=0)[0]
    jax.lax.while_loop(gn_cond, gn_body, (jnp.asarray(0, jnp.int32), n0))
    okf = statebuf_ref[:, 1]
    th = statebuf_ref[:, 2]

    p = posbuf_ref[:]
    in_final = ((p[:, 0] >= MARGIN) & (p[:, 1] >= MARGIN)
                & (p[:, 0] <= true_w - 1 - MARGIN)
                & (p[:, 1] <= true_h - 1 - MARGIN))
    ok = (okf > 0) & in_final & (alive_f > 0)
    return p, th, ok.astype(jnp.float32)


def _klt_level_kernel(max_iterations: int, conv_thresh_sq: float,
                      true_h: int, true_w: int, with_rotation: bool,
                      residual_mode: str, lm_lambda: float,
                      img_src_ref, img_dst_ref, pos_src_ref, pos_dst_ref,
                      theta0_ref, alive_ref, cam_ref,
                      out_pos_ref, out_theta_ref, out_ok_ref,
                      win_ref, slab_ref, posbuf_ref, statebuf_ref, sem):
    """One feature block, one level: thin pallas wrapper over _level_pass."""
    pos, th, ok_f = _level_pass(
        max_iterations, conv_thresh_sq, true_h, true_w, with_rotation,
        residual_mode, lm_lambda,
        img_src_ref, img_dst_ref, cam_ref,
        pos_src_ref[:], pos_dst_ref[:], theta0_ref[:, 0],
        (alive_ref[:, 0] != 0).astype(jnp.float32),
        win_ref, slab_ref, posbuf_ref, statebuf_ref, sem)
    out_pos_ref[:] = pos
    out_theta_ref[:, 0] = th
    out_ok_ref[:, 0] = ok_f.astype(jnp.int32)


def _compiler_params(with_rotation: bool):
    """Rotation mode's _rot_sample unrolls (2*ROT_K+2)^2 shifted window
    slices that Mosaic keeps live on the scoped-vmem stack simultaneously
    (~48 MB at BLOCK=64) — far over the 16 MB default scoped limit but well
    within the chip's 128 MB VMEM. Raise the limit for that mode only."""
    if not with_rotation:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _pad_image(img):
    """Edge-pad a level image by (ROW_PAD, COL_PAD) at the top/left — so
    windows may overhang the image borders and sample replicated pixels —
    plus enough bottom/right headroom that every aligned slab load stays in
    bounds (largest aligned start + slab extent)."""
    H, W = img.shape
    rows = ROW_PAD + H
    cols = COL_PAD + W
    bottom = max(8 * ((rows - 1) // 8) + SLAB_R - rows, 8)
    right = max(128 * ((cols - 1) // 128) + SLAB_C - cols, 128)
    return jnp.pad(img, ((ROW_PAD, bottom), (COL_PAD, right)), mode="edge")


@partial(jax.jit, static_argnames=("max_iterations", "conv_thresh_sq",
                                   "with_rotation", "residual_mode",
                                   "lm_lambda", "interpret"))
def track_level(img_src, img_dst, pos_src, pos_dst0, theta0, alive,
                max_iterations: int = 20,
                conv_thresh_sq: float = 1e-4,
                with_rotation: bool = False,
                residual_mode: str = "lssd",
                lm_lambda: float = 0.0,
                interpret: bool = False,
                cam=None):
    """Track all features at one pyramid level (IC-KLT, 2- or 3-dof).

    Args:
      img_src, img_dst: (H, W) f32 level images — or (C, H, W) stacks of
        same-shape images (e.g. both cameras of a stereo rig), in which case
        `cam` selects per feature which image it tracks in. One pallas_call
        covers the whole multi-camera feature batch.
      pos_src: (N, 2) template centers in LEVEL coordinates (x, y).
      pos_dst0: (N, 2) initial target positions (level coords).
      theta0: (N,) initial in-plane rotation (rad; ignored unless
        with_rotation — angles are scale-free so the same value is valid at
        every level).
      alive: (N,) bool.
      cam: (N,) int32 image index per feature (None -> all 0).
    Returns (pos_dst (N,2) f32, theta (N,) f32, ok (N,) bool).
    """
    N = pos_src.shape[0]
    if img_src.ndim == 2:
        img_src = img_src[None]
        img_dst = img_dst[None]
    true_h, true_w = img_src.shape[1:]
    img_src_p = jax.vmap(_pad_image)(img_src)
    img_dst_p = jax.vmap(_pad_image)(img_dst)
    if cam is None:
        cam = jnp.zeros((N,), jnp.int32)

    n_pad = (-N) % BLOCK
    pad = lambda x, v=0: jnp.pad(  # noqa: E731
        x, [(0, n_pad)] + [(0, 0)] * (x.ndim - 1), constant_values=v)
    pos_src_p = pad(pos_src)
    pos_dst_p = pad(pos_dst0)
    theta_p = pad(theta0)[:, None]
    alive_p = pad(alive.astype(jnp.int32))[:, None]
    cam_p = pad(cam.astype(jnp.int32))[:, None]
    n_blocks = (N + n_pad) // BLOCK

    E = _win_geom(with_rotation)[0]
    kernel = partial(_klt_level_kernel, max_iterations, conv_thresh_sq,
                     true_h, true_w, with_rotation, residual_mode, lm_lambda)
    params = _compiler_params(with_rotation)
    pos_out, theta_out, ok_out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # img_src (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),   # img_dst (HBM)
            pl.BlockSpec((BLOCK, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N + n_pad, 2), jnp.float32),
            jax.ShapeDtypeStruct((N + n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((N + n_pad, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BLOCK, E, E), jnp.float32),
            pltpu.VMEM((1, SLAB_R, SLAB_C), jnp.float32),
            pltpu.VMEM((BLOCK, 2), jnp.float32),
            pltpu.VMEM((BLOCK, 3), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        compiler_params=params,
    )(img_src_p, img_dst_p, pos_src_p, pos_dst_p, theta_p, alive_p, cam_p)
    return pos_out[:N], theta_out[:N, 0], ok_out[:N, 0] != 0


def track_level_translation(img_src, img_dst, pos_src, pos_dst0, alive,
                            max_iterations: int = 20,
                            conv_thresh_sq: float = 1e-4,
                            interpret: bool = False):
    """Translation-only wrapper of track_level (2-dof, original contract).
    Returns (pos_dst (N,2) f32, ok (N,) bool)."""
    pos, _, ok = track_level(
        img_src, img_dst, pos_src, pos_dst0,
        jnp.zeros(pos_src.shape[0], pos_src.dtype), alive,
        max_iterations, conv_thresh_sq, with_rotation=False,
        interpret=interpret)
    return pos, ok


def _klt_bidir_kernel(max_iterations: int, conv_thresh_sq: float,
                      bidir_thresh_sq: float, dims, inv_ratio: float,
                      with_rotation: bool, residual_mode: str,
                      lm_lambda: float, coarse_tolerant: bool, *refs):
    """FULLY-FUSED bidirectional coarse-to-fine tracking for one feature
    block: every pyramid level of the forward track, every level of the
    backward verification track, and the return-distance gate run inside a
    single pallas_call. At steady state the per-frame tracker is LAUNCH-bound
    (each level kernel is ~5-35 us while 24+ launches and their position
    round-trips through HBM dominate) — this kernel collapses one
    bidirectional pass from 2*levels launches to 1.

    dims: static tuple of (true_h, true_w) per level. Positions are carried
    in FULL-RES pixels in VMEM scratch; each level scales by inv_ratio**lvl.

    refs layout: L src level images, L dst level images (each (C, Hp, Wp),
    ANY/HBM), pos_src (BLOCK,2), alive (BLOCK,1), cam (BLOCK,1), then outputs
    out_pos (BLOCK,2), out_theta (BLOCK,1), out_ok (BLOCK,1), then scratch
    win, slab, posbuf, statebuf, cur_ref (BLOCK,2), sem.
    """
    L = len(dims)
    src_refs = refs[:L]
    dst_refs = refs[L:2 * L]
    (pos_src_ref, alive_ref, cam_ref,
     out_pos_ref, out_theta_ref, out_ok_ref,
     win_ref, slab_ref, posbuf_ref, statebuf_ref, cur_ref, sem) = refs[2 * L:]

    pos_src = pos_src_ref[:]
    alive_f = (alive_ref[:, 0] != 0).astype(jnp.float32)
    B = pos_src.shape[0]

    def run_direction(tmpl_pos_full, src, dst, theta_init, alive0):
        """Coarse-to-fine over all levels; templates at tmpl_pos_full in
        src[lvl], GN in dst[lvl]; evolving estimate lives in cur_ref
        (full-res px). Returns (theta, ok_acc)."""
        ok_acc = alive0
        th = theta_init
        for lvl in reversed(range(L)):
            s = jnp.float32(1.0 / (inv_ratio ** lvl))   # full-res -> level
            true_h, true_w = dims[lvl]
            pos_o, th_o, lvl_ok = _level_pass(
                max_iterations, conv_thresh_sq, true_h, true_w,
                with_rotation, residual_mode, lm_lambda,
                src[lvl], dst[lvl], cam_ref,
                tmpl_pos_full * s, cur_ref[:] * s, th, alive0,
                win_ref, slab_ref, posbuf_ref, statebuf_ref, sem)
            do = lvl_ok > 0
            cur_ref[:] = jnp.where(do[:, None], pos_o * (1.0 / s), cur_ref[:])
            th = jnp.where(do, th_o, th)
            # Strict: any level failure kills the track (reference parity).
            # Tolerant: only the finest level is load-bearing — a border
            # feature unusable at coarse scales still tracks (see
            # KLTConfig.coarse_level_policy).
            if (not coarse_tolerant) or lvl == 0:
                ok_acc = ok_acc * lvl_ok
        return th, ok_acc

    # ---- forward ----
    cur_ref[:] = pos_src
    th_fwd, ok_fwd = run_direction(pos_src, src_refs, dst_refs,
                                   jnp.zeros((B,), jnp.float32), alive_f)
    fwd_ok = ok_fwd > 0
    pos_fwd = jnp.where(fwd_ok[:, None], cur_ref[:], pos_src)
    out_pos_ref[:] = pos_fwd

    # ---- backward (templates in dst at pos_fwd, GN back in src) ----
    cur_ref[:] = pos_src
    th_b0 = -th_fwd if with_rotation else jnp.zeros((B,), jnp.float32)
    _, ok_bwd = run_direction(out_pos_ref[:], dst_refs, src_refs,
                              th_b0, ok_fwd)

    # ---- return-distance gate (ref feature_tracker.rs:280) ----
    back = cur_ref[:]
    dist_sq = ((back[:, 0] - pos_src[:, 0]) ** 2
               + (back[:, 1] - pos_src[:, 1]) ** 2)
    ok = fwd_ok & (ok_bwd > 0) & (dist_sq < bidir_thresh_sq)
    out_theta_ref[:, 0] = th_fwd
    out_ok_ref[:, 0] = ok.astype(jnp.int32)


@partial(jax.jit, static_argnames=("max_iterations", "conv_thresh_sq",
                                   "bidir_thresh_sq", "with_rotation",
                                   "residual_mode", "lm_lambda",
                                   "pyramid_ratio", "interpret",
                                   "coarse_tolerant"))
def track_bidirectional_pyramid(pyr_src, pyr_dst, pos_src, alive,
                                max_iterations: int = 20,
                                conv_thresh_sq: float = 1e-4,
                                bidir_thresh_sq: float = 0.4,
                                with_rotation: bool = False,
                                residual_mode: str = "lssd",
                                lm_lambda: float = 0.0,
                                pyramid_ratio: float = 0.5,
                                interpret: bool = False,
                                cam=None,
                                coarse_tolerant: bool = False):
    """One-launch bidirectional coarse-to-fine KLT over a whole pyramid.

    Args:
      pyr_src, pyr_dst: tuples of level images, each (H, W) or a (C, H, W)
        camera stack (with `cam` selecting per feature).
      pos_src: (N, 2) source positions in FULL-RES pixels.
      alive: (N,) bool.
      cam: (N,) int32 image index per feature (None -> all 0).
    Returns (pos_dst (N,2), theta (N,), ok (N,)) — semantics identical to
    the per-level path composed as in ops.klt.track_points_bidirectional.
    """
    N = pos_src.shape[0]
    L = len(pyr_src)
    if pyr_src[0].ndim == 2:
        pyr_src = tuple(im[None] for im in pyr_src)
        pyr_dst = tuple(im[None] for im in pyr_dst)
    dims = tuple(im.shape[1:] for im in pyr_src)
    src_p = [jax.vmap(_pad_image)(im) for im in pyr_src]
    dst_p = [jax.vmap(_pad_image)(im) for im in pyr_dst]
    if cam is None:
        cam = jnp.zeros((N,), jnp.int32)

    n_pad = (-N) % BLOCK
    pad = lambda x, v=0: jnp.pad(  # noqa: E731
        x, [(0, n_pad)] + [(0, 0)] * (x.ndim - 1), constant_values=v)
    pos_p = pad(pos_src)
    alive_p = pad(alive.astype(jnp.int32))[:, None]
    cam_p = pad(cam.astype(jnp.int32))[:, None]
    n_blocks = (N + n_pad) // BLOCK

    E = _win_geom(with_rotation)[0]
    kernel = partial(_klt_bidir_kernel, max_iterations, conv_thresh_sq,
                     bidir_thresh_sq, dims, 1.0 / pyramid_ratio,
                     with_rotation, residual_mode, lm_lambda,
                     coarse_tolerant)
    params = _compiler_params(with_rotation)
    # Pin coarse level images in VMEM (greedy from the coarsest, within a
    # budget that leaves room for scratch + the finest level's working set;
    # rotation mode's ~48 MB scoped stack shrinks what is safe to pin).
    # With pl.ANY on all 2L refs Mosaic leaves EVERYTHING in HBM and every
    # per-feature window fetch pays full HBM DMA latency — measured 1.8-2x
    # slower than the per-level pallas_call composition at 6 levels (where
    # the compiler keeps each small single-level image on-chip). Explicit
    # placement restores on-chip windows for all but the finest level(s).
    budget = (10 if not with_rotation else 6) * 1024 * 1024
    spaces = [None] * L
    for lvl in range(L - 1, -1, -1):
        pair_bytes = 2 * src_p[lvl].size * src_p[lvl].dtype.itemsize
        if pair_bytes <= budget:
            spaces[lvl] = pltpu.VMEM
            budget -= pair_bytes
        else:
            spaces[lvl] = pltpu.ANY
    img_specs = ([pl.BlockSpec(memory_space=spaces[lvl]) for lvl in range(L)]
                 * 2)
    pos_out, theta_out, ok_out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=img_specs + [
            pl.BlockSpec((BLOCK, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N + n_pad, 2), jnp.float32),
            jax.ShapeDtypeStruct((N + n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((N + n_pad, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BLOCK, E, E), jnp.float32),
            pltpu.VMEM((1, SLAB_R, SLAB_C), jnp.float32),
            pltpu.VMEM((BLOCK, 2), jnp.float32),
            pltpu.VMEM((BLOCK, 3), jnp.float32),
            pltpu.VMEM((BLOCK, 2), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        compiler_params=params,
    )(*src_p, *dst_p, pos_p, alive_p, cam_p)
    return pos_out[:N], theta_out[:N, 0], ok_out[:N, 0] != 0
