"""Stereo keypoint matching: row-band Hamming search + SAD subpixel refine.

TPU-native redesign of Frame::ComputeStereoMatches (reference
src/Frame.cc:1026-1420): the per-row candidate table becomes a dense [NL, NR]
compatibility mask; the per-keypoint 11x11 SAD slide becomes batched patch
gathers over the pyramid levels with a vectorized parabola fit.  Also provides
the RGB-D pseudo-stereo synthesis (Frame::ComputeStereoFromRGBD,
src/Frame.cc:1423-1461).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from .core import TH_HIGH, TH_LOW
from .hamming import INVALID_DIST, hamming_table

SAD_HALF = 5  # 11x11 window (reference w=5, src/Frame.cc:1233)
SLIDE = 5     # +-5 px disparity slide (reference L=5, :1245)


class StereoMatches(NamedTuple):
    u_right: jnp.ndarray  # [NL] float32, -1 where unmatched
    depth: jnp.ndarray    # [NL] float32, -1 where unmatched
    valid: jnp.ndarray    # [NL] bool


def match_stereo(
    xy_l: jnp.ndarray, level_l: jnp.ndarray, desc_l: jnp.ndarray, valid_l: jnp.ndarray,
    xy_r: jnp.ndarray, level_r: jnp.ndarray, desc_r: jnp.ndarray, valid_r: jnp.ndarray,
    pyramid_l: Sequence[jnp.ndarray],
    pyramid_r: Sequence[jnp.ndarray],
    bf: jnp.ndarray,
    min_z: jnp.ndarray,
    scale_factors: jnp.ndarray,
    level_dims: Sequence[tuple] | None = None,
) -> StereoMatches:
    """Match left keypoints to right keypoints along epipolar rows.

    Coordinates are level-0 pixels; pyramid images are used for SAD
    refinement at each keypoint's own octave (like the reference :1220-1275).
    min_z is the minimum expected depth (reference uses the baseline,
    src/Frame.cc:1033: minZ = mb), giving max disparity = bf / minZ.
    """
    max_d = bf / min_z
    # --- candidate mask (reference :1072-1216) ---
    row_tol = 2.0 * scale_factors[level_r]  # band half-width from right octave
    row_ok = jnp.abs(xy_l[:, None, 1] - xy_r[None, :, 1]) <= row_tol[None, :]
    lvl_ok = jnp.abs(level_l[:, None] - level_r[None, :]) <= 1
    disp = xy_l[:, None, 0] - xy_r[None, :, 0]
    disp_ok = (disp >= -1.0) & (disp <= max_d)  # allow tiny negative for noise
    mask = row_ok & lvl_ok & disp_ok

    table = hamming_table(desc_l, desc_r, valid_l, valid_r)
    table = jnp.where(mask, table, INVALID_DIST)
    best_idx = jnp.argmin(table, axis=1).astype(jnp.int32)
    best_dist = jnp.min(table, axis=1)
    th_orb = (TH_HIGH + TH_LOW) // 2  # reference :1105 region
    coarse_ok = (best_dist < th_orb) & valid_l

    # --- SAD subpixel refinement on octave-level images (reference :1220+) ---
    # Every keypoint needs ONLY its own octave, so instead of 8 per-level
    # passes of vmapped dynamic_slice patch fetches (a sequential per-keypoint
    # loop on TPU, ~8ns/element), the pyramids are stacked into padded slabs
    # and the 11 patch rows are fetched with ONE level-indexed row gather;
    # column windows resolve with one-hot matmuls on the MXU (same pattern as
    # ops/orb/sample.orient_and_describe).
    j = jnp.where(coarse_ok, best_idx, 0)
    ur0 = xy_r[j, 0]
    inv_scale = 1.0 / scale_factors
    nl = xy_l.shape[0]
    win = 2 * SAD_HALF + 1          # 11
    wr = win + 2 * SLIDE            # 21-wide right strip

    from ..orb.pyramid import stack_slab

    if isinstance(pyramid_l, (list, tuple)):
        level_dims = [tuple(img.shape) for img in pyramid_l]
        slab_l = stack_slab(list(pyramid_l))
        slab_r = stack_slab(list(pyramid_r))
    else:  # pre-stacked [L, H0, W0] slabs of identical padded geometry
        if level_dims is None:
            raise ValueError("pre-stacked slabs need explicit level_dims "
                             "(pyramid.level_shapes)")
        slab_l, slab_r = pyramid_l, pyramid_r
    L, H0, W0 = slab_l.shape
    lh = jnp.asarray([d[0] for d in level_dims], jnp.int32)
    lw = jnp.asarray([d[1] for d in level_dims], jnp.int32)

    su = (xy_l[:, 0] * inv_scale[level_l]).astype(jnp.int32)
    sv = (xy_l[:, 1] * inv_scale[level_l]).astype(jnp.int32)
    sur = (ur0 * inv_scale[level_l]).astype(jnp.int32)
    y0 = jnp.clip(sv - SAD_HALF, 0, jnp.maximum(lh[level_l] - win, 0))
    xl0 = jnp.clip(su - SAD_HALF, 0, jnp.maximum(lw[level_l] - win, 0))
    xr0 = jnp.clip(sur - SAD_HALF - SLIDE, 0, jnp.maximum(lw[level_l] - wr, 0))

    iota = jnp.arange(win, dtype=jnp.int32)
    big2d = jnp.concatenate([slab_l, slab_r]).reshape(2 * L * H0, W0)
    # Column-blocked row gather (same pattern as ops/orb/sample.py): fetching
    # full W0-wide rows moved N*2*11*W0 floats per frame (~224MB at KITTI
    # width) and made the one-hot column selectors W0 wide; 96-px-strided
    # 128-wide windows cut both ~10x for the same exact values.
    STRIDE, BW = 96, 128  # BW >= STRIDE - 1 + wr so any window fits a block
    assert BW - STRIDE + 1 >= wr
    nbk = max(W0 - 1, 0) // STRIDE + 1
    padded = jnp.pad(big2d, ((0, 0), (0, STRIDE * (nbk - 1) + BW - W0)))
    blocks = jnp.stack(
        [padded[:, b * STRIDE : b * STRIDE + BW] for b in range(nbk)], axis=1
    ).reshape(-1, BW)
    rowidx = level_l[:, None] * H0 + y0[:, None] + iota[None, :]       # [N, 11]
    blk_l = xl0 // STRIDE
    off_l = xl0 - blk_l * STRIDE
    blk_r = xr0 // STRIDE
    off_r = xr0 - blk_r * STRIDE
    rows_l = jnp.take(
        blocks, (rowidx * nbk + blk_l[:, None]).reshape(-1), axis=0
    ).reshape(nl, win, BW)
    rows_r = jnp.take(
        blocks, ((rowidx + L * H0) * nbk + blk_r[:, None]).reshape(-1), axis=0
    ).reshape(nl, win, BW)
    # one-hot column selection is exact at 3-pass bf16 (see
    # ops/orb/sample._SEL_PREC) — half the MXU passes of the package default
    sel_prec = jax.lax.Precision.HIGH
    wiota = jnp.arange(BW, dtype=jnp.int32)
    colsel_l = (wiota[None, :, None]
                == (off_l[:, None, None] + iota[None, None, :])).astype(jnp.float32)
    patch_l = jnp.einsum("npw,nwq->npq", rows_l, colsel_l,
                         precision=sel_prec)                           # [N, 11, 11]
    iota_r = jnp.arange(wr, dtype=jnp.int32)
    colsel_r = (wiota[None, :, None]
                == (off_r[:, None, None] + iota_r[None, None, :])).astype(jnp.float32)
    strip_r = jnp.einsum("npw,nwq->npq", rows_r, colsel_r,
                         precision=sel_prec)                           # [N, 11, 21]

    # center-normalize like the reference (IL - IL(center), :1255 region)
    patch_l = patch_l - patch_l[:, SAD_HALF, SAD_HALF][:, None, None]
    # 11 sliding windows: SAD over centers xr0 + SAD_HALF + inc
    sads = []
    for inc in range(2 * SLIDE + 1):
        window = jax.lax.dynamic_slice_in_dim(strip_r, inc, win, axis=2)
        window = window - window[:, SAD_HALF, SAD_HALF][:, None, None]
        sads.append(jnp.sum(jnp.abs(patch_l - window), axis=(1, 2)))
    sads = jnp.stack(sads, axis=1)  # [N, 11]
    k = jnp.argmin(sads, axis=1)
    sad_best = jnp.min(sads, axis=1)
    # parabola fit on (k-1, k, k+1) (reference :1262-1270)
    km = jnp.clip(k - 1, 0, 2 * SLIDE)
    kp = jnp.clip(k + 1, 0, 2 * SLIDE)
    s_m = jnp.take_along_axis(sads, km[:, None], 1)[:, 0]
    s_p = jnp.take_along_axis(sads, kp[:, None], 1)[:, 0]
    denom = s_m + s_p - 2.0 * sad_best
    delta = jnp.where(
        denom > 1e-6, (s_m - s_p) / (2.0 * jnp.maximum(denom, 1e-6)), 0.0
    )
    delta = jnp.clip(delta, -1.0, 1.0)

    scale_l = scale_factors[level_l]
    # window k's center column is xr0 + SAD_HALF + k (== sur + k - SLIDE when
    # the strip is not clipped at the image border, the reference's case)
    ur_refined = scale_l * (
        (xr0 + SAD_HALF + k).astype(jnp.float32) + delta
    )
    disparity = xy_l[:, 0] - ur_refined
    disparity_ok = (disparity > 1e-3) & (disparity <= max_d)
    ok = coarse_ok & disparity_ok

    # --- median-based outlier cut (reference :1380-1420) ---
    big = jnp.where(ok, sad_best, jnp.inf)
    n_ok = jnp.sum(ok)
    sorted_sad = jnp.sort(big)
    med_idx = jnp.clip(n_ok // 2, 0, nl - 1)
    median = sorted_sad[med_idx]
    th = 1.5 * 1.4 * jnp.where(jnp.isfinite(median), median, 0.0)
    ok &= (sad_best <= th) | (n_ok < 5)

    depth = bf / jnp.maximum(disparity, 1e-6)
    return StereoMatches(
        u_right=jnp.where(ok, ur_refined, -1.0),
        depth=jnp.where(ok, depth, -1.0),
        valid=ok,
    )


def stereo_from_depth(
    xy: jnp.ndarray, valid: jnp.ndarray, depth_map: jnp.ndarray, bf: jnp.ndarray,
    depth_factor: float = 1.0,
) -> StereoMatches:
    """RGB-D pseudo-stereo: read depth at each keypoint, synthesize u_right.

    Reference: Frame::ComputeStereoFromRGBD (src/Frame.cc:1423-1461) reads the
    depth image at the (distorted) keypoint location and sets
    mvuRight = u - bf/d.
    """
    h, w = depth_map.shape
    xi = jnp.clip(xy[:, 0].astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(xy[:, 1].astype(jnp.int32), 0, h - 1)
    # flat 1D gather: the 2D-coordinate gather lowers to a scalarized
    # full-map sweep on TPU (measured 2.2ms per 8-frame chunk at 640x480)
    d = jnp.take(depth_map.reshape(-1), yi * w + xi) * depth_factor
    ok = valid & (d > 0.0)
    ur = xy[:, 0] - bf / jnp.maximum(d, 1e-6)
    return StereoMatches(
        u_right=jnp.where(ok, ur, -1.0),
        depth=jnp.where(ok, d, -1.0),
        valid=ok,
    )
