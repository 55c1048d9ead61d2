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
    j = jnp.where(coarse_ok, best_idx, 0)
    ur0 = xy_r[j, 0]
    inv_scale = 1.0 / scale_factors
    n_levels = len(pyramid_l)
    nl = xy_l.shape[0]

    sad_best = jnp.full(nl, jnp.inf, jnp.float32)
    inc_best = jnp.zeros(nl, jnp.float32)
    win = 2 * SAD_HALF + 1

    def gather_patch(img, cx, cy, half_w, half_h):
        """[2*half_h+1, 2*half_w+1] patch centered at integer (cx, cy)."""
        h, w = img.shape
        y0 = jnp.clip(cy - half_h, 0, h - (2 * half_h + 1))
        x0 = jnp.clip(cx - half_w, 0, w - (2 * half_w + 1))
        return jax.lax.dynamic_slice(img, (y0, x0), (2 * half_h + 1, 2 * half_w + 1))

    for lv in range(n_levels):
        img_l = pyramid_l[lv]
        img_r = pyramid_r[lv]
        # scaled coords at this octave
        su = (xy_l[:, 0] * inv_scale[lv]).astype(jnp.int32)
        sv = (xy_l[:, 1] * inv_scale[lv]).astype(jnp.int32)
        sur = (ur0 * inv_scale[lv]).astype(jnp.int32)

        patch_l = jax.vmap(lambda cx, cy: gather_patch(img_l, cx, cy, SAD_HALF, SAD_HALF))(
            su, sv
        )  # [N, 11, 11]
        strip_r = jax.vmap(
            lambda cx, cy: gather_patch(img_r, cx, cy, SAD_HALF + SLIDE, SAD_HALF)
        )(sur, sv)  # [N, 11, 11 + 2*SLIDE]

        # center-normalize like the reference (IL - IL(center), :1255 region)
        patch_l = patch_l - patch_l[:, SAD_HALF, SAD_HALF][:, None, None]
        center_r = strip_r[:, SAD_HALF, SAD_HALF + SLIDE]
        # 11 sliding windows: SAD(incR) for incR in [-5, 5]
        sads = []
        for inc in range(2 * SLIDE + 1):
            window = jax.lax.dynamic_slice_in_dim(strip_r, inc, win, axis=2)
            window = window - window[:, SAD_HALF, SAD_HALF][:, None, None]
            sads.append(jnp.sum(jnp.abs(patch_l - window), axis=(1, 2)))
        sads = jnp.stack(sads, axis=1)  # [N, 11]
        k = jnp.argmin(sads, axis=1)
        smin = jnp.min(sads, axis=1)
        # parabola fit on (k-1, k, k+1) (reference :1262-1270)
        km = jnp.clip(k - 1, 0, 2 * SLIDE)
        kp = jnp.clip(k + 1, 0, 2 * SLIDE)
        s_m = jnp.take_along_axis(sads, km[:, None], 1)[:, 0]
        s_p = jnp.take_along_axis(sads, kp[:, None], 1)[:, 0]
        denom = s_m + s_p - 2.0 * smin
        delta = jnp.where(
            denom > 1e-6, (s_m - s_p) / (2.0 * jnp.maximum(denom, 1e-6)), 0.0
        )
        delta = jnp.clip(delta, -1.0, 1.0)
        inc = (k.astype(jnp.float32) - SLIDE) + delta
        at_level = level_l == lv
        sad_best = jnp.where(at_level, smin, sad_best)
        inc_best = jnp.where(at_level, inc, inc_best)

    scale_l = scale_factors[level_l]
    ur_refined = scale_l * ((ur0 * inv_scale[level_l]).astype(jnp.int32).astype(jnp.float32) + inc_best)
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
    d = depth_map[yi, xi] * depth_factor
    ok = valid & (d > 0.0)
    ur = xy[:, 0] - bf / jnp.maximum(d, 1e-6)
    return StereoMatches(
        u_right=jnp.where(ok, ur, -1.0),
        depth=jnp.where(ok, d, -1.0),
        valid=ok,
    )
