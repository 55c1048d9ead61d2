"""Per-level keypoint selection: cell-wise top-1 with threshold fallback.

TPU-native replacement for the reference's sequential quad-tree NMS
(ORBextractor::DistributeOctTree, src/ORBextractor.cc:706-1050) and the 30px
cell FAST loop with 20 -> 7 threshold fallback (:1060-1157).  Spatial
uniformity is enforced by taking the best corner per fixed grid cell (one
candidate per cell, like a one-shot quad tree at a fixed depth), then keeping
the top `n_keep` cells by response.  The threshold fallback becomes a per-cell
select between the high- and low-threshold dense response maps.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class LevelKeypoints(NamedTuple):
    xy: jnp.ndarray        # [N, 2] float32 (x, y) in level-local pixel coords
    response: jnp.ndarray  # [N] float32
    valid: jnp.ndarray     # [N] bool


class SlabKeypoints(NamedTuple):
    """All levels' keypoints concatenated in per-level budget order."""

    xy: jnp.ndarray        # [N, 2] float32, level-LOCAL pixel coords
    response: jnp.ndarray  # [N] float32
    level: jnp.ndarray     # [N] int32
    valid: jnp.ndarray     # [N] bool


def select_keypoints_slab(
    score_hi: jnp.ndarray,
    score_lo: jnp.ndarray,
    budgets: list[int],
    level_dims: list[tuple[int, int]],
    cell: int = 16,
    border: int = 16,
) -> SlabKeypoints:
    """Batched all-levels keypoint selection from a padded score slab.

    score_hi/score_lo: [L, H0, W0] NMS'd FAST responses, every level padded to
    level-0 size (padding region must score <= 0 or be masked by the per-level
    in-bounds mask built here).  One cell-max + one top_k over all levels
    replaces L sequential select_keypoints chains; rows beyond each level's
    budget are sliced off statically so the concatenated layout is identical
    to the per-level path.
    """
    L, H0, W0 = score_hi.shape

    inb = np.zeros((L, H0, W0), bool)
    for lv, (h, w) in enumerate(level_dims):
        inb[lv, border:h - border, border:w - border] = True
    mask = jnp.asarray(inb)
    score_hi = jnp.where(mask, score_hi, 0.0)
    score_lo = jnp.where(mask, score_lo, 0.0)

    ph = (cell - H0 % cell) % cell
    pw = (cell - W0 % cell) % cell
    if ph or pw:
        score_hi = jnp.pad(score_hi, ((0, 0), (0, ph), (0, pw)))
        score_lo = jnp.pad(score_lo, ((0, 0), (0, ph), (0, pw)))
    hh, ww = H0 + ph, W0 + pw
    ncy, ncx = hh // cell, ww // cell

    def per_cell(score):
        cells = score.reshape(L, ncy, cell, ncx, cell).transpose(0, 1, 3, 2, 4)
        flat = cells.reshape(L, ncy * ncx, cell * cell)
        return jnp.max(flat, axis=-1), jnp.argmax(flat, axis=-1)

    hi_best, hi_arg = per_cell(score_hi)
    lo_best, lo_arg = per_cell(score_lo)
    use_hi = hi_best > 0.0
    best = jnp.where(use_hi, hi_best, lo_best)   # [L, ncells]
    arg = jnp.where(use_hi, hi_arg, lo_arg)

    kmax = min(max(budgets), ncy * ncx)
    top, idx = jax.lax.top_k(best, kmax)          # [L, kmax] batched
    sel_arg = jnp.take_along_axis(arg, idx, axis=1)
    y = ((idx // ncx) * cell + sel_arg // cell).astype(jnp.float32)
    x = ((idx % ncx) * cell + sel_arg % cell).astype(jnp.float32)

    xs, ys, rs, vs, lvs = [], [], [], [], []
    for lv, b in enumerate(budgets):
        k = min(b, kmax)
        pad = b - k
        xs.append(jnp.pad(x[lv, :k], (0, pad)))
        ys.append(jnp.pad(y[lv, :k], (0, pad)))
        rs.append(jnp.pad(top[lv, :k], (0, pad)))
        vs.append(jnp.pad(top[lv, :k] > 0.0, (0, pad)))
        lvs.append(jnp.full(b, lv, jnp.int32))
    return SlabKeypoints(
        xy=jnp.stack([jnp.concatenate(xs), jnp.concatenate(ys)], axis=-1),
        response=jnp.concatenate(rs),
        level=jnp.concatenate(lvs),
        valid=jnp.concatenate(vs),
    )


def select_keypoints_bands(
    hi_max: jnp.ndarray, hi_arg: jnp.ndarray,
    lo_max: jnp.ndarray, lo_arg: jnp.ndarray,
    budgets: list[int], G: int, H0p: int,
) -> SlabKeypoints:
    """Keypoint selection from 16-row band maxima (fast_nms_bands_hi_lo).

    Inputs are [G*H0p//16, wp] band max/argrow per threshold, already
    border-masked in the kernel.  The 16x16 cell max reduces the remaining
    column axis here on 16x-smaller arrays — the full score maps never
    existed in HBM.  Tie-breaks differ from select_keypoints_slab only when
    two pixels in one cell share an identical nonzero float score."""
    nby = H0p // 16
    wp = hi_max.shape[1]
    ncx = wp // 16

    def cells(mx, ar):
        m4 = mx.reshape(G, nby, ncx, 16)
        best = jnp.max(m4, -1)                        # [G, nby, ncx]
        c16 = jnp.argmax(m4, -1).astype(jnp.int32)
        a4 = ar.reshape(G, nby, ncx, 16)
        # one-hot reduce instead of take_along_axis: a lane-axis gather
        # scalarizes on TPU (measured 2.2ms per chunk)
        oh = (jnp.arange(16, dtype=jnp.int32) == c16[..., None])
        rw = jnp.sum(jnp.where(oh, a4, 0), -1)
        return best, c16, rw

    hb, hc, hrw = cells(hi_max, hi_arg)
    lb, lc, lrw = cells(lo_max, lo_arg)
    use_hi = hb > 0.0
    best = jnp.where(use_hi, hb, lb)
    c16 = jnp.where(use_hi, hc, lc)
    rw = jnp.where(use_hi, hrw, lrw)

    band_i = jnp.arange(nby, dtype=jnp.int32)[None, :, None]
    col_i = jnp.arange(ncx, dtype=jnp.int32)[None, None, :]
    y_all = (band_i * 16 + rw).astype(jnp.float32)
    x_all = (col_i * 16 + c16).astype(jnp.float32)

    ncells = nby * ncx
    kmax = min(max(budgets), ncells)
    top, idx = jax.lax.top_k(best.reshape(G, ncells), kmax)
    x = jnp.take_along_axis(x_all.reshape(G, ncells), idx, axis=1)
    y = jnp.take_along_axis(y_all.reshape(G, ncells), idx, axis=1)

    xs, ys, rs, vs, lvs = [], [], [], [], []
    for g, b in enumerate(budgets):
        k = min(b, kmax)
        pad = b - k
        xs.append(jnp.pad(x[g, :k], (0, pad)))
        ys.append(jnp.pad(y[g, :k], (0, pad)))
        rs.append(jnp.pad(top[g, :k], (0, pad)))
        vs.append(jnp.pad(top[g, :k] > 0.0, (0, pad)))
        lvs.append(jnp.full(b, g, jnp.int32))
    return SlabKeypoints(
        xy=jnp.stack([jnp.concatenate(xs), jnp.concatenate(ys)], axis=-1),
        response=jnp.concatenate(rs),
        level=jnp.concatenate(lvs),
        valid=jnp.concatenate(vs),
    )


def select_keypoints(
    score_hi: jnp.ndarray,
    score_lo: jnp.ndarray,
    n_keep: int,
    cell: int = 16,
    border: int = 16,
) -> LevelKeypoints:
    """Pick up to n_keep spatially-spread corners from dense response maps.

    score_hi/score_lo: NMS'd FAST responses at thresholds 20 / 7
    (reference iniThFAST/minThFAST, src/ORBextractor.cc:1104-1157).
    """
    h, w = score_hi.shape

    # Exclude the border band where BRIEF patches would leave the image
    # (reference EDGE_THRESHOLD=19 with FAST allowed from 16, :91-93, :1060).
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    in_bounds = (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)
    score_hi = jnp.where(in_bounds, score_hi, 0.0)
    score_lo = jnp.where(in_bounds, score_lo, 0.0)

    # Pad to a multiple of the cell size.
    ph = (cell - h % cell) % cell
    pw = (cell - w % cell) % cell
    score_hi = jnp.pad(score_hi, ((0, ph), (0, pw)))
    score_lo = jnp.pad(score_lo, ((0, ph), (0, pw)))
    hh, ww = h + ph, w + pw
    ncy, ncx = hh // cell, ww // cell

    def per_cell(score):
        cells = score.reshape(ncy, cell, ncx, cell).transpose(0, 2, 1, 3)
        flat = cells.reshape(ncy, ncx, cell * cell)
        best = jnp.max(flat, axis=-1)
        arg = jnp.argmax(flat, axis=-1)
        return best, arg

    hi_best, hi_arg = per_cell(score_hi)
    lo_best, lo_arg = per_cell(score_lo)
    use_hi = hi_best > 0.0
    best = jnp.where(use_hi, hi_best, lo_best)
    arg = jnp.where(use_hi, hi_arg, lo_arg)

    cy = jnp.arange(ncy)[:, None] * cell
    cx = jnp.arange(ncx)[None, :] * cell
    y = (cy + arg // cell).astype(jnp.float32)
    x = (cx + arg % cell).astype(jnp.float32)

    flat_best = best.reshape(-1)
    flat_x = x.reshape(-1)
    flat_y = y.reshape(-1)
    k = min(n_keep, flat_best.shape[0])
    top, idx = jax.lax.top_k(flat_best, k)
    sel_x = flat_x[idx]
    sel_y = flat_y[idx]
    valid = top > 0.0
    if k < n_keep:  # tiny levels: pad up to the static capacity
        pad = n_keep - k
        top = jnp.concatenate([top, jnp.zeros(pad, top.dtype)])
        sel_x = jnp.concatenate([sel_x, jnp.zeros(pad, sel_x.dtype)])
        sel_y = jnp.concatenate([sel_y, jnp.zeros(pad, sel_y.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros(pad, bool)])
    return LevelKeypoints(
        xy=jnp.stack([sel_x, sel_y], axis=-1), response=top, valid=valid
    )
