"""Core masked-matching primitives shared by all search modes.

The reference's nine ORBmatcher search modes (src/ORBmatcher.cc, SURVEY §2.1)
all share: Hamming distance, a candidate-compatibility constraint (pixel
window / grid / BoW node / epipolar band), best & second-best tracking with a
ratio test, absolute thresholds TH_HIGH=100 / TH_LOW=50, and a
rotation-consistency histogram (30 bins, keep top 3).  Here those pieces are
dense masked [N, M] table ops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .hamming import INVALID_DIST, hamming_table

TH_HIGH = 100  # reference ORBmatcher.cc:49
TH_LOW = 50    # reference ORBmatcher.cc:50
HISTO_LENGTH = 30  # reference ORBmatcher.cc:51


class MatchResult(NamedTuple):
    idx: jnp.ndarray    # [N] int32 best match in the target set (-1 = none)
    dist: jnp.ndarray   # [N] int32 best Hamming distance
    valid: jnp.ndarray  # [N] bool


def window_mask(
    pred_uv: jnp.ndarray,
    target_uv: jnp.ndarray,
    radius: jnp.ndarray,
) -> jnp.ndarray:
    """[N, M] mask: target j within `radius[i]` (Chebyshev) of prediction i.

    Mirrors Frame::GetFeaturesInArea's square window (src/Frame.cc:741-830)
    without the grid acceleration — the dense mask is the TPU-friendly form.
    """
    du = jnp.abs(pred_uv[:, None, 0] - target_uv[None, :, 0])
    dv = jnp.abs(pred_uv[:, None, 1] - target_uv[None, :, 1])
    r = radius[:, None] if radius.ndim == 1 else radius
    return (du <= r) & (dv <= r)


def level_mask(
    pred_level: jnp.ndarray, target_level: jnp.ndarray,
    min_offset: int = 0, max_offset: int = 1,
) -> jnp.ndarray:
    """[N, M] mask: target octave within [pred+min_offset, pred+max_offset].

    The reference's projection searches restrict candidate octaves around the
    predicted scale (e.g. src/ORBmatcher.cc:120-135, :1620-1650).
    """
    diff = target_level[None, :] - pred_level[:, None]
    return (diff >= min_offset) & (diff <= max_offset)


def masked_best_match(
    desc_q: jnp.ndarray,
    desc_t: jnp.ndarray,
    mask: jnp.ndarray,
    valid_q: jnp.ndarray,
    valid_t: jnp.ndarray,
    max_dist: int = TH_HIGH,
    ratio: float | None = None,
    ratio_same_level_only: jnp.ndarray | None = None,
) -> MatchResult:
    """Best target per query under a compatibility mask.

    ratio: if set, require best < ratio * second_best (reference
    mfNNratio test, e.g. src/ORBmatcher.cc:620-650).
    ratio_same_level_only: optional [N, M] bool; when given, the second-best
    used by the ratio test only counts candidates where this mask is True
    (the reference applies the ratio only when best/second are at the same
    octave in SearchByProjection, src/ORBmatcher.cc:160-178).
    """
    table = hamming_table(desc_q, desc_t, valid_q, valid_t)
    table = jnp.where(mask, table, INVALID_DIST)
    best_idx = jnp.argmin(table, axis=1).astype(jnp.int32)
    best = jnp.min(table, axis=1)
    ok = (best <= max_dist) & valid_q
    if ratio is not None:
        # mask out the best column per row, find second best
        n = table.shape[1]
        onehot = jax.nn.one_hot(best_idx, n, dtype=bool)
        table2 = jnp.where(onehot, INVALID_DIST, table)
        if ratio_same_level_only is not None:
            table2 = jnp.where(ratio_same_level_only, table2, INVALID_DIST)
        second = jnp.min(table2, axis=1)
        ok &= best.astype(jnp.float32) < ratio * second.astype(jnp.float32)
    return MatchResult(
        idx=jnp.where(ok, best_idx, -1), dist=best, valid=ok
    )


def mutual_best_match(
    desc_q: jnp.ndarray,
    desc_t: jnp.ndarray,
    mask: jnp.ndarray,
    valid_q: jnp.ndarray,
    valid_t: jnp.ndarray,
    max_dist: int = TH_LOW,
    ratio: float | None = 0.9,
) -> MatchResult:
    """Best match that is also best in the reverse direction.

    The reference achieves uniqueness via scratch "bestDist per target" arrays
    (e.g. SearchForInitialization src/ORBmatcher.cc:515-650); mutual-best is
    the batched equivalent.
    """
    res = masked_best_match(desc_q, desc_t, mask, valid_q, valid_t, max_dist, ratio)
    table = hamming_table(desc_q, desc_t, valid_q, valid_t)
    table = jnp.where(mask, table, INVALID_DIST)
    rev_best = jnp.argmin(table, axis=0).astype(jnp.int32)  # [M]
    # query i keeps its match j only if rev_best[j] == i
    j = jnp.where(res.valid, res.idx, 0)
    mutual = rev_best[j] == jnp.arange(desc_q.shape[0], dtype=jnp.int32)
    ok = res.valid & mutual
    return MatchResult(idx=jnp.where(ok, res.idx, -1), dist=res.dist, valid=ok)


def rotation_consistency_mask(
    angle_q: jnp.ndarray,
    angle_t: jnp.ndarray,
    match: MatchResult,
) -> jnp.ndarray:
    """Keep only matches whose angle difference falls in the 3 dominant bins.

    Reference: 30-bin rotation histogram + ComputeThreeMaxima
    (src/ORBmatcher.cc:1866-1911), including the rule that bins with < 0.1x
    the max count are not kept even if in the top 3.
    """
    j = jnp.where(match.valid, match.idx, 0)
    diff = angle_q - angle_t[j]  # radians
    two_pi = 2.0 * jnp.pi
    diff = jnp.mod(diff, two_pi)  # [0, 2pi)
    bin_idx = jnp.clip(
        (diff * (HISTO_LENGTH / two_pi)).astype(jnp.int32), 0, HISTO_LENGTH - 1
    )
    counts = jnp.zeros(HISTO_LENGTH, jnp.int32).at[bin_idx].add(
        match.valid.astype(jnp.int32)
    )
    top3, top3_idx = jax.lax.top_k(counts, 3)
    keep_bin = jnp.zeros(HISTO_LENGTH, bool)
    max1 = top3[0]
    for k in range(3):
        keep = top3[k].astype(jnp.float32) > 0.1 * max1.astype(jnp.float32)
        keep_bin = keep_bin.at[top3_idx[k]].set(keep | (k == 0))
    return match.valid & keep_bin[bin_idx]
