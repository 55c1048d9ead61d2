"""Dense FAST-9-16 corner response over whole images.

TPU-native redesign of the per-cell scalar FAST in
ORBextractor::ComputeKeyPointsOctTree (reference src/ORBextractor.cc:1052-1199,
which calls cv::FAST per 30px cell with threshold fallback 20 -> 7).  Here the
segment test runs densely on the full image as 16 shifted comparisons packed
into a uint32 bitmask; a 9-contiguous arc exists iff the AND of 9 rotations of
the mask is nonzero.  The threshold fallback becomes a per-cell select between
the two dense response maps (see detect.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3 (the standard FAST-16 ring, clockwise from
# 12 o'clock) as (dy, dx) offsets — same ring cv::FAST uses.
RING_OFFSETS = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3),
        (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3),
        (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)

ARC_LENGTH = 9  # FAST-9: need >= 9 contiguous brighter/darker ring pixels.


def _ring_stack(image: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W] -> [16, ..., H, W] of ring-neighbor values (edge-replicated).

    Leading batch dims (e.g. a stacked pyramid slab [L, H, W]) are carried
    through so all levels run as ONE op chain instead of L serial chains.
    """
    pad = [(0, 0)] * (image.ndim - 2) + [(3, 3), (3, 3)]
    padded = jnp.pad(image, pad, mode="edge")
    h, w = image.shape[-2:]
    return jnp.stack(
        [padded[..., 3 + dy : 3 + dy + h, 3 + dx : 3 + dx + w]
         for dy, dx in RING_OFFSETS]
    )


def _rot16(bits: jnp.ndarray, k: int) -> jnp.ndarray:
    return ((bits << k) | (bits >> (16 - k))) & jnp.uint32(0xFFFF)


def fast_response(image: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Dense FAST-9 corner response [..., H, W]; 0 where not a corner.

    Response = max(sum of (ring - p - t) over the brighter set, sum of
    (p - t - ring) over the darker set) — the same arc-strength quantity
    cv::FAST's score approximates; used only for NMS/ranking so exact
    OpenCV score parity is not required.
    """
    ring = _ring_stack(image)  # [16, ..., H, W]
    p = image[None]
    t = jnp.float32(threshold)
    brighter = ring > p + t  # [16, ..., H, W]
    darker = ring < p - t

    def has_arc(mask: jnp.ndarray) -> jnp.ndarray:
        weights = (2 ** np.arange(16)).astype(np.uint32)
        wshape = (16,) + (1,) * (mask.ndim - 1)
        bits = jnp.sum(
            mask.astype(jnp.uint32) * jnp.asarray(weights).reshape(wshape), axis=0
        )
        acc = bits
        for k in range(1, ARC_LENGTH):
            acc = acc & _rot16(bits, k)
        return acc != 0

    is_corner = has_arc(brighter) | has_arc(darker)
    bright_score = jnp.sum(jnp.where(brighter, ring - p - t, 0.0), axis=0)
    dark_score = jnp.sum(jnp.where(darker, p - t - ring, 0.0), axis=0)
    score = jnp.maximum(bright_score, dark_score)
    return jnp.where(is_corner, score, 0.0)


def nms3x3(score: jnp.ndarray) -> jnp.ndarray:
    """Zero out non-maxima in each 3x3 neighborhood (ties keep the first in
    raster order via strict-greater on later neighbors).  Accepts leading
    batch dims ([..., H, W])."""
    pad = [(0, 0)] * (score.ndim - 2) + [(1, 1), (1, 1)]
    padded = jnp.pad(score, pad, mode="constant", constant_values=-1.0)
    h, w = score.shape[-2:]
    keep = jnp.ones(score.shape, bool)
    for dy in range(3):
        for dx in range(3):
            if dy == 1 and dx == 1:
                continue
            neigh = padded[..., dy : dy + h, dx : dx + w]
            if dy < 1 or (dy == 1 and dx < 1):
                keep &= score > neigh  # earlier raster neighbors: strict
            else:
                keep &= score >= neigh
    return jnp.where(keep, score, 0.0)
