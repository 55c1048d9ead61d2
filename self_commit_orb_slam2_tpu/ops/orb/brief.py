"""Rotated (steered) BRIEF-256 descriptors as batched gathers.

TPU-native redesign of computeOrbDescriptor (reference
src/ORBextractor.cc:173-230): instead of a per-keypoint byte loop, all
N keypoints x 512 pattern samples are gathered from the blurred level image in
one indexed read, compared pairwise, and bit-packed into [N, 8] uint32 words.

Rotation convention matches the reference's GET_VALUE:
    x' = round(px*cos - py*sin), y' = round(px*sin + py*cos)
with (px, py) from the published 256-pair pattern (brief_pattern.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .brief_pattern import BIT_PATTERN_31

# [512, 2] sample points: pairs interleaved (a0, b0, a1, b1, ...).
_PATTERN_XY = BIT_PATTERN_31.reshape(256, 2, 2).reshape(512, 2).astype(np.float32)

_BIT_WEIGHTS = (1 << np.arange(32, dtype=np.uint64)).astype(np.uint32)


def describe_slab(
    blurred: jnp.ndarray,
    xy: jnp.ndarray,
    level: jnp.ndarray,
    angle: jnp.ndarray,
    level_dims: list,
) -> jnp.ndarray:
    """Descriptors for keypoints across ALL pyramid levels in one gather.

    blurred: [L, H0, W0] padded blurred level stack.
    xy:      [N, 2] level-LOCAL keypoint positions.
    level:   [N] int32 level per keypoint.
    angle:   [N] radians.
    level_dims: [(h, w)] true per-level shapes — sample coordinates clip to
    the LEVEL bounds (same semantics as the per-level describe()).
    """
    L, h, w = blurred.shape
    hs = jnp.asarray(np.array([d[0] for d in level_dims], np.int32))[level]
    ws = jnp.asarray(np.array([d[1] for d in level_dims], np.int32))[level]
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    px = _PATTERN_XY[:, 0][None, :]
    py = _PATTERN_XY[:, 1][None, :]
    rx = jnp.round(px * ca[:, None] - py * sa[:, None])
    ry = jnp.round(px * sa[:, None] + py * ca[:, None])
    gx = jnp.clip((xy[:, 0:1] + rx).astype(jnp.int32), 0, ws[:, None] - 1)
    gy = jnp.clip((xy[:, 1:2] + ry).astype(jnp.int32), 0, hs[:, None] - 1)
    lin = (level * (h * w))[:, None] + gy * w + gx
    samples = jnp.take(blurred.reshape(-1), lin)  # [N, 512]
    a = samples[:, 0::2]
    b = samples[:, 1::2]
    bits = (a < b).astype(jnp.uint32)
    words = bits.reshape(-1, 8, 32)
    return jnp.sum(words * jnp.asarray(_BIT_WEIGHTS)[None, None, :], axis=-1).astype(
        jnp.uint32
    )


def describe(
    blurred: jnp.ndarray, xy: jnp.ndarray, angle: jnp.ndarray
) -> jnp.ndarray:
    """Compute descriptors.

    blurred: [H, W] Gaussian-blurred level image.
    xy:      [N, 2] keypoint positions (level-local pixels).
    angle:   [N] orientation in radians.
    Returns [N, 8] uint32 (256 bits; word j bit k = pair 32j+k, bit set iff
    I(a) < I(b), matching the reference's `t0 < t1` test).
    """
    h, w = blurred.shape
    ca, sa = jnp.cos(angle), jnp.sin(angle)  # [N]
    px = _PATTERN_XY[:, 0][None, :]  # [1, 512]
    py = _PATTERN_XY[:, 1][None, :]
    rx = jnp.round(px * ca[:, None] - py * sa[:, None])
    ry = jnp.round(px * sa[:, None] + py * ca[:, None])
    gx = jnp.clip((xy[:, 0:1] + rx).astype(jnp.int32), 0, w - 1)
    gy = jnp.clip((xy[:, 1:2] + ry).astype(jnp.int32), 0, h - 1)
    # 1D gather from the flattened image: lowers to a single vectorized
    # gather instead of a 2D scatter-shaped one
    samples = jnp.take(blurred.reshape(-1), gy * w + gx)  # [N, 512]
    a = samples[:, 0::2]
    b = samples[:, 1::2]
    bits = (a < b).astype(jnp.uint32)  # [N, 256]
    words = bits.reshape(-1, 8, 32)
    return jnp.sum(words * jnp.asarray(_BIT_WEIGHTS)[None, None, :], axis=-1).astype(
        jnp.uint32
    )
