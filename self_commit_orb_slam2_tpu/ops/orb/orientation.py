"""Intensity-centroid keypoint orientation via dense moment maps.

TPU-native redesign of IC_Angle (reference src/ORBextractor.cc:108-170), which
loops over a radius-15 circular patch per keypoint.  Here the patch moments
m10 = sum(dx * I) and m01 = sum(dy * I) are computed for *every* pixel at once
as two 31x31 convolutions (pure MXU work), and per-keypoint angles are just
gathers from the resulting atan2 map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

HALF_PATCH = 15  # reference HALF_PATCH_SIZE (src/ORBextractor.cc:92)


def _circular_mask() -> np.ndarray:
    """Point-symmetric boolean disc of radius 15.

    The reference realizes the same region through per-row umax widths
    umax[v] ~ round(sqrt(15^2 - v^2)) with a symmetry fix-up
    (src/ORBextractor.cc:579-608); a centered disc test is equivalent for
    the moment computation (point symmetry is what makes m10/m01 unbiased).
    """
    d = np.arange(-HALF_PATCH, HALF_PATCH + 1)
    return (d[None, :] ** 2 + d[:, None] ** 2) <= HALF_PATCH**2 + HALF_PATCH


_MASK = _circular_mask()
_DX = (np.arange(-HALF_PATCH, HALF_PATCH + 1)[None, :] * _MASK).astype(np.float32)
_DY = (np.arange(-HALF_PATCH, HALF_PATCH + 1)[:, None] * _MASK).astype(np.float32)


def angle_map(image: jnp.ndarray) -> jnp.ndarray:
    """Dense orientation map [H, W] in radians for every pixel.

    Note: single-channel 31x31 convs map poorly onto the TPU conv units
    (measured ~240ms at 320x240); kept only for reference/debugging — the
    extraction path uses the per-keypoint form below.
    """
    img4 = image[None, None]
    kx = jnp.asarray(_DX)[None, None]
    ky = jnp.asarray(_DY)[None, None]
    m10 = jax.lax.conv_general_dilated(img4, kx, (1, 1), "SAME")[0, 0]
    m01 = jax.lax.conv_general_dilated(img4, ky, (1, 1), "SAME")[0, 0]
    return jnp.arctan2(m01, m10)


def keypoint_angles(image: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Angles (radians) for keypoints at integer positions xy [N, 2].

    Per-keypoint 31x31 patch moments: N patch slices + two [N, 961] x [961]
    dot products — MXU-shaped, instead of a dense single-channel conv.
    """
    h, w = image.shape
    size = 2 * HALF_PATCH + 1
    xi = jnp.clip(xy[:, 0].astype(jnp.int32) - HALF_PATCH, 0, w - size)
    yi = jnp.clip(xy[:, 1].astype(jnp.int32) - HALF_PATCH, 0, h - size)
    patches = jax.vmap(
        lambda x0, y0: jax.lax.dynamic_slice(image, (y0, x0), (size, size))
    )(xi, yi)  # [N, 31, 31]
    flat = patches.reshape(patches.shape[0], size * size)
    m10 = flat @ jnp.asarray(_DX.reshape(-1))
    m01 = flat @ jnp.asarray(_DY.reshape(-1))
    return jnp.arctan2(m01, m10)
