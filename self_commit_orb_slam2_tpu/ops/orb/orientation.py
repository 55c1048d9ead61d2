"""Intensity-centroid keypoint orientation via dense moment maps.

TPU-native redesign of IC_Angle (reference src/ORBextractor.cc:108-170), which
loops over a radius-15 circular patch per keypoint.  Here the patch moments
m10 = sum(dx * I) and m01 = sum(dy * I) are computed for *every* pixel at once
as two 31x31 convolutions (pure MXU work), and per-keypoint angles are just
gathers from the resulting atan2 map.
"""

from __future__ import annotations

import functools

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


@functools.lru_cache(maxsize=None)
def _separable_factors(kernel_key: str, rank: int = 10):
    """SVD-separate the 31x31 moment kernel into `rank` (col, row) vector
    pairs.  The disc-masked kernels have fast-decaying spectra; rank 10
    reproduces them to ~1e-6 relative."""
    K = {"dx": _DX, "dy": _DY}[kernel_key].astype(np.float64)
    U, S, Vt = np.linalg.svd(K)
    cols = (U[:, :rank] * S[:rank]).astype(np.float32)   # [31, r]
    rows = Vt[:rank].astype(np.float32)                  # [r, 31]
    return cols, rows


@functools.lru_cache(maxsize=None)
def _band_matrix(n: int, vec: tuple) -> np.ndarray:
    """[n, n] banded matrix applying 1D correlation with `vec` (zero pad)."""
    v = np.asarray(vec, np.float64)
    r = len(v) // 2
    M = np.zeros((n, n), np.float64)
    for i in range(n):
        for dj, kv in zip(range(-r, r + 1), v):
            j = i + dj
            if 0 <= j < n:
                M[i, j] += kv
    return M.astype(np.float32)


def _moment_map(image: jnp.ndarray, kernel_key: str) -> jnp.ndarray:
    """Dense [H, W] patch moment via a low-rank separable expansion:
    each rank-1 term is two banded matmuls (MXU), no single-channel conv."""
    h, w = image.shape
    cols, rows = _separable_factors(kernel_key)
    out = jnp.zeros((h, w), jnp.float32)
    for r in range(cols.shape[1]):
        Bv = jnp.asarray(_band_matrix(h, tuple(cols[:, r].tolist())))
        Bh = jnp.asarray(_band_matrix(w, tuple(rows[r].tolist())))
        t = jnp.dot(Bv, image, preferred_element_type=jnp.float32)
        out = out + jnp.dot(t, Bh.T, preferred_element_type=jnp.float32)
    return out


def keypoint_angles_slab(
    slab: jnp.ndarray, xy: jnp.ndarray, level: jnp.ndarray
) -> jnp.ndarray:
    """Angles for keypoints across ALL pyramid levels in one gather.

    slab:  [L, H0, W0] padded level stack (unblurred).
    xy:    [N, 2] level-LOCAL integer keypoint positions.
    level: [N] int32 pyramid level per keypoint.

    Keypoints carry a >= 16px in-level border margin (detect.py) and the disc
    radius is 15, so every patch tap lands on true level pixels — identical
    moments to the per-level dense-map path, but as ONE [N, 961] gather plus
    one [N, 961] x [961, 2] moment matmul (vs ~40 banded matmuls per level).
    """
    L, h, w = slab.shape
    d = np.arange(-HALF_PATCH, HALF_PATCH + 1)
    off = (d[:, None] * w + d[None, :]).reshape(-1)          # [961] static
    xi = xy[:, 0].astype(jnp.int32)
    yi = xy[:, 1].astype(jnp.int32)
    base = level * (h * w) + yi * w + xi
    lin = base[:, None] + jnp.asarray(off, jnp.int32)[None, :]
    patches = jnp.take(slab.reshape(-1), lin)                # [N, 961]
    kern = jnp.asarray(
        np.stack([_DX.reshape(-1), _DY.reshape(-1)], axis=-1)
    )                                                        # [961, 2]
    m = jnp.dot(patches, kern, preferred_element_type=jnp.float32)
    return jnp.arctan2(m[:, 1], m[:, 0])


def keypoint_angles(image: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Angles (radians) for keypoints at integer positions xy [N, 2].

    Dense m10/m01 moment maps via rank-10 separable matmul expansions of the
    disc kernels (per-keypoint dynamic_slice patches lowered to a sequential
    per-keypoint while loop on TPU), then N point lookups.
    """
    h, w = image.shape
    m10 = _moment_map(image, "dx")
    m01 = _moment_map(image, "dy")
    xi = jnp.clip(xy[:, 0].astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(xy[:, 1].astype(jnp.int32), 0, h - 1)
    lin = yi * w + xi
    return jnp.arctan2(jnp.take(m01.reshape(-1), lin),
                       jnp.take(m10.reshape(-1), lin))
