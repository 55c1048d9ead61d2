"""Image pyramid + separable Gaussian blur.

Reference: ORBextractor::ComputePyramid (src/ORBextractor.cc:1674-1734):
8 levels, scale factor 1.2, bilinear resize.  The reference's 19px replicated
border exists only to let OpenCV FAST/blur run to the edge; our dense kernels
handle borders via padding inside each op, so pyramid levels are stored
borderless.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def level_shapes(height: int, width: int, n_levels: int, scale: float) -> list[tuple[int, int]]:
    shapes = []
    for lv in range(n_levels):
        inv = 1.0 / (scale ** lv)
        shapes.append((int(round(height * inv)), int(round(width * inv))))
    return shapes


# --- conv-as-matmul -------------------------------------------------------
# Single-channel [1,1,H,W] convolutions and jax.image.resize lower terribly
# on TPU (no channel parallelism for the conv units; measured ~0.8ms per
# 320x240 conv).  Every separable stencil here is instead applied as
#   out = Rows @ img @ Cols^T
# with small STATIC banded matrices: two clean MXU matmuls per pass.

@functools.lru_cache(maxsize=None)
def _blur_matrix(n: int, ksize: int, sigma: float) -> np.ndarray:
    """[n, n] banded Gaussian with edge-replicate boundary folded in."""
    k = gaussian_kernel_1d(ksize, sigma).astype(np.float64)
    r = ksize // 2
    M = np.zeros((n, n), np.float64)
    for i in range(n):
        for dj, kv in zip(range(-r, r + 1), k):
            M[i, min(max(i + dj, 0), n - 1)] += kv
    return M.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _resize_matrix(n_out: int, n_in: int) -> np.ndarray:
    """[n_out, n_in] bilinear (half-pixel-center) resampling matrix,
    matching jax.image.resize(method='linear') semantics."""
    M = np.zeros((n_out, n_in), np.float64)
    s = n_in / n_out
    for i in range(n_out):
        x = (i + 0.5) * s - 0.5
        x = min(max(x, 0.0), n_in - 1.0)
        lo = int(np.floor(x))
        hi = min(lo + 1, n_in - 1)
        f = x - lo
        M[i, lo] += 1.0 - f
        M[i, hi] += f
    return M.astype(np.float32)


def resize_linear(image: jnp.ndarray, shape: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize via two banded matmuls (MXU-friendly).

    Accepts leading batch dims ([..., H, W]) — a frame batch resizes in one
    pair of batched matmuls."""
    h_in, w_in = image.shape[-2:]
    h_out, w_out = shape
    Rv = jnp.asarray(_resize_matrix(h_out, h_in))
    Rh = jnp.asarray(_resize_matrix(w_out, w_in))
    out = jnp.matmul(Rv, image, preferred_element_type=jnp.float32)
    return jnp.matmul(out, Rh.T, preferred_element_type=jnp.float32)


def build_pyramid(image: jnp.ndarray, n_levels: int, scale: float) -> list[jnp.ndarray]:
    """Grayscale [H, W] float32 -> list of n_levels arrays, level 0 = input.

    Also accepts a batch [B, H, W] -> list of [B, h, w] (same chained-resize
    semantics per frame; the banded matmuls batch over the leading dim)."""
    h, w = image.shape[-2:]
    shapes = level_shapes(h, w, n_levels, scale)
    levels = [image]
    for lv in range(1, n_levels):
        # Resize from the previous level (matches the reference's chained
        # resize, which low-passes progressively) with bilinear interpolation.
        levels.append(resize_linear(levels[-1], shapes[lv]))
    return levels


def gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(image: jnp.ndarray, ksize: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian with replicate padding, as two banded matmuls.

    Reference blurs each level with a 7x7 sigma=2 Gaussian before computing
    descriptors (src/ORBextractor.cc:1629-1643, BORDER_REFLECT_101 — we use
    edge-replicate; the boundary difference is confined to the outer 3px,
    outside the keypoint border margin).

    Accepts leading batch dims ([..., H, W]); a padded pyramid slab blurs in
    one pair of (batched) matmuls.  Levels inside a slab must be edge-
    replicate padded by >= 3px so the in-level boundary behavior matches the
    per-level banded matrices.
    """
    h, w = image.shape[-2:]
    Bv = jnp.asarray(_blur_matrix(h, ksize, sigma))
    Bh = jnp.asarray(_blur_matrix(w, ksize, sigma))
    out = jnp.matmul(Bv, image, preferred_element_type=jnp.float32)
    return jnp.matmul(out, Bh.T, preferred_element_type=jnp.float32)


def stack_slab(levels: list[jnp.ndarray]) -> jnp.ndarray:
    """Pad every level to level-0 size (edge-replicate) and stack: [L, H0, W0].

    Edge replication keeps the padding free of fake gradients (FAST sees a
    uniform field) and preserves in-level blur/descriptor values near each
    level's true bottom/right edge.
    """
    H0, W0 = levels[0].shape
    return jnp.stack([
        jnp.pad(l, ((0, H0 - l.shape[0]), (0, W0 - l.shape[1])), mode="edge")
        if l.shape != (H0, W0) else l
        for l in levels
    ])


def stack_slab_batch(levels: list[jnp.ndarray]) -> jnp.ndarray:
    """Batched stack_slab: list of [B, h, w] levels -> [B, L, H0, W0]."""
    H0, W0 = levels[0].shape[-2:]
    return jnp.stack([
        jnp.pad(l, ((0, 0), (0, H0 - l.shape[-2]), (0, W0 - l.shape[-1])),
                mode="edge")
        if l.shape[-2:] != (H0, W0) else l
        for l in levels
    ], axis=1)
