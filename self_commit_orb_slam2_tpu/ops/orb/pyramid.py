"""Image pyramid + separable Gaussian blur.

Reference: ORBextractor::ComputePyramid (src/ORBextractor.cc:1674-1734):
8 levels, scale factor 1.2, bilinear resize.  The reference's 19px replicated
border exists only to let OpenCV FAST/blur run to the edge; our dense kernels
handle borders via padding inside each op, so pyramid levels are stored
borderless.
"""

from __future__ import annotations

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


def build_pyramid(image: jnp.ndarray, n_levels: int, scale: float) -> list[jnp.ndarray]:
    """Grayscale [H, W] float32 -> list of n_levels arrays, level 0 = input."""
    h, w = image.shape
    shapes = level_shapes(h, w, n_levels, scale)
    levels = [image]
    for lv in range(1, n_levels):
        # Resize from the previous level (matches the reference's chained
        # resize, which low-passes progressively) with bilinear interpolation.
        levels.append(
            jax.image.resize(levels[-1], shapes[lv], method="linear")
        )
    return levels


def gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(image: jnp.ndarray, ksize: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian with replicate padding.

    Reference blurs each level with a 7x7 sigma=2 Gaussian before computing
    descriptors (src/ORBextractor.cc:1629-1643, BORDER_REFLECT_101 — we use
    edge-replicate; the boundary difference is confined to the outer 3px,
    outside the keypoint border margin).
    """
    k = jnp.asarray(gaussian_kernel_1d(ksize, sigma))
    r = ksize // 2
    padded = jnp.pad(image, ((r, r), (0, 0)), mode="edge")
    # Vertical pass: correlate along rows.
    img4 = padded[None, None, :, :]
    kern_v = k.reshape(1, 1, ksize, 1)
    out = jax.lax.conv_general_dilated(img4, kern_v, (1, 1), "VALID")
    padded = jnp.pad(out[0, 0], ((0, 0), (r, r)), mode="edge")
    img4 = padded[None, None, :, :]
    kern_h = k.reshape(1, 1, 1, ksize)
    out = jax.lax.conv_general_dilated(img4, kern_h, (1, 1), "VALID")
    return out[0, 0]
