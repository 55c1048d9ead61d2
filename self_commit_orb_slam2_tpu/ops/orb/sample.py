"""Per-keypoint patch sampling: orientation + rotated BRIEF in one fused pass.

TPU-native redesign of the per-keypoint loops of IC_Angle and
computeOrbDescriptor (reference src/ORBextractor.cc:108-170, :173-230).
Random-access gathers are the slowest primitive on TPU (~8ns/element measured
on v5e); this module instead

  1. slices ONE aligned patch pair per keypoint — raw + blurred level image
     stacked into a [2, L, H0, W0] array so a single vmapped dynamic_slice
     fetches both — then
  2. resolves every sample position inside the patch with one-hot matmuls
     (build [N, S, PS] selector masks, contract on the MXU), which beats the
     equivalent gather ~6x.

Orientation moments come from the raw patch (reference runs IC_Angle on the
unblurred level, descriptors on the blurred one, src/ORBextractor.cc:1619-1643)
via the same disc-masked kernels as orientation.py; descriptor bits follow
brief.py's convention exactly (bit = I(a) < I(b)).

Exactness: keypoints carry a >= 16px in-level border (detect.py) and the
pyramid slab is edge-replicate padded (pyramid.stack_slab), so patch taps that
land past a level's true edge read replicated edge pixels — identical to the
per-level describe()'s clip-to-edge semantics.  The disc (radius 15) always
lies fully inside the 48-patch, so moments match the dense-map path bit-for-
bit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .brief_pattern import BIT_PATTERN_31
from .orientation import _DX, _DY, HALF_PATCH

PATCH = 48  # rotated BRIEF reach (measured <=19) + 3px blur halo + margins:
#             every tap row/col lies in [r-19-3, r+19+3] = [0, 44] of the
#             48-patch at r = 22, so interior taps see the pure blur kernel

# ONE-HOT selection matmuls run at 3-pass bf16 (Precision.HIGH): each output
# element has exactly one nonzero product x*1, and the 3-way bf16 split of an
# f32 reconstructs x to within 1 ulp in the f32 accumulator (measured effect:
# <= 3 of 256k descriptor bits and <5e-5 rad of angle vs the full-precision
# path — far below BRIEF's 50-bit matching threshold).  The package default
# (highest = 6-pass) doubles MXU passes on these selectors — the dominant
# extraction cost at 2000 features (round-4 profile: orient_and_describe
# 2.4 of 3.9 ms/frame at KITTI scale).  Blur/moment matmuls with REAL
# coefficients stay at the package default.
_SEL_PREC = jax.lax.Precision.HIGH

_PATTERN_XY = BIT_PATTERN_31.reshape(256, 2, 2).reshape(512, 2).astype(np.float32)
_BIT_WEIGHTS = (1 << np.arange(32, dtype=np.uint64)).astype(np.uint32)


def _patch_blur_matrix(ps: int, ksize: int = 7, sigma: float = 2.0) -> np.ndarray:
    """[ps, ps] banded separable-Gaussian matrix.  Interior rows are the pure
    7-tap kernel; the 3px edge rows fold out-of-range taps onto the edge
    element (replicate-pad semantics), so when a keypoint sits close enough
    to a level edge that clipped BRIEF taps read patch rows 0-2, the result
    matches blurring the replicate-padded slab tap-for-tap."""
    half = ksize // 2
    k = np.exp(-0.5 * ((np.arange(ksize) - half) / sigma) ** 2)
    k /= k.sum()
    B = np.zeros((ps, ps), np.float32)
    for i in range(ps):
        for j in range(ksize):
            B[i, min(max(i - half + j, 0), ps - 1)] += k[j]
    return B


def orient_and_describe(
    slab_raw: jnp.ndarray,
    xy: jnp.ndarray,
    level: jnp.ndarray,
):
    """Angles [N] and descriptors [N, 8] uint32 for all keypoints at once.

    slab_raw: [L, H0, W0] padded pyramid stack (see stack_slab).
    xy: [N, 2] level-LOCAL keypoint positions; level: [N] int32.

    The 7x7 sigma=2 Gaussian the reference applies before BRIEF
    (src/ORBextractor.cc:1629-1643) runs ON THE PATCH (two [ps, ps] banded
    matmuls) instead of over the full slab: the blurred image is only ever
    read at the <=N patch sites, so patch-local blur does ~12x less work
    and removes the second (blurred) slab fetch entirely.  Interior BRIEF
    taps (>= 3px inside the patch) see the pure 7-tap kernel; taps clipped
    to the patch edge (keypoints within ~26px of a level edge) see
    replicate-pad blur, matching stack_slab's replicate edge semantics.
    """
    L, H0, W0 = slab_raw.shape
    ps = PATCH
    assert H0 >= ps and W0 >= ps, "image smaller than the sampling patch"
    iota = jnp.arange(ps, dtype=jnp.int32)

    r = ps // 2 - 2
    x0 = jnp.clip(xy[:, 0].astype(jnp.int32) - r, 0, W0 - ps)
    y0 = jnp.clip(xy[:, 1].astype(jnp.int32) - r, 0, H0 - ps)

    # Patch fetch: vmapped dynamic_slice lowers to a SEQUENTIAL per-keypoint
    # while loop on TPU (one tiny fused slice per keypoint — measured
    # ~0.6ms/frame at N=512).  A row gather is ONE vectorized op: fetch the
    # ps patch rows (rows are contiguous 128-lane reads), then select the ps
    # columns with a one-hot matmul on the MXU.
    #
    # The rows are gathered from a COLUMN-BLOCKED copy of the slab (width-BW
    # windows on a 32-px stride): fetching full W0-wide rows and one-hot
    # selecting over W0 moved ~N*ps*W0 floats per frame; block-local rows
    # cut the gather and the selector to width BW (~7x less HBM traffic for
    # the same exact result).
    N = xy.shape[0]
    STRIDE = 128 - PATCH
    BW = STRIDE + ps  # = 128: gather rows are exactly one TPU lane-width
    # every reachable block index blk = x0 // STRIDE with x0 <= W0 - ps must
    # have a window: nb = blk_max + 1 (widths ≡ 24 mod 32 used to compute one
    # block too few, wrapping right-edge patches into the next image row)
    nb = max(W0 - ps, 0) // STRIDE + 1
    big2d = slab_raw.reshape(L * H0, W0)
    padded = jnp.pad(big2d, ((0, 0), (0, STRIDE * (nb - 1) + BW - W0)))
    # [LH0, nb, BW] strided windows -> [LH0 * nb, BW]
    blocks = jnp.stack(
        [padded[:, b * STRIDE : b * STRIDE + BW] for b in range(nb)], axis=1
    ).reshape(-1, BW)
    blk = x0 // STRIDE                                   # [N]
    off = x0 - blk * STRIDE                              # [N] in [0, STRIDE)
    rowidx = (level[:, None] * H0 + y0[:, None] + iota[None, :]) * nb \
        + blk[:, None]                                   # [N, ps]
    rows = jnp.take(blocks, rowidx.reshape(-1), axis=0).reshape(N, ps, BW)
    colsel = (
        jnp.arange(BW, dtype=jnp.int32)[None, :, None]
        == (off[:, None, None] + iota[None, None, :])
    ).astype(jnp.float32)                                # [N, BW, ps]
    raw = jnp.einsum("npw,nwq->npq", rows, colsel,
                     precision=_SEL_PREC)                # [N, ps, ps]

    # patch-local blur (reads confined to >=3px inside the patch)
    Bm = jnp.asarray(_patch_blur_matrix(ps))
    blur = jnp.einsum("ij,njk->nik", Bm, raw)
    blur = jnp.einsum("nik,lk->nil", blur, Bm)

    # --- orientation: 31x31 disc moments from the raw patch --------------
    d = jnp.arange(-HALF_PATCH, HALF_PATCH + 1, dtype=jnp.int32)
    oy = (xy[:, 1].astype(jnp.int32) - y0)[:, None] + d[None, :]  # [N, 31]
    ox = (xy[:, 0].astype(jnp.int32) - x0)[:, None] + d[None, :]
    U = (oy[:, :, None] == iota).astype(jnp.float32)  # [N, 31, ps]
    V = (ox[:, :, None] == iota).astype(jnp.float32)
    t = jnp.einsum("nip,npq->niq", U, raw, precision=_SEL_PREC)
    p31 = jnp.einsum("niq,njq->nij", t, V,
                     precision=_SEL_PREC)             # [N, 31, 31]
    m10 = jnp.sum(p31 * jnp.asarray(_DX), axis=(1, 2))
    m01 = jnp.sum(p31 * jnp.asarray(_DY), axis=(1, 2))
    angle = jnp.arctan2(m01, m10)

    # --- rotated BRIEF from the blurred patch ----------------------------
    px = jnp.asarray(_PATTERN_XY[:, 0])[None, :]
    py = jnp.asarray(_PATTERN_XY[:, 1])[None, :]
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    rx = jnp.round(px * ca[:, None] - py * sa[:, None])
    ry = jnp.round(px * sa[:, None] + py * ca[:, None])
    lx = jnp.clip((xy[:, 0:1] + rx).astype(jnp.int32) - x0[:, None], 0, ps - 1)
    ly = jnp.clip((xy[:, 1:2] + ry).astype(jnp.int32) - y0[:, None], 0, ps - 1)
    Us = (ly[:, :, None] == iota).astype(jnp.float32)  # [N, 512, ps]
    Vs = (lx[:, :, None] == iota).astype(jnp.float32)
    ts = jnp.einsum("nsp,npq->nsq", Us, blur, precision=_SEL_PREC)
    samples = jnp.sum(ts * Vs, axis=-1)                # [N, 512]

    a = samples[:, 0::2]
    b = samples[:, 1::2]
    bits = (a < b).astype(jnp.uint32)
    words = bits.reshape(-1, 8, 32)
    desc = jnp.sum(
        words * jnp.asarray(_BIT_WEIGHTS)[None, None, :], axis=-1
    ).astype(jnp.uint32)
    return angle, desc
