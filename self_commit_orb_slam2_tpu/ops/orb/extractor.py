"""End-to-end ORB extraction: pyramid -> FAST -> select -> orient -> describe.

TPU-native counterpart of ORBextractor::operator() (reference
src/ORBextractor.cc:1544-1668).  One jit-compiled function processes all 8
pyramid levels (statically unrolled — each level has its own static shape)
and emits fixed-capacity keypoint arrays with validity masks.

Output coordinate convention matches the reference: keypoint xy is scaled back
to level-0 pixels (src/ORBextractor.cc:1652-1664), `octave` = pyramid level,
and per-level sigma^2 = scale^(2*level) is exposed for chi2 weighting.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import brief, detect, fast, orientation, pyramid, sample


class OrbConfig(NamedTuple):
    n_features: int = 1000
    n_levels: int = 8
    scale_factor: float = 1.2
    fast_threshold_hi: float = 20.0  # reference iniThFAST
    fast_threshold_lo: float = 7.0   # reference minThFAST
    cell_size: int = 16
    border: int = 16
    # Fused Pallas FAST+NMS kernel (ops/orb/fast_pallas.py).  With the
    # all-levels slab there is ONE kernel call per frame (both thresholds +
    # NMS with the image tile in VMEM): at 640x480 it cuts full extraction
    # 4.9 -> 3.2 ms/frame on v5e (round-3 measurement, dev/prof_orb_ref.py).
    # Ignored off-TPU (the XLA formulation runs everywhere).
    use_pallas_fast: bool = True

    def level_budgets(self) -> list[int]:
        """Geometric per-level feature budget (reference ctor :539-554)."""
        f = 1.0 / self.scale_factor
        n_first = self.n_features * (1 - f) / (1 - f**self.n_levels)
        budgets = []
        acc = 0
        for lv in range(self.n_levels - 1):
            b = int(round(n_first * f**lv))
            budgets.append(b)
            acc += b
        budgets.append(max(self.n_features - acc, 0))
        return budgets

    def feat_capacity(self) -> int:
        """Feature array capacity: budget rounded up to the 128-lane width."""
        cap = sum(self.level_budgets())
        return cap + (-cap) % 128

    def scale_factors(self) -> np.ndarray:
        return self.scale_factor ** np.arange(self.n_levels, dtype=np.float32)

    def sigma2(self) -> np.ndarray:
        return self.scale_factors() ** 2


class OrbFeatures(NamedTuple):
    """Fixed-capacity feature set for one image (capacity = sum of budgets)."""

    xy: jnp.ndarray        # [N, 2] float32, level-0 pixel coords (distorted)
    response: jnp.ndarray  # [N] float32
    angle: jnp.ndarray     # [N] float32 radians
    level: jnp.ndarray     # [N] int32 pyramid octave
    desc: jnp.ndarray      # [N, 8] uint32 (256-bit)
    valid: jnp.ndarray     # [N] bool

    @property
    def capacity(self) -> int:
        return self.xy.shape[0]


def _stacked_features(slab: jnp.ndarray, budgets_g: list[int],
                      dims_g: list[tuple[int, int]], config: OrbConfig):
    """FAST + NMS + selection + orientation/BRIEF over a stacked slab.

    slab: [G, H0, W0] where G is any stacking of pyramid levels — one frame's
    L levels, a stereo pair's 2L, or a whole frame batch's B*L.  budgets_g /
    dims_g describe each of the G slices.  Shared by extract / extract_pair /
    extract_batch so every caller runs ONE kernel chain regardless of how
    many frames are stacked."""
    G, H0, W0 = slab.shape
    use_pallas = config.use_pallas_fast and jax.default_backend() == "tpu"
    if use_pallas and config.cell_size == 16:
        from . import fast_pallas

        # one fused kernel over the slices stacked tall (cross-slice halo
        # bleed is confined to the replicate-padded gap and killed by the
        # in-kernel border mask): FAST both thresholds + NMS + per-level
        # border mask + 16-row band max — full score maps never reach HBM.
        # Slices are padded to a 16-multiple height so bands stay in-slice.
        H0p = H0 + (-H0) % 16
        if H0p != H0:
            slab = jnp.pad(slab, ((0, 0), (0, H0p - H0), (0, 0)), mode="edge")
        hi_max, hi_arg, lo_max, lo_arg = fast_pallas.fast_nms_bands_hi_lo(
            slab.reshape(G * H0p, W0),
            config.fast_threshold_hi, config.fast_threshold_lo,
            H0p, tuple(dims_g[:config.n_levels]), config.border,
            config.n_levels,
        )
        kps = detect.select_keypoints_bands(
            hi_max, hi_arg, lo_max, lo_arg, budgets_g, G, H0p
        )
    elif use_pallas:
        from . import fast_pallas

        hi2, lo2 = fast_pallas.fast_nms_hi_lo(
            slab.reshape(G * H0, W0),
            config.fast_threshold_hi, config.fast_threshold_lo,
        )
        hi = hi2.reshape(G, H0, W0)
        lo = lo2.reshape(G, H0, W0)
        kps = detect.select_keypoints_slab(
            hi, lo, budgets_g, dims_g, cell=config.cell_size,
            border=config.border
        )
    else:
        hi = fast.nms3x3(fast.fast_response(slab, config.fast_threshold_hi))
        lo = fast.nms3x3(fast.fast_response(slab, config.fast_threshold_lo))
        kps = detect.select_keypoints_slab(
            hi, lo, budgets_g, dims_g, cell=config.cell_size,
            border=config.border
        )
    if H0 >= sample.PATCH and W0 >= sample.PATCH:
        # fused patch path: row-gather + one-hot matmul sampling with
        # PATCH-LOCAL blur (the full-slab Gaussian is only ever read at the
        # patch sites, so it is skipped entirely)
        ang, desc = sample.orient_and_describe(slab, kps.xy, kps.level)
    else:  # tiny images: plain gather fallback
        blurred = pyramid.gaussian_blur(slab)
        ang = orientation.keypoint_angles_slab(slab, kps.xy, kps.level)
        desc = brief.describe_slab(blurred, kps.xy, kps.level, ang, dims_g)
    return kps, ang, desc


def extract(image: jnp.ndarray, config: OrbConfig,
            return_slab: bool = False):
    """Extract ORB features from a grayscale [H, W] float32 image (0..255).

    All-levels-batched design: the pyramid is padded into ONE [L, H0, W0]
    slab, so FAST + NMS + selection + blur each run as a single batched op
    chain, and orientation/BRIEF sample every keypoint of every level in one
    gather.  On a latency-bound TPU per-frame step this replaces ~8 serial
    per-level chains with one (measured 2.7ms -> ~1ms at 320x240/500feat).

    return_slab=True additionally returns the padded [L, H0, W0] pyramid
    slab (consumers like the stereo SAD matcher reuse it instead of
    rebuilding the pyramid).
    """
    levels = pyramid.build_pyramid(image, config.n_levels, config.scale_factor)
    budgets = config.level_budgets()
    scales = jnp.asarray(config.scale_factors())
    level_dims = [tuple(l.shape) for l in levels]

    slab = pyramid.stack_slab(levels)  # [L, H0, W0]
    kps, ang, desc = _stacked_features(slab, budgets, level_dims, config)

    # pad capacity to a multiple of the 128-lane TPU vector width: every
    # downstream [K, N]-shaped matching/BA tensor inherits this dimension, and
    # an unaligned N forces XLA into scalarized scatter/gather lowerings
    # (measured 29.6ms -> 0.9ms for the local-BA step at N=500 vs 512).
    pad = config.feat_capacity() - sum(budgets)
    feats = OrbFeatures(
        xy=kps.xy * scales[kps.level][:, None],
        response=kps.response,
        angle=ang,
        level=kps.level,
        desc=desc,
        valid=kps.valid,
    )
    if pad:
        feats = OrbFeatures(
            xy=jnp.pad(feats.xy, ((0, pad), (0, 0))),
            response=jnp.pad(feats.response, (0, pad)),
            angle=jnp.pad(feats.angle, (0, pad)),
            level=jnp.pad(feats.level, (0, pad)),
            desc=jnp.pad(feats.desc, ((0, pad), (0, 0))),
            valid=jnp.pad(feats.valid, (0, pad)),  # padding stays invalid
        )
    if return_slab:
        return feats, slab
    return feats


def extract_pair(image_l: jnp.ndarray, image_r: jnp.ndarray,
                 config: OrbConfig):
    """ORB extraction for BOTH stereo eyes through ONE kernel chain.

    The two pyramids stack into a single [2L, H0, W0] slab, so FAST + NMS +
    selection + blur + orientation/BRIEF each run once at double batch
    instead of twice (the reference runs the two eyes in two std::threads,
    Frame.cc:108-237; here the batch axis is the parallelism).  Returns
    (feats_l, feats_r, slab_l, slab_r) — the slabs feed the stereo SAD
    matcher."""
    L = config.n_levels
    budgets = config.level_budgets()
    scales = jnp.asarray(config.scale_factors())
    levels_l = pyramid.build_pyramid(image_l, L, config.scale_factor)
    levels_r = pyramid.build_pyramid(image_r, L, config.scale_factor)
    level_dims = [tuple(l.shape) for l in levels_l]
    slab_l = pyramid.stack_slab(levels_l)
    slab_r = pyramid.stack_slab(levels_r)
    slab = jnp.concatenate([slab_l, slab_r])          # [2L, H0, W0]

    kps, ang, desc = _stacked_features(slab, budgets * 2, level_dims * 2,
                                       config)

    capL = sum(budgets)
    pad = config.feat_capacity() - capL

    def split(sl):
        lvl = kps.level[sl] % L
        f = OrbFeatures(
            xy=kps.xy[sl] * scales[lvl][:, None],
            response=kps.response[sl],
            angle=ang[sl],
            level=lvl,
            desc=desc[sl],
            valid=kps.valid[sl],
        )
        if pad:
            f = OrbFeatures(
                xy=jnp.pad(f.xy, ((0, pad), (0, 0))),
                response=jnp.pad(f.response, (0, pad)),
                angle=jnp.pad(f.angle, (0, pad)),
                level=jnp.pad(f.level, (0, pad)),
                desc=jnp.pad(f.desc, ((0, pad), (0, 0))),
                valid=jnp.pad(f.valid, (0, pad)),
            )
        return f

    feats_l = split(slice(0, capL))
    feats_r = split(slice(capL, 2 * capL))
    return feats_l, feats_r, slab_l, slab_r


def extract_batch(images: jnp.ndarray, config: OrbConfig):
    """ORB extraction for a whole FRAME BATCH through one kernel chain.

    images: [B, H, W] grayscale float32.  All B pyramids stack into a single
    [B*L, H0, W0] slab, so FAST + NMS + selection + orientation/BRIEF each
    run ONCE at B-fold batch — this is how the chunked streaming pipeline
    (models/pipeline.py) amortizes per-op dispatch and fills the TPU: frame
    construction has no sequential dependency between frames, only tracking
    does (the reference interleaves them because each CPU frame is serial
    anyway, src/Frame.cc:108-237).

    Returns (OrbFeatures with leading batch dim [B, N, ...],
    slab [B, L, H0, W0]) — slabs feed the batched stereo SAD matcher.
    """
    B = images.shape[0]
    L = config.n_levels
    budgets = config.level_budgets()
    scales = jnp.asarray(config.scale_factors())
    levels = pyramid.build_pyramid(images, L, config.scale_factor)
    level_dims = [tuple(l.shape[-2:]) for l in levels]
    H0, W0 = level_dims[0]
    slab = pyramid.stack_slab_batch(levels)           # [B, L, H0, W0]

    kps, ang, desc = _stacked_features(
        slab.reshape(B * L, H0, W0), budgets * B, level_dims * B, config
    )

    capL = sum(budgets)
    pad = config.feat_capacity() - capL
    lvl = kps.level % L   # stacked slice index (b*L + l) -> octave

    def rs(x):
        x = x.reshape(B, capL, *x.shape[1:])
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))
        return x

    feats = OrbFeatures(
        xy=rs(kps.xy * scales[lvl][:, None]),
        response=rs(kps.response),
        angle=rs(ang),
        level=rs(lvl),
        desc=rs(desc),
        valid=rs(kps.valid),
    )
    return feats, slab


def build_extractor(config: OrbConfig):
    """Returns a jitted extract(image) -> OrbFeatures closure."""
    return jax.jit(functools.partial(extract, config=config))
