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

from . import brief, detect, fast, orientation, pyramid


class OrbConfig(NamedTuple):
    n_features: int = 1000
    n_levels: int = 8
    scale_factor: float = 1.2
    fast_threshold_hi: float = 20.0  # reference iniThFAST
    fast_threshold_lo: float = 7.0   # reference minThFAST
    cell_size: int = 16
    border: int = 16
    # Fused Pallas FAST+NMS kernel (ops/orb/fast_pallas.py).  Device-time
    # equal to the XLA formulation on v5e; enable on locally-attached TPUs.
    # Off by default because a remote-attached (tunneled) TPU pays ~10ms per
    # embedded custom call per DISPATCH, which hurts per-frame (non-scan)
    # mode; inside lax.scan batches it costs nothing either way.
    use_pallas_fast: bool = False

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


def extract(image: jnp.ndarray, config: OrbConfig) -> OrbFeatures:
    """Extract ORB features from a grayscale [H, W] float32 image (0..255)."""
    levels = pyramid.build_pyramid(image, config.n_levels, config.scale_factor)
    budgets = config.level_budgets()
    scales = config.scale_factors()

    use_pallas = config.use_pallas_fast and jax.default_backend() == "tpu"
    all_xy, all_resp, all_angle, all_level, all_desc, all_valid = [], [], [], [], [], []
    for lv, img in enumerate(levels):
        if use_pallas:
            from . import fast_pallas

            hi, lo = fast_pallas.fast_nms_hi_lo(
                img, config.fast_threshold_hi, config.fast_threshold_lo
            )
        else:
            hi = fast.nms3x3(fast.fast_response(img, config.fast_threshold_hi))
            lo = fast.nms3x3(fast.fast_response(img, config.fast_threshold_lo))
        kps = detect.select_keypoints(
            hi, lo, budgets[lv], cell=config.cell_size, border=config.border
        )
        ang = orientation.keypoint_angles(img, kps.xy)
        blurred = pyramid.gaussian_blur(img)
        desc = brief.describe(blurred, kps.xy, ang)
        all_xy.append(kps.xy * scales[lv])
        all_resp.append(kps.response)
        all_angle.append(ang)
        all_level.append(jnp.full(budgets[lv], lv, jnp.int32))
        all_desc.append(desc)
        all_valid.append(kps.valid)

    # pad capacity to a multiple of the 128-lane TPU vector width: every
    # downstream [K, N]-shaped matching/BA tensor inherits this dimension, and
    # an unaligned N forces XLA into scalarized scatter/gather lowerings
    # (measured 29.6ms -> 0.9ms for the local-BA step at N=500 vs 512).
    pad = config.feat_capacity() - sum(budgets)
    feats = OrbFeatures(
        xy=jnp.concatenate(all_xy),
        response=jnp.concatenate(all_resp),
        angle=jnp.concatenate(all_angle),
        level=jnp.concatenate(all_level),
        desc=jnp.concatenate(all_desc),
        valid=jnp.concatenate(all_valid),
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
    return feats


def build_extractor(config: OrbConfig):
    """Returns a jitted extract(image) -> OrbFeatures closure."""
    return jax.jit(functools.partial(extract, config=config))
