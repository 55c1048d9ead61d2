#!/usr/bin/env python
"""ORB extraction sub-phase profile at 640x480 on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from self_commit_orb_slam2_tpu.ops.orb import (
    brief, detect, fast, orientation, pyramid, sample,
)
from self_commit_orb_slam2_tpu.ops.orb import extractor as orb_ext
from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig
from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence

R = 20
width, height, fx, nfeat = 640, 480, 520.0, 1000
seq = generate_sequence(n_frames=2, width=width, height=height, fx=fx, seed=5)
img = jnp.asarray(seq.images[-1])
cfg = OrbConfig(n_features=nfeat)
print("backend:", jax.devices()[0])


def scan_time(name, fn):
    def body(acc, _):
        out = fn()
        s = sum(jnp.sum(x.astype(jnp.float32))
                for x in jax.tree_util.tree_leaves(out))
        return acc + s * 1e-30, None

    g = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0.0), None, length=R)[0])
    jax.block_until_ready(g())
    t0 = time.perf_counter()
    jax.block_until_ready(g())
    dt = (time.perf_counter() - t0) / R * 1e3
    print(f"{name:44s} {dt:8.3f} ms", flush=True)
    return dt


levels = pyramid.build_pyramid(img, cfg.n_levels, cfg.scale_factor)
level_dims = [tuple(l.shape) for l in levels]
slab = jax.jit(lambda im: pyramid.stack_slab(
    pyramid.build_pyramid(im, cfg.n_levels, cfg.scale_factor)))(img)
slab = jax.block_until_ready(slab)
budgets = cfg.level_budgets()

scan_time("pyramid build + slab", lambda: pyramid.stack_slab(
    pyramid.build_pyramid(img, cfg.n_levels, cfg.scale_factor)))
scan_time("FAST hi (response+nms)", lambda: fast.nms3x3(
    fast.fast_response(slab, cfg.fast_threshold_hi)))
scan_time("FAST hi+lo", lambda: (
    fast.nms3x3(fast.fast_response(slab, cfg.fast_threshold_hi)),
    fast.nms3x3(fast.fast_response(slab, cfg.fast_threshold_lo))))

try:
    from self_commit_orb_slam2_tpu.ops.orb import fast_pallas
    L, H0, W0 = slab.shape
    scan_time("FAST hi+lo PALLAS fused", lambda: fast_pallas.fast_nms_hi_lo(
        slab.reshape(L * H0, W0), cfg.fast_threshold_hi, cfg.fast_threshold_lo))
except Exception as e:
    print("pallas failed:", repr(e))

hi = jax.jit(lambda s: fast.nms3x3(fast.fast_response(s, cfg.fast_threshold_hi)))(slab)
lo = jax.jit(lambda s: fast.nms3x3(fast.fast_response(s, cfg.fast_threshold_lo)))(slab)
hi, lo = jax.block_until_ready((hi, lo))

scan_time("select_keypoints_slab", lambda: detect.select_keypoints_slab(
    hi, lo, budgets, level_dims, cell=cfg.cell_size, border=cfg.border))
kps = jax.jit(lambda: detect.select_keypoints_slab(
    hi, lo, budgets, level_dims, cell=cfg.cell_size, border=cfg.border))()
kps = jax.block_until_ready(kps)

scan_time("gaussian blur slab", lambda: pyramid.gaussian_blur(slab))
blurred = jax.block_until_ready(jax.jit(pyramid.gaussian_blur)(slab))

scan_time("orient_and_describe (patch blur)",
          lambda: sample.orient_and_describe(slab, kps.xy, kps.level))

scan_time("FULL extract (XLA fast)", lambda: orb_ext.extract(img, cfg))
cfg_p = cfg._replace(use_pallas_fast=True)
scan_time("FULL extract (pallas fast)", lambda: orb_ext.extract(img, cfg_p))
