#!/usr/bin/env python
"""Bisect the slab extraction stages in-graph."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from self_commit_orb_slam2_tpu.ops.orb import (
    brief, detect, fast, orientation, pyramid,
)
from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig

R = 30


def scan_time(name, fn, *args):
    def body(acc, _):
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        s = sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
        return acc + s * 1e-30, None

    g = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0.0), None, length=R)[0])
    g()
    out = g()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = g()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / R * 1e3
    print(f"{name:44s} {dt:8.3f} ms")
    return dt


def main():
    width, height = 320, 240
    cfg = OrbConfig(n_features=500)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (height, width)).astype(np.float32))
    print("backend:", jax.devices()[0])

    levels = jax.jit(functools.partial(
        pyramid.build_pyramid, n_levels=cfg.n_levels, scale=cfg.scale_factor))(img)
    level_dims = [tuple(l.shape) for l in levels]
    budgets = cfg.level_budgets()

    scan_time("stack_slab", pyramid.stack_slab, levels)
    slab = jax.jit(pyramid.stack_slab)(levels)

    scan_time("fast hi+lo slab", lambda s: (
        fast.nms3x3(fast.fast_response(s, cfg.fast_threshold_hi)),
        fast.nms3x3(fast.fast_response(s, cfg.fast_threshold_lo))), slab)
    hi, lo = jax.jit(lambda s: (
        fast.nms3x3(fast.fast_response(s, cfg.fast_threshold_hi)),
        fast.nms3x3(fast.fast_response(s, cfg.fast_threshold_lo))))(slab)

    sel = functools.partial(detect.select_keypoints_slab, budgets=budgets,
                            level_dims=level_dims, cell=cfg.cell_size,
                            border=cfg.border)
    scan_time("select_keypoints_slab", sel, hi, lo)
    kps = jax.jit(sel)(hi, lo)

    scan_time("keypoint_angles_slab", orientation.keypoint_angles_slab,
              slab, kps.xy, kps.level)
    ang = jax.jit(orientation.keypoint_angles_slab)(slab, kps.xy, kps.level)

    scan_time("gaussian_blur slab", pyramid.gaussian_blur, slab)
    blurred = jax.jit(pyramid.gaussian_blur)(slab)

    scan_time("describe_slab", functools.partial(
        brief.describe_slab, level_dims=level_dims), blurred, kps.xy, kps.level, ang)


if __name__ == "__main__":
    main()
