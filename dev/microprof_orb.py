#!/usr/bin/env python
"""In-graph micro-profiler for ORB extraction sub-stages."""

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
from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig, extract

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
    width, height = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (320, 240)
    cfg = OrbConfig(n_features=500)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (height, width)).astype(np.float32))
    print("backend:", jax.devices()[0], f" image {width}x{height}")

    scan_time("extract (all)", functools.partial(extract, config=cfg), img)
    scan_time("build_pyramid", pyramid.build_pyramid, img, cfg.n_levels, cfg.scale_factor)

    levels = jax.jit(functools.partial(
        pyramid.build_pyramid, n_levels=cfg.n_levels, scale=cfg.scale_factor
    ))(img)
    budgets = cfg.level_budgets()

    def fast_all():
        return [fast.nms3x3(fast.fast_response(l, cfg.fast_threshold_hi)) for l in levels] + \
               [fast.nms3x3(fast.fast_response(l, cfg.fast_threshold_lo)) for l in levels]
    scan_time("FAST hi+lo+NMS all levels", fast_all)

    his = jax.jit(lambda: [fast.nms3x3(fast.fast_response(l, cfg.fast_threshold_hi)) for l in levels])()
    los = jax.jit(lambda: [fast.nms3x3(fast.fast_response(l, cfg.fast_threshold_lo)) for l in levels])()

    def select_all():
        return [detect.select_keypoints(h, l, b, cell=cfg.cell_size, border=cfg.border)
                for h, l, b in zip(his, los, budgets)]
    scan_time("select_keypoints all levels", select_all)

    kps = jax.jit(select_all)()

    def angles_all():
        return [orientation.keypoint_angles(im, kp.xy) for im, kp in zip(levels, kps)]
    scan_time("keypoint_angles all levels", angles_all)

    def blur_all():
        return [pyramid.gaussian_blur(l) for l in levels]
    scan_time("gaussian_blur all levels", blur_all)

    blurred = jax.jit(blur_all)()
    angs = jax.jit(angles_all)()

    def describe_all():
        return [brief.describe(b, kp.xy, a) for b, kp, a in zip(blurred, kps, angs)]
    scan_time("brief.describe all levels", describe_all)


if __name__ == "__main__":
    main()
