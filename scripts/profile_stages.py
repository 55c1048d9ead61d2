#!/usr/bin/env python
"""Per-stage TPU timing: extraction, motion track, local-map track, mapping.

Times each jitted sub-function of the fused step in isolation on the real
backend to locate the per-frame cost (bench.py showed ~40ms/frame batched).
"""

import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from self_commit_orb_slam2_tpu.models import frame as frame_mod
from self_commit_orb_slam2_tpu.models import map_state as ms
from self_commit_orb_slam2_tpu.models import pipeline, tracking, local_mapping
from self_commit_orb_slam2_tpu.models.config import Capacities, SlamConfig, TrackingConfig
from self_commit_orb_slam2_tpu.models.system import System
from self_commit_orb_slam2_tpu.ops.camera import CameraParams
from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig
from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence


def timeit(name, fn, *args, n=20, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:32s} {dt:8.2f} ms")
    return out


def main():
    import argparse
    width = int(os.environ.get("PW", 320)); height = int(os.environ.get("PH", 240))
    nfeat = int(os.environ.get("PF", 500))
    fx = 260.0 * width / 320
    seq = generate_sequence(n_frames=8, width=width, height=height, seed=5)
    cam = CameraParams.create(fx=fx, fy=fx, cx=width / 2, cy=height / 2,
                              bf=fx * 0.1, width=width, height=height)
    cfg = SlamConfig(camera=cam, orb=OrbConfig(n_features=nfeat),
                     caps=Capacities(max_keyframes=64, max_points=16384,
                                     local_points=1024),
                     tracking=TrackingConfig(max_frames_between_kf=10),
                     sensor="rgbd")

    print("backend:", jax.devices()[0], f"{width}x{height}/{nfeat}feat")
    img = jnp.asarray(seq.images[0].astype(np.float32))
    dep = jnp.asarray(seq.depths[0].astype(np.float32))

    mk = jax.jit(functools.partial(frame_mod.make_frame_rgbd, cfg))
    frame = timeit("make_frame_rgbd", mk, img, dep)

    # build a small live map via the System to get realistic state
    slam = System(cfg)
    slam.track_batch_rgbd(seq.images[:8], seq.depths[:8], seq.timestamps[:8])
    m = slam.map
    carry = slam.carry

    tm = jax.jit(functools.partial(tracking.track_motion, cfg))
    timeit("track_motion", tm, m, frame, carry.Tcw, carry.velocity,
           carry.last_frame, carry.last_obs_pt, jnp.float32(7.0))

    res = tm(m, frame, carry.Tcw, carry.velocity, carry.last_frame,
             carry.last_obs_pt, jnp.float32(7.0))
    tl = jax.jit(functools.partial(tracking.track_local_map, cfg))
    timeit("track_local_map", tl, m, frame, res.Tcw, res.obs_pt)

    ck = jax.jit(functools.partial(tracking.create_keyframe, cfg))
    lres = tl(m, frame, res.Tcw, res.obs_pt)
    m2, kf_id = timeit("create_keyframe", ck, m, frame, lres.Tcw, lres.obs_pt,
                       carry.frame_id, jnp.float32(0.0))

    mp = jax.jit(functools.partial(local_mapping._process, cfg))
    timeit("local_mapping._process", mp, m2, kf_id, n=5)

    step = jax.jit(functools.partial(pipeline.step_rgbd, cfg))
    timeit("full step_rgbd (no scan)", step, m, carry, img, dep,
           jnp.float32(0.0))


if __name__ == "__main__" and "--mapping" not in sys.argv:
    main()


def profile_mapping():
    width = int(os.environ.get("PW", 320)); height = int(os.environ.get("PH", 240))
    nfeat = int(os.environ.get("PF", 500))
    fx = 260.0 * width / 320
    seq = generate_sequence(n_frames=8, width=width, height=height, seed=5)
    cam = CameraParams.create(fx=fx, fy=fx, cx=width / 2, cy=height / 2,
                              bf=fx * 0.1, width=width, height=height)
    cfg = SlamConfig(camera=cam, orb=OrbConfig(n_features=nfeat),
                     caps=Capacities(max_keyframes=64, max_points=16384,
                                     local_points=1024),
                     tracking=TrackingConfig(max_frames_between_kf=10),
                     sensor="rgbd")
    slam = System(cfg)
    slam.track_batch_rgbd(seq.images[:8], seq.depths[:8], seq.timestamps[:8])
    m = slam.map
    kf_id = jnp.int32(int(np.asarray(m.n_kf)) - 1)
    for name in ["cull_points", "create_new_points", "fuse_into_keyframe",
                 "refresh_observed_points", "local_bundle_adjustment",
                 "cull_keyframes"]:
        fn = jax.jit(functools.partial(getattr(local_mapping, name), cfg))
        timeit(name, fn, m, kf_id, n=10)


if __name__ == "__main__" and "--mapping" in sys.argv:
    profile_mapping()
