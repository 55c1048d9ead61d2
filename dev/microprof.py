#!/usr/bin/env python
"""In-graph micro-profiler: times sub-stages scan-amortized on the real TPU.

Each stage is wrapped in a lax.scan of R repetitions inside ONE jit, so
dispatch/tunnel overhead is paid once and the per-iteration time is the true
in-graph cost (what the batched pipeline actually pays per frame).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from self_commit_orb_slam2_tpu.models import frame as frame_mod
from self_commit_orb_slam2_tpu.models import local_mapping, pipeline, tracking
from self_commit_orb_slam2_tpu.models.config import (
    Capacities, SlamConfig, TrackingConfig,
)
from self_commit_orb_slam2_tpu.models.system import System
from self_commit_orb_slam2_tpu.ops.camera import CameraParams
from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig
from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence

R = 30


def scan_time(name, fn, *args):
    """Time fn(*args) -> pytree, repeated R times inside one jit via scan.
    fn must return something whose structure does not feed back; we thread a
    float accumulator derived from the output to serialize iterations."""

    def body(acc, _):
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        s = sum(jnp.sum(x).astype(jnp.float32) if x.dtype != jnp.bool_
                else jnp.sum(x.astype(jnp.float32)) for x in leaves)
        return acc + s * 1e-30, None

    g = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0.0), None, length=R)[0])
    g()  # compile
    out = g()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = g()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / R * 1e3
    print(f"{name:40s} {dt:8.3f} ms")
    return dt


def main():
    width, height, fx = 320, 240, 260.0
    seq = generate_sequence(n_frames=8, width=width, height=height, seed=5)
    cam = CameraParams.create(fx=fx, fy=fx, cx=width / 2, cy=height / 2,
                              bf=fx * 0.1, width=width, height=height)
    cfg = SlamConfig(camera=cam, orb=OrbConfig(n_features=500),
                     caps=Capacities(max_keyframes=64, max_points=16384,
                                     local_points=1024),
                     tracking=TrackingConfig(max_frames_between_kf=10),
                     sensor="rgbd")
    print("backend:", jax.devices()[0])
    img = jnp.asarray(seq.images[1].astype(np.float32))
    dep = jnp.asarray(seq.depths[1].astype(np.float32))

    slam = System(cfg)
    slam.track_batch_rgbd(seq.images[:8], seq.depths[:8], seq.timestamps[:8])
    m, carry = slam.map, slam.carry

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "track"):
        scan_time("make_frame_rgbd", functools.partial(frame_mod.make_frame_rgbd, cfg), img, dep)
        frame = jax.jit(functools.partial(frame_mod.make_frame_rgbd, cfg))(img, dep)
        scan_time("track_motion", functools.partial(tracking.track_motion, cfg),
                  m, frame, carry.Tcw, carry.velocity, carry.last_frame,
                  carry.last_obs_pt, jnp.float32(7.0))
        res = jax.jit(functools.partial(tracking.track_motion, cfg))(
            m, frame, carry.Tcw, carry.velocity, carry.last_frame,
            carry.last_obs_pt, jnp.float32(7.0))
        scan_time("track_local_map", functools.partial(tracking.track_local_map, cfg),
                  m, frame, res.Tcw, res.obs_pt)
        lres = jax.jit(functools.partial(tracking.track_local_map, cfg))(
            m, frame, res.Tcw, res.obs_pt)
        scan_time("create_keyframe", functools.partial(tracking.create_keyframe, cfg),
                  m, frame, lres.Tcw, lres.obs_pt, carry.frame_id, jnp.float32(0.0))
        scan_time("full step_rgbd", functools.partial(pipeline.step_rgbd, cfg),
                  m, carry, img, dep, jnp.float32(0.0))

    if which in ("all", "map"):
        kf_id = jnp.int32(int(np.asarray(m.n_kf)) - 1)
        total = 0.0
        for name in ["cull_points", "create_new_points", "fuse_into_keyframe",
                     "refresh_observed_points", "local_bundle_adjustment",
                     "cull_keyframes"]:
            total += scan_time(name, functools.partial(getattr(local_mapping, name), cfg),
                               m, kf_id)
        print(f"{'(sum of mapping stages)':40s} {total:8.3f} ms")
        scan_time("local_mapping._process", functools.partial(local_mapping._process, cfg),
                  m, kf_id)


if __name__ == "__main__":
    main()
