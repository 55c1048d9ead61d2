#!/usr/bin/env python
"""Phase-level profile of the fused step at reference scale (640x480/1000f).

Times each stage with a lax.scan of R repetitions inside one jit (same
dispatch amortization as the batched bench), against a REAL mid-sequence
MapState so covisibility/matching see realistic occupancy.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from self_commit_orb_slam2_tpu.models import frame as frame_mod
from self_commit_orb_slam2_tpu.models import local_mapping
from self_commit_orb_slam2_tpu.models import map_state as ms
from self_commit_orb_slam2_tpu.models import pipeline, tracking
from self_commit_orb_slam2_tpu.models.config import (
    Capacities, SlamConfig, TrackingConfig,
)
from self_commit_orb_slam2_tpu.models.system import System
from self_commit_orb_slam2_tpu.ops.orb import extractor as orb_ext
from self_commit_orb_slam2_tpu.ops.camera import CameraParams
from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig
from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence

R = 20

size = sys.argv[1] if len(sys.argv) > 1 else "ref"
if size == "kitti":
    width, height, fx, nfeat = 1241, 376, 718.9, 2000
    sensor = "stereo"
elif size == "quarter":
    width, height, fx, nfeat = 320, 240, 260.0, 500
    sensor = "rgbd"
else:
    width, height, fx, nfeat = 640, 480, 520.0, 1000
    sensor = "rgbd"

seq = generate_sequence(n_frames=10, width=width, height=height, fx=fx, seed=5,
                        stereo_baseline=0.1 if sensor == "stereo" else 0.0)
cam = CameraParams.create(fx=fx, fy=fx, cx=width / 2, cy=height / 2,
                          bf=fx * 0.1, width=width, height=height)
cfg = SlamConfig(camera=cam, orb=OrbConfig(n_features=nfeat),
                 caps=Capacities(max_keyframes=64, max_points=16384,
                                 local_points=1024),
                 tracking=TrackingConfig(max_frames_between_kf=10),
                 sensor=sensor)
slam = System(cfg, enable_loop_closing=False)
if sensor == "stereo":
    slam.track_batch_stereo(seq.images, seq.right_images, seq.timestamps)
else:
    slam.track_batch_rgbd(seq.images, seq.depths, seq.timestamps)
m = slam.map
carry = slam.carry
print("backend:", jax.devices()[0], "kfs:", slam.n_keyframes(),
      "pts:", slam.n_points())

img = jnp.asarray(seq.images[-1])
dep = jnp.asarray(seq.depths[-1])
if sensor == "stereo":
    imr = jnp.asarray(seq.right_images[-1])
ts = jnp.float32(seq.timestamps[-1])


def scan_time(name, fn, *args):
    """Time fn(*args) repeated R times inside one jit (sum-consume outputs)."""
    def body(acc, _):
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        s = sum(jnp.sum(x.astype(jnp.float32)) for x in leaves
                if x.dtype != jnp.bool_ or True)
        return acc + s * 1e-30, None

    g = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0.0), None, length=R)[0])
    jax.block_until_ready(g())
    t0 = time.perf_counter()
    jax.block_until_ready(g())
    dt = (time.perf_counter() - t0) / R * 1e3
    print(f"{name:48s} {dt:8.3f} ms")
    return dt


# --- frame construction ---
if sensor == "stereo":
    mk = lambda: frame_mod.make_frame_stereo(cfg, img, imr)
else:
    mk = lambda: frame_mod.make_frame_rgbd(cfg, img, dep)
scan_time("frame construction (ORB + depth)", mk)
scan_time("  orb extract only", lambda: orb_ext.extract(img, cfg.orb))

frame = jax.jit(mk)()
frame = jax.block_until_ready(frame)

# --- motion tracking (dual hypothesis, as in pipeline) ---
tcfg = cfg.tracking


def motion():
    res2 = jax.vmap(
        lambda vel, rad: tracking.track_motion(
            cfg, m, frame, carry.Tcw, vel, carry.last_frame,
            carry.last_obs_pt, rad)
    )(jnp.stack([jnp.eye(4, dtype=jnp.float32), carry.velocity]),
      jnp.asarray([tcfg.motion_search_radius_wide, tcfg.motion_search_radius],
                  jnp.float32))
    return res2

scan_time("motion tracking (dual hypothesis vmap)", motion)
scan_time("motion tracking (single hypothesis)",
          lambda: tracking.track_motion(cfg, m, frame, carry.Tcw,
                                        carry.velocity, carry.last_frame,
                                        carry.last_obs_pt,
                                        jnp.float32(tcfg.motion_search_radius)))

res = jax.jit(lambda: jax.tree.map(lambda x: x[1], motion()))()
res = jax.block_until_ready(res)

scan_time("local-map tracking",
          lambda: tracking.track_local_map(cfg, m, frame, res.Tcw, res.obs_pt))

lres = jax.jit(lambda: tracking.track_local_map(cfg, m, frame, res.Tcw,
                                                res.obs_pt))()
lres = jax.block_until_ready(lres)

# covis/obs-count passes in isolation
scan_time("  covisibility_row", lambda: ms.covisibility_row(m, res.obs_pt))
scan_time("  observation_count", lambda: ms.observation_count(m))

# --- keyframe insertion + mapping phase ---
def kf_and_map():
    m2, kf_id = tracking.create_keyframe(cfg, m, frame, lres.Tcw, lres.obs_pt,
                                         carry.frame_id, ts)
    m2 = local_mapping._process(cfg, m2, kf_id)
    return m2.n_pt

scan_time("keyframe + full mapping phase", kf_and_map)


def kf_only():
    m2, kf_id = tracking.create_keyframe(cfg, m, frame, lres.Tcw, lres.obs_pt,
                                         carry.frame_id, ts)
    return m2.n_pt

scan_time("  keyframe insertion only", kf_only)

# --- full fused step ---
if sensor == "stereo":
    step = lambda: pipeline.step_stereo(cfg, m, carry, img, imr, ts)[2]
else:
    step = lambda: pipeline.step_rgbd(cfg, m, carry, img, dep, ts)[2]
scan_time("FULL fused step (cond mapping as-hit)", step)
