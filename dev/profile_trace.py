#!/usr/bin/env python
"""Capture a jax profiler trace of _process + step at ref scale, then dump
the per-HLO-op device time table (top 40)."""

import sys, os, glob, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from self_commit_orb_slam2_tpu.models import local_mapping, pipeline
from self_commit_orb_slam2_tpu.models.config import Capacities, SlamConfig, TrackingConfig
from self_commit_orb_slam2_tpu.models.system import System
from self_commit_orb_slam2_tpu.ops.camera import CameraParams
from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig
from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence

width, height, nfeat = (int(os.environ.get("PW", 640)),
                        int(os.environ.get("PH", 480)),
                        int(os.environ.get("PF", 1000)))
fx = 260.0 * width / 320
seq = generate_sequence(n_frames=10, width=width, height=height, seed=5)
cam = CameraParams.create(fx=fx, fy=fx, cx=width / 2, cy=height / 2,
                          bf=fx * 0.1, width=width, height=height)
cfg = SlamConfig(camera=cam, orb=OrbConfig(n_features=nfeat),
                 caps=Capacities(max_keyframes=64, max_points=16384,
                                 local_points=1024),
                 tracking=TrackingConfig(max_frames_between_kf=10),
                 sensor="rgbd")
slam = System(cfg, enable_loop_closing=False)
for i in range(10):
    slam.track_rgbd(seq.images[i], seq.depths[i], float(seq.timestamps[i]))
m = slam.map
carry = slam.carry
kf_id = jnp.int32(int(np.asarray(m.n_kf)) - 1)
img = jnp.asarray(seq.images[5].astype(np.float32))
dep = jnp.asarray(seq.depths[5].astype(np.float32))

jproc = jax.jit(functools.partial(local_mapping._process, cfg))
jstep = jax.jit(functools.partial(pipeline.step_rgbd, cfg))
jax.block_until_ready(jproc(m, kf_id))
jax.block_until_ready(jstep(m, carry, img, dep, jnp.float32(0.0)))

trace_dir = "/tmp/slam_trace"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    for _ in range(5):
        out = jproc(m, kf_id)
    jax.block_until_ready(out)
    for _ in range(5):
        out2 = jstep(m, carry, img, dep, jnp.float32(0.0))
    jax.block_until_ready(out2)

# ---- parse: use xprof's convert to get op stats
from xprof.convert import raw_to_tool_data as rttd

run_dir = glob.glob(f"{trace_dir}/plugins/profile/*")[0]
xspaces = glob.glob(f"{run_dir}/*.xplane.pb")
params = {"graph_viewer_options": {}}
data, _ = rttd.xspace_to_tool_data(xspaces, "framework_op_stats", params)
import csv, io
# data may be json or csv depending on version
out_path = "/tmp/slam_trace/op_stats.txt"
with open(out_path, "w") as f:
    f.write(data if isinstance(data, str) else str(data))
print("wrote", out_path, "bytes:", os.path.getsize(out_path))
