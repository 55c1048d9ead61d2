#!/usr/bin/env python
"""Per-stage device-time attribution via separate profiler traces."""

import sys, os, glob, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from self_commit_orb_slam2_tpu.models import local_mapping, pipeline, tracking
from self_commit_orb_slam2_tpu.models import frame as frame_mod
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


def trace_one(name, fn, *args, reps=5, topk=12):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    tdir = f"/tmp/slam_trace/{name}"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(reps):
            out = f(*args)
        jax.block_until_ready(out)
    from xprof.convert import raw_to_tool_data as rttd
    run_dir = glob.glob(f"{tdir}/plugins/profile/*")[0]
    xspaces = glob.glob(f"{run_dir}/*.xplane.pb")
    data, _ = rttd.xspace_to_tool_data(xspaces, "framework_op_stats",
                                       {"graph_viewer_options": {}})
    import json
    tbl = json.loads(data.decode() if isinstance(data, bytes) else data)[0]
    cols = [c['id'] for c in tbl['cols']]
    rows = [[c['v'] for c in r['c']] for r in tbl['rows']]
    i_op = cols.index('operation'); i_tot = cols.index('total_self_time')
    i_hd = cols.index('host_or_device'); i_occ = cols.index('occurrences')
    dev = [r for r in rows if r[i_hd] == 'Device' and r[i_op] != 'IDLE']
    dev.sort(key=lambda r: -r[i_tot])
    tot = sum(r[i_tot] for r in dev) / reps
    print(f"\n=== {name}: device {tot/1e3:.2f} ms/call ===")
    for r in dev[:topk]:
        print(f"  {r[i_tot]/reps:8.0f}us {int(r[i_occ])//reps:3}x {r[i_op][:100]}")


def stage(fn):
    return lambda m, k: fn(cfg, m, k)


which = sys.argv[1:] or ["cull_points", "create_new_points", "fuse_into_keyframe",
                         "refresh_observed_points", "local_bundle_adjustment",
                         "cull_keyframes"]
for name in which:
    if name == "step":
        trace_one("step", functools.partial(pipeline.step_rgbd, cfg),
                  m, carry, img, dep, jnp.float32(0.0))
    elif name == "make_frame":
        trace_one("make_frame", functools.partial(frame_mod.make_frame_rgbd, cfg),
                  img, dep)
    else:
        trace_one(name, stage(getattr(local_mapping, name)), m, kf_id)
