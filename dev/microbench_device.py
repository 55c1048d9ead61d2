#!/usr/bin/env python
"""True device-time measurement: time jit(f^k) for k=1,2,4 — the slope is
pure device compute, the intercept is tunnel dispatch overhead."""

import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from self_commit_orb_slam2_tpu.models import frame as frame_mod
from self_commit_orb_slam2_tpu.models import local_mapping, pipeline, tracking
from self_commit_orb_slam2_tpu.models import map_state as ms
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
print("backend:", jax.devices()[0], f"{width}x{height}/{nfeat} n_kf:",
      int(m.n_kf), "n_pt:", int(m.n_pt))


def slope(name, make_fn, ks=(1, 2, 4), n=15):
    ts = []
    for k in ks:
        f = jax.jit(make_fn(k))
        out = jax.block_until_ready(f(m, kf_id))
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(m, kf_id)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / n * 1e3)
    # least squares slope over ks
    ks_a = np.array(ks, float)
    ts_a = np.array(ts)
    sl = ((ks_a - ks_a.mean()) * (ts_a - ts_a.mean())).sum() / ((ks_a - ks_a.mean()) ** 2).sum()
    print(f"{name:36s} device={sl:7.3f} ms  raw={['%.2f' % t for t in ts]}")


def mk_stage(stage_fn):
    def make(k):
        def f(m, kf_id):
            for _ in range(k):
                m = stage_fn(cfg, m, kf_id)
                m = m._replace(n_pt=m.n_pt + 0)
            return jnp.sum(m.pt_pos) + jnp.sum(m.kf_Tcw)
        return f
    return make


def mk_process(k):
    def f(m, kf_id):
        for _ in range(k):
            m = local_mapping._process(cfg, m, kf_id)
        return jnp.sum(m.pt_pos) + jnp.sum(m.kf_Tcw)
    return f


def mk_step(k):
    def f(m, kf_id):
        mm, cc = m, carry
        for i in range(k):
            mm, cc, info = pipeline.step_rgbd(cfg, mm, cc, img, dep,
                                              jnp.float32(i))
        return info.Tcw.sum() + jnp.sum(mm.pt_pos)
    return f


def mk_frame(k):
    def f(m, kf_id):
        s = jnp.float32(0)
        for i in range(k):
            fr = frame_mod.make_frame_rgbd(cfg, img + i, dep)
            s = s + jnp.sum(fr.xy) + jnp.sum(fr.desc.astype(jnp.float32))
        return s
    return f


def mk_motion(k):
    def f(m, kf_id):
        T = carry.Tcw
        for i in range(k):
            r = tracking.track_motion(cfg, m, carry.last_frame, T,
                                      carry.velocity, carry.last_frame,
                                      carry.last_obs_pt, jnp.float32(15.0))
            T = r.Tcw
        return jnp.sum(T)
    return f


def mk_local(k):
    def f(m, kf_id):
        T = carry.Tcw
        for i in range(k):
            r = tracking.track_local_map(cfg, m, carry.last_frame, T,
                                         carry.last_obs_pt)
            T = r.Tcw
        return jnp.sum(T)
    return f


which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "track"):
    slope("make_frame_rgbd", mk_frame)
    slope("track_motion", mk_motion)
    slope("track_local_map", mk_local)
    slope("full step (no KF)", mk_step)
if which in ("all", "map"):
    slope("_process (full mapping)", mk_process)
if which in ("all", "stages"):
    for name in ["cull_points", "create_new_points", "fuse_into_keyframe",
                 "refresh_observed_points", "local_bundle_adjustment",
                 "cull_keyframes"]:
        slope(name, mk_stage(getattr(local_mapping, name)), n=10)
