#!/usr/bin/env python
"""Bisect the mapping-phase cost with a real MapState at ref scale."""

import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from self_commit_orb_slam2_tpu.models import map_state as ms
from self_commit_orb_slam2_tpu.models import local_mapping
from self_commit_orb_slam2_tpu.models.config import Capacities, SlamConfig, TrackingConfig
from self_commit_orb_slam2_tpu.models.system import System
from self_commit_orb_slam2_tpu.ops.camera import CameraParams
from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig
from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence

width, height, nfeat = 640, 480, 1000
fx = 260.0 * width / 320
seq = generate_sequence(n_frames=8, width=width, height=height, seed=5)
cam = CameraParams.create(fx=fx, fy=fx, cx=width / 2, cy=height / 2,
                          bf=fx * 0.1, width=width, height=height)
cfg = SlamConfig(camera=cam, orb=OrbConfig(n_features=nfeat),
                 caps=Capacities(max_keyframes=64, max_points=16384,
                                 local_points=1024),
                 tracking=TrackingConfig(max_frames_between_kf=10),
                 sensor="rgbd")
slam = System(cfg, enable_loop_closing=False)
for i in range(8):
    slam.track_rgbd(seq.images[i], seq.depths[i], float(seq.timestamps[i]))
m = slam.map
kf_id = jnp.int32(int(np.asarray(m.n_kf)) - 1)
print("backend:", jax.devices()[0], "n_kf:", int(m.n_kf), "n_pt:", int(m.n_pt))


def timeit(name, fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms")
    return out


@jax.jit
def j_obs_count(m):
    return ms.observation_count(m)


@jax.jit
def j_covis_row(m, kf_id):
    return ms.covisibility_row(m, m.kf_obs_pt[kf_id])


@jax.jit
def j_cull_scalar(m, kf_id):
    m2 = local_mapping.cull_points(cfg, m, kf_id)
    return jnp.sum(m2.pt_valid)


j_cull_full = jax.jit(functools.partial(local_mapping.cull_points, cfg))


@jax.jit
def j_identity(m):
    return m._replace(n_pt=m.n_pt + 1)


@jax.jit
def j_refresh_scalar(m, kf_id):
    m2 = local_mapping.refresh_observed_points(cfg, m, kf_id)
    return jnp.sum(m2.pt_max_dist)


timeit("observation_count only", j_obs_count, m)
timeit("covisibility_row only", j_covis_row, m, kf_id)
timeit("cull_points -> scalar (no map copy)", j_cull_scalar, m, kf_id)
timeit("cull_points -> full MapState", j_cull_full, m, kf_id)
timeit("identity MapState passthrough", j_identity, m)
timeit("refresh -> scalar", j_refresh_scalar, m, kf_id)

# donated variant
j_cull_don = jax.jit(functools.partial(local_mapping.cull_points, cfg),
                     donate_argnums=0)
mm = jax.tree.map(lambda x: x, m)
out = jax.block_until_ready(j_cull_don(mm, kf_id))
t0 = time.perf_counter()
n = 20
for _ in range(n):
    out = j_cull_don(out, kf_id)
jax.block_until_ready(out)
print(f"{'cull_points donated (in-place)':44s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms")
