#!/usr/bin/env python
"""Bisect tracking stage internals in-graph on TPU."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from self_commit_orb_slam2_tpu.models import frame as frame_mod
from self_commit_orb_slam2_tpu.models import map_state as ms
from self_commit_orb_slam2_tpu.models import tracking
from self_commit_orb_slam2_tpu.models.config import (
    Capacities, SlamConfig, TrackingConfig,
)
from self_commit_orb_slam2_tpu.models.system import System
from self_commit_orb_slam2_tpu.ops.camera import CameraParams, in_frustum
from self_commit_orb_slam2_tpu.ops.matching import core as mcore
from self_commit_orb_slam2_tpu.ops.optim.pose_opt import pose_optimize
from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig
from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence

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

    frame = jax.jit(functools.partial(frame_mod.make_frame_rgbd, cfg))(img, dep)
    res = jax.jit(functools.partial(tracking.track_motion, cfg))(
        m, frame, carry.Tcw, carry.velocity, carry.last_frame,
        carry.last_obs_pt, jnp.float32(7.0))

    # pose_optimize alone
    sigma2 = jnp.asarray(cfg.orb.sigma2())
    obs_pt = res.obs_pt
    pts = m.pt_pos[jnp.clip(obs_pt, 0, m.max_pt - 1)]
    valid = (obs_pt >= 0) & frame.valid
    obs = jnp.concatenate([frame.xy, frame.u_right[:, None]], axis=-1)
    scan_time("pose_optimize (4 rounds)", functools.partial(
        pose_optimize, cfg.camera), carry.Tcw, pts, obs,
        sigma2[frame.level], valid)

    # mutual_best_match alone [512, 512]
    scan_time("mutual_best_match 512x512", functools.partial(
        mcore.mutual_best_match, max_dist=mcore.TH_HIGH, ratio=None),
        m.pt_desc[:512], frame.desc,
        jnp.ones((512, frame.capacity), bool), jnp.ones(512, bool), frame.valid)

    # covisibility_row
    scan_time("covisibility_row", functools.partial(ms.covisibility_row, m),
              res.obs_pt)
    # points_of_keyframes
    mask = jnp.zeros(m.max_kf, bool).at[:8].set(True)
    scan_time("points_of_keyframes", functools.partial(ms.points_of_keyframes, m),
              mask)
    # in_frustum over local_points
    C = cfg.caps.local_points
    scan_time("in_frustum 1024", functools.partial(
        in_frustum, cfg.camera), carry.Tcw, m.pt_pos[:C], m.pt_normal[:C],
        m.pt_min_dist[:C], m.pt_max_dist[:C],
        (0.0, float(cam.width), 0.0, float(cam.height)), 0.5)
    # nonzero (size-bounded)
    scan_time("nonzero size=1024", lambda v: jnp.nonzero(
        v, size=C, fill_value=m.max_pt)[0], m.pt_valid)
    # observation_count
    scan_time("observation_count", functools.partial(ms.observation_count, m))


if __name__ == "__main__":
    main()
