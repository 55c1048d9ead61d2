#!/usr/bin/env python
"""Decompose batched-tracking wall time: upload vs dispatch vs compute."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from self_commit_orb_slam2_tpu.models.config import (
    Capacities, SlamConfig, TrackingConfig,
)
from self_commit_orb_slam2_tpu.models.system import System
from self_commit_orb_slam2_tpu.ops.camera import CameraParams
from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig
from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence


def main():
    width, height, fx = 320, 240, 260.0
    n = 61
    seq = generate_sequence(n_frames=n, width=width, height=height, seed=5)
    cam = CameraParams.create(fx=fx, fy=fx, cx=width / 2, cy=height / 2,
                              bf=fx * 0.1, width=width, height=height)
    cfg = SlamConfig(camera=cam, orb=OrbConfig(n_features=500),
                     caps=Capacities(max_keyframes=64, max_points=16384,
                                     local_points=1024),
                     tracking=TrackingConfig(max_frames_between_kf=10),
                     sensor="rgbd")
    slam = System(cfg)
    B = 28
    C = 4
    # warm up + init
    slam.track_batch_rgbd(seq.images[:1 + B], seq.depths[:1 + B],
                          seq.timestamps[:1 + B])

    imgs = np.clip(seq.images[1 + B:1 + 2 * B], 0, 255).astype(np.uint8)
    deps = np.clip(seq.depths[1 + B:1 + 2 * B] * 1e3, 0, 65535).astype(np.uint16)
    ts = np.asarray(seq.timestamps[1 + B:1 + 2 * B], np.float32)

    batch = slam._batches[("rgbd", False)]
    valid = jnp.ones(C, bool)

    # Phase 1: upload all chunks, blocking
    t0 = time.perf_counter()
    chunks = []
    for k in range(0, B, C):
        ci = jnp.asarray(imgs[k:k + C])
        cd = jnp.asarray(deps[k:k + C])
        ct = jnp.asarray(ts[k:k + C])
        chunks.append((ci, cd, ct))
    jax.block_until_ready(chunks)
    t1 = time.perf_counter()
    print(f"upload {B} frames ({len(chunks)} chunks): {(t1 - t0) * 1e3:.1f} ms")

    # Phase 2: dispatch loop on pre-uploaded data
    m, carry = slam.map, slam.carry
    t0 = time.perf_counter()
    outs = []
    for ci, cd, ct in chunks:
        m, carry, packed = batch(m, carry, ci, cd, ct, valid)
        outs.append(packed)
    jax.block_until_ready(outs)
    t1 = time.perf_counter()
    print(f"dispatch+compute: {(t1 - t0) * 1e3:.1f} ms "
          f"({(t1 - t0) / B * 1e3:.2f} ms/frame)")

    # Phase 3: fetch
    t0 = time.perf_counter()
    allp = np.asarray(jnp.concatenate(outs, axis=0))
    t1 = time.perf_counter()
    print(f"fetch packed: {(t1 - t0) * 1e3:.1f} ms, shape {allp.shape}")

    # Phase 4: single-dispatch scan over the same frames (chunk = B)
    slam2 = System(cfg)
    slam2.track_batch_rgbd(seq.images[:1 + B], seq.depths[:1 + B],
                           seq.timestamps[:1 + B], chunk=B)
    t0 = time.perf_counter()
    slam2.track_batch_rgbd(seq.images[1 + B:1 + 2 * B],
                           seq.depths[1 + B:1 + 2 * B],
                           seq.timestamps[1 + B:1 + 2 * B], chunk=B)
    t1 = time.perf_counter()
    print(f"one-dispatch scan B={B}: {(t1 - t0) * 1e3:.1f} ms "
          f"({(t1 - t0) / B * 1e3:.2f} ms/frame)")


if __name__ == "__main__":
    main()
