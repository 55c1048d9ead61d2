#!/usr/bin/env python
"""Host-side overhead breakdown of the batched tracking path at ref scale."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from self_commit_orb_slam2_tpu.models import pipeline
from self_commit_orb_slam2_tpu.models.config import (
    Capacities, SlamConfig, TrackingConfig,
)
from self_commit_orb_slam2_tpu.models.system import System
from self_commit_orb_slam2_tpu.ops.camera import CameraParams
from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig
from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence

width, height, fx, nfeat = 640, 480, 520.0, 1000
n = 49
seq = generate_sequence(n_frames=n, width=width, height=height, fx=fx, seed=5)
cam = CameraParams.create(fx=fx, fy=fx, cx=width / 2, cy=height / 2,
                          bf=fx * 0.1, width=width, height=height)
cfg = SlamConfig(camera=cam, orb=OrbConfig(n_features=nfeat),
                 caps=Capacities(max_keyframes=64, max_points=16384,
                                 local_points=1024),
                 tracking=TrackingConfig(max_frames_between_kf=10),
                 sensor="rgbd")
slam = System(cfg)
# warm up: full first pass incl. compile
slam.track_batch_rgbd(seq.images, seq.depths, seq.timestamps)
print("warm, kfs:", slam.n_keyframes(), flush=True)

# manual chunk loop, instrumented
C = 8
imgs = np.clip(seq.images[1:], 0, 255).astype(np.uint8)
deps = np.clip(seq.depths[1:] * 1e3, 0, 65535).astype(np.uint16)
ts = np.asarray(seq.timestamps[1:], np.float32)
B = len(ts)
batch = slam._batches[("rgbd", False)]
m, carry = slam.map, slam.carry

t_pack = t_put = t_call = 0.0
reps = 3
# pure device throughput: ONE pre-uploaded chunk dispatched repeatedly
valid = np.ones(C, bool)
buf0 = pipeline.pack_rgbd_chunk(imgs[:C], deps[:C], ts[:C], valid)
dbuf0 = jax.block_until_ready(jnp.asarray(buf0))
for rep in range(2):
    t0 = time.perf_counter()
    for k in range(B // C):
        m, carry, packed = batch(m, carry, dbuf0)
    np.asarray(packed)
    t1 = time.perf_counter()
    print(f"pure-device rep{rep}: {(t1-t0)/(B//C*C)*1e3:.2f} ms/frame", flush=True)

# variant: all chunks PRE-UPLOADED, then dispatched (no live H2D)
dbufs = []
for k in range(0, B - C + 1, C):
    valid = np.ones(C, bool)
    dbufs.append(jnp.asarray(pipeline.pack_rgbd_chunk(
        imgs[k:k+C], deps[k:k+C], ts[k:k+C], valid)))
jax.block_until_ready(dbufs)
for rep in range(2):
    t0 = time.perf_counter()
    for db in dbufs:
        m, carry, packed = batch(m, carry, db)
    np.asarray(packed)
    t1 = time.perf_counter()
    print(f"pre-uploaded rep{rep}: {(t1-t0)/(len(dbufs)*C)*1e3:.2f} ms/frame",
          flush=True)

for rep in range(reps):
    packed_parts = []
    t0 = time.perf_counter()
    ks = list(range(0, B - C + 1, C))
    valid = np.ones(C, bool)
    def up(k):
        return jnp.asarray(pipeline.pack_rgbd_chunk(
            imgs[k:k+C], deps[k:k+C], ts[k:k+C], valid))
    pending = up(ks[0])  # upload-ahead double buffer
    for i, k in enumerate(ks):
        dbuf = pending
        if i + 1 < len(ks):
            pending = up(ks[i + 1])   # upload NEXT before dispatching THIS
        m, carry, packed = batch(m, carry, dbuf)
        packed_parts.append(packed)
    t1 = time.perf_counter()
    all_packed = np.asarray(jnp.concatenate(packed_parts, 0))
    t2 = time.perf_counter()
    print(f"AHEAD rep{rep}: loop {(t1-t0)*1e3:.1f}ms  final-fetch {(t2-t1)*1e3:.1f}ms"
          f"  total {(t2-t0)/B*1e3:.2f} ms/frame", flush=True)

nchunks = reps * (B // C)
print(f"per-chunk: pack {t_pack/nchunks*1e3:.2f}ms  put {t_put/nchunks*1e3:.2f}ms"
      f"  dispatch {t_call/nchunks*1e3:.2f}ms")
print(f"per-frame: pack {t_pack/(nchunks*C)*1e3:.2f}  put "
      f"{t_put/(nchunks*C)*1e3:.2f}  dispatch {t_call/(nchunks*C)*1e3:.2f}")
