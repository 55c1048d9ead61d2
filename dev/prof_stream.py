"""Break down the sustained streaming loop on the real TPU.

Per-chunk accounting of the long-run path (bench.bench_long): host pack time,
upload (jnp.asarray) time, dispatch time (frame fn + scan fn), drain/fetch
time, plus end-of-run totals.  Run:  python dev/prof_stream.py [n_frames]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from self_commit_orb_slam2_tpu.models.config import (
    Capacities, SlamConfig, TrackingConfig,
)
from self_commit_orb_slam2_tpu.models.system import System
from self_commit_orb_slam2_tpu.models import pipeline
from self_commit_orb_slam2_tpu.ops.bow import load_vocabulary
from self_commit_orb_slam2_tpu.ops.camera import CameraParams
from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig
from self_commit_orb_slam2_tpu.run_slam import _default_vocab_path
from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    width, height, fx, n_feat = 640, 480, 520.0, 1000
    cycle = 160
    vocab = load_vocabulary(_default_vocab_path())
    seq = generate_sequence(n_frames=cycle, width=width, height=height,
                            fx=fx, seed=5)
    cam = CameraParams.create(fx=fx, fy=fx, cx=width / 2, cy=height / 2,
                              bf=fx * 0.1, width=width, height=height)
    cfg = SlamConfig(
        camera=cam, orb=OrbConfig(n_features=n_feat),
        caps=Capacities(max_keyframes=64, max_points=16384,
                        local_points=1024),
        tracking=TrackingConfig(max_frames_between_kf=10),
        sensor="rgbd", vocab=vocab,
    )
    slam = System(cfg)
    C = slam._batch_chunk = int(os.environ.get("SLAM_BATCH_CHUNK", "8"))
    slam.warm_start()
    images = np.clip(seq.images, 0, 255).astype(np.uint8)
    depths = np.clip(seq.depths * 1e3, 0, 65535).astype(np.uint16)

    # init frame
    slam._track("rgbd", (jnp.asarray(seq.images[0], jnp.float32),
                         jnp.asarray(seq.depths[0], jnp.float32)), 0.0)

    batch = slam._batches[("rgbd", False)]
    frame_fn = slam._frame_fns["rgbd"]
    scan = slam._scan_fns[("rgbd", False)]

    t_pack = t_up = t_disp = t_sync = 0.0
    idx0 = np.arange(C)
    done = 0
    chunk_times = []
    t_all0 = time.perf_counter()
    while done < n_frames:
        idx = (done + idx0) % cycle
        ts = (done + idx0) / 30.0
        t0 = time.perf_counter()
        buf_h = pipeline.pack_rgbd_chunk(images[idx], depths[idx],
                                         np.asarray(ts, np.float32),
                                         np.ones(C, bool))
        t1 = time.perf_counter()
        buf = jnp.asarray(buf_h)
        t2 = time.perf_counter()
        frames, tss, valid = frame_fn(buf)
        slam.map, slam.carry, packed = scan(slam.map, slam.carry, frames,
                                            tss, valid)
        t3 = time.perf_counter()
        # sync every 16 chunks (mimic drain cadence without loop closing)
        if (done // C) % 16 == 15:
            jax.block_until_ready(packed)
        t4 = time.perf_counter()
        t_pack += t1 - t0
        t_up += t2 - t1
        t_disp += t3 - t2
        t_sync += t4 - t3
        chunk_times.append(t4 - t0)
        done += C
    jax.block_until_ready(slam.map.kf_Tcw)
    t_total = time.perf_counter() - t_all0
    n = done
    ct = np.asarray(chunk_times[2:]) * 1e3
    print(f"chunk={C} frames={n} total={t_total:.2f}s fps={n / t_total:.1f}")
    print(f"per-frame ms: pack={t_pack / n * 1e3:.2f} upload={t_up / n * 1e3:.2f} "
          f"dispatch={t_disp / n * 1e3:.2f} sync={t_sync / n * 1e3:.2f}")
    print(f"chunk ms: median={np.median(ct):.1f} p90={np.percentile(ct, 90):.1f} "
          f"max={ct.max():.1f}")


if __name__ == "__main__":
    main()
