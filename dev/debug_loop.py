"""Diagnose the long-run loop-closure path: run the bench_long_loop scenario
with SLAM_LOOP_DEBUG=1 and dump per-detection gate values.

Usage: python dev/debug_loop.py [n_frames]
"""

import os
import sys
import time

os.environ["SLAM_LOOP_DEBUG"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from self_commit_orb_slam2_tpu.models.config import (
    Capacities, SlamConfig, TrackingConfig,
)
from self_commit_orb_slam2_tpu.models.system import System
from self_commit_orb_slam2_tpu.ops.bow import load_vocabulary
from self_commit_orb_slam2_tpu.ops.camera import CameraParams
from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig
from self_commit_orb_slam2_tpu.run_slam import _default_vocab_path
from self_commit_orb_slam2_tpu.utils.drift import make_injector, se3_increment
from self_commit_orb_slam2_tpu.utils.evaluation import ate_rmse
from self_commit_orb_slam2_tpu.utils.synthetic import (
    circle_trajectory, generate_sequence,
)


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 560
    width, height, fx, n_feat, cycle = 640, 480, 520.0, 1000, 160
    vocab = load_vocabulary(_default_vocab_path())
    seq = generate_sequence(
        n_frames=cycle, width=width, height=height, fx=fx, seed=5,
        trajectory=circle_trajectory(cycle, radius=1.8, frames_per_rev=cycle))
    cam = CameraParams.create(fx=fx, fy=fx, cx=width / 2, cy=height / 2,
                              bf=fx * 0.1, width=width, height=height)
    cfg = SlamConfig(
        camera=cam, orb=OrbConfig(n_features=n_feat),
        caps=Capacities(max_keyframes=96, max_points=16384,
                        local_points=1024),
        tracking=TrackingConfig(max_frames_between_kf=10),
        sensor="rgbd", vocab=vocab,
    )
    dD1 = np.asarray(se3_increment(
        [0.0011, 0.00028, -0.00055, 0.0, 0.0009, 0.0]), np.float64)
    images = np.clip(seq.images, 0, 255).astype(np.uint8)
    depths_mm = np.clip(seq.depths * 1e3, 0, 65535).astype(np.uint16)

    slam = System(cfg)
    slam._batch_chunk = 8
    slam.warm_start()
    sess = slam.open_stream("rgbd")
    C = slam._batch_chunk
    dD_c = np.eye(4)
    for _ in range(C):
        dD_c = dD_c @ dD1
    inject = make_injector(keep_recent=6)
    dD_dev = jnp.asarray(dD_c.astype(np.float32))
    one = jnp.float32(1.0)
    done = 0
    idx0 = np.arange(C)
    while done < n_frames:
        idx = (done + idx0) % cycle
        ts = (done + idx0) / 30.0
        sess.feed((images[idx], depths_mm[idx]), ts)
        if done >= cycle:
            slam.map = inject(slam.map, dD_dev, one)
        done += C
    sess.finish()
    _, est = slam.get_trajectory()
    gt = seq.poses_gt[np.arange(len(est)) % cycle]
    print(f"frames={done} kf_live={int(np.sum(np.asarray(slam.map.kf_valid)))}"
          f" ate={ate_rmse(est, gt):.3f} closures="
          f"{slam._loop_closer.n_big_changes} lost={slam.state != 1}")
    log = slam._loop_closer.debug_log
    print(f"{len(log)} detections processed")
    for e in log:
        print(e)


if __name__ == "__main__":
    main()
