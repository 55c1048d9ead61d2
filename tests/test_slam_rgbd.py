"""End-to-end RGB-D SLAM on a synthetic sequence: the first ATE milestone.

Mirrors the reference's de-facto validation (run a sequence, evaluate ATE —
SURVEY.md §4) on the synthetic textured room with exact ground truth.
"""

import numpy as np
import pytest

from self_commit_orb_slam2_tpu.models.config import Capacities, SlamConfig, TrackingConfig
from self_commit_orb_slam2_tpu.models.system import STATE_OK, System
from self_commit_orb_slam2_tpu.ops.camera import CameraParams
from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig
from self_commit_orb_slam2_tpu.utils.evaluation import ate_rmse, rpe_rmse
from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence


def make_config(width=320, height=240, fx=260.0, bf=None):
    cam = CameraParams.create(
        fx=fx, fy=fx, cx=width / 2, cy=height / 2,
        bf=bf if bf is not None else fx * 0.1, width=width, height=height,
    )
    return SlamConfig(
        camera=cam,
        orb=OrbConfig(n_features=500),
        caps=Capacities(max_keyframes=32, max_points=8192, local_points=1024),
        tracking=TrackingConfig(max_frames_between_kf=10),
        sensor="rgbd",
    )


@pytest.mark.slow
def test_rgbd_tracking_ate():
    n = 20
    seq = generate_sequence(n_frames=n, width=320, height=240, seed=5)
    cfg = make_config()
    slam = System(cfg)
    for i in range(n):
        slam.track_rgbd(seq.images[i], seq.depths[i], float(seq.timestamps[i]))
        assert slam.state == STATE_OK, f"tracking lost at frame {i}"

    poses_est = np.stack([p for _, p in slam.trajectory])
    ate = ate_rmse(poses_est, seq.poses_gt)
    rpe_t, rpe_r = rpe_rmse(poses_est, seq.poses_gt)
    print(f"ATE RMSE: {ate*100:.2f}cm  RPE: {rpe_t*100:.2f}cm/frame {np.rad2deg(rpe_r):.3f}deg/frame")
    print(f"keyframes: {slam.n_keyframes()}  points: {slam.n_points()}")
    # Scene is a ~6m room with ~2m trajectory; require cm-level accuracy.
    assert ate < 0.05, f"ATE {ate:.3f}m too high"
    assert slam.n_keyframes() >= 2


@pytest.mark.slow
def test_rgbd_localization_mode():
    """After mapping a sequence, re-track it with a frozen map (reference
    ActivateLocalizationMode, System.cc:346: VO on frozen map)."""
    n = 12
    seq = generate_sequence(n_frames=n, width=320, height=240, seed=5)
    cfg = make_config()
    slam = System(cfg)
    for i in range(n):
        slam.track_rgbd(seq.images[i], seq.depths[i], float(seq.timestamps[i]))
    n_kf = slam.n_keyframes()
    n_pt = slam.n_points()
    slam.activate_localization_mode()
    for i in range(n):
        slam.track_rgbd(seq.images[i], seq.depths[i], float(seq.timestamps[i]) + 100.0)
        assert slam.state == STATE_OK
    assert slam.n_keyframes() == n_kf, "localization mode must not add keyframes"
    assert slam.n_points() == n_pt
    poses_est = np.stack([p for _, p in slam.trajectory[n:]])
    ate = ate_rmse(poses_est, seq.poses_gt)
    assert ate < 0.05


def test_reset():
    seq = generate_sequence(n_frames=2, width=320, height=240, seed=5)
    cfg = make_config()
    slam = System(cfg)
    slam.track_rgbd(seq.images[0], seq.depths[0], 0.0)
    assert slam.n_keyframes() == 1
    slam.reset()
    assert slam.n_keyframes() == 0
    assert slam.state == 0
    slam.track_rgbd(seq.images[0], seq.depths[0], 0.0)
    assert slam.n_keyframes() == 1


@pytest.mark.slow
def test_rgbd_batch_matches_per_frame():
    """track_batch_rgbd (packed chunked streaming) must produce the same
    trajectory quality as per-frame tracking, including a padded tail chunk."""
    n = 14
    seq = generate_sequence(n_frames=n, width=320, height=240, seed=5)
    cfg = make_config()
    slam = System(cfg)
    # chunk=4 with 13 tracked frames -> 3 full chunks + 1 padded chunk
    slam.track_batch_rgbd(seq.images, seq.depths, seq.timestamps, chunk=4)
    assert slam.state == STATE_OK
    assert len(slam.trajectory) == n
    poses_est = np.stack([p for _, p in slam.trajectory])
    ate = ate_rmse(poses_est, seq.poses_gt)
    assert ate < 0.05, f"batched ATE {ate:.3f}m too high"
    assert slam.n_keyframes() >= 2
