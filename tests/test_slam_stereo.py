"""End-to-end stereo SLAM on a synthetic sequence (KITTI-style sensor)."""

import numpy as np
import pytest

from self_commit_orb_slam2_tpu.models.config import Capacities, SlamConfig, TrackingConfig
from self_commit_orb_slam2_tpu.models.system import STATE_OK, System
from self_commit_orb_slam2_tpu.ops.camera import CameraParams
from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig
from self_commit_orb_slam2_tpu.utils.evaluation import ate_rmse
from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence

BASELINE = 0.12


def make_stereo_config(width=320, height=240, fx=260.0):
    cam = CameraParams.create(
        fx=fx, fy=fx, cx=width / 2, cy=height / 2,
        bf=fx * BASELINE, width=width, height=height,
    )
    return SlamConfig(
        camera=cam,
        orb=OrbConfig(n_features=500),
        caps=Capacities(max_keyframes=32, max_points=8192, local_points=1024),
        tracking=TrackingConfig(max_frames_between_kf=10),
        sensor="stereo",
    )


@pytest.mark.slow
def test_stereo_tracking_ate():
    n = 20
    seq = generate_sequence(n_frames=n, width=320, height=240, seed=7,
                            stereo_baseline=BASELINE)
    slam = System(make_stereo_config())
    for i in range(n):
        slam.track_stereo(seq.images[i], seq.right_images[i], float(seq.timestamps[i]))
        assert slam.state == STATE_OK, f"tracking lost at frame {i}"
    est = np.stack([p for _, p in slam.trajectory])
    ate = ate_rmse(est, seq.poses_gt)
    print(f"stereo ATE RMSE: {ate*100:.2f}cm kf={slam.n_keyframes()} pts={slam.n_points()}")
    assert ate < 0.05, f"stereo ATE {ate:.3f}m too high"
    assert slam.n_keyframes() >= 2


@pytest.mark.slow
def test_stereo_wide_aspect_kitti_shape():
    """KITTI-proportioned frames (wide, ~3.3:1) track end-to-end — guards the
    extraction/matching kernels against non-4:3 shapes (KITTI 1241x376)."""
    W, H = 608, 184
    fx = 240.0
    seq = generate_sequence(n_frames=14, width=W, height=H, fx=fx, seed=11,
                            stereo_baseline=0.12)
    cam = CameraParams.create(fx=fx, fy=fx, cx=W / 2, cy=H / 2,
                              bf=fx * 0.12, width=W, height=H)
    cfg = SlamConfig(
        camera=cam, orb=OrbConfig(n_features=500),
        caps=Capacities(max_keyframes=16, max_points=8192, local_points=1024),
        tracking=TrackingConfig(max_frames_between_kf=10),
        sensor="stereo",
    )
    slam = System(cfg)
    for i in range(14):
        slam.track_stereo(seq.images[i], seq.right_images[i],
                          float(seq.timestamps[i]))
        assert slam.state == STATE_OK, f"lost at {i}"
    _, est = slam.get_trajectory()
    ate = ate_rmse(est, seq.poses_gt[: len(est)])
    print(f"wide-aspect stereo ATE: {ate*100:.2f} cm")
    assert ate < 0.03
