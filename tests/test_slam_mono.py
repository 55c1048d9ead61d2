"""End-to-end monocular SLAM (scale-ambiguous; ATE evaluated with Sim3
alignment, like the TUM benchmark's mono evaluation)."""

import numpy as np
import pytest

from self_commit_orb_slam2_tpu.models.config import Capacities, SlamConfig, TrackingConfig
from self_commit_orb_slam2_tpu.models.system import STATE_OK, System
from self_commit_orb_slam2_tpu.ops.camera import CameraParams
from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig
from self_commit_orb_slam2_tpu.utils.evaluation import ate_rmse
from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence


def make_mono_config():
    cam = CameraParams.create(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                              bf=0.0, width=320, height=240)
    return SlamConfig(
        camera=cam,
        orb=OrbConfig(n_features=700),
        caps=Capacities(max_keyframes=32, max_points=8192, local_points=1024),
        tracking=TrackingConfig(max_frames_between_kf=8,
                                kf_ref_ratio_stereo=0.8),
        sensor="mono",
    )


@pytest.mark.slow
def test_mono_tracking():
    n = 30
    seq = generate_sequence(n_frames=n, width=320, height=240, seed=5)
    slam = System(make_mono_config())
    for i in range(n):
        slam.track_monocular(seq.images[i], float(seq.timestamps[i]))
    assert slam.state == STATE_OK, "mono tracking lost"
    assert slam.n_keyframes() >= 2
    assert slam.n_points() > 100
    _, est = slam.get_trajectory()
    # align start of est with gt window (est starts at init frame)
    k = len(est)
    gt = seq.poses_gt[n - k:]
    ate = ate_rmse(est, gt, with_scale=True)
    print(f"mono ATE (Sim3-aligned): {ate*100:.2f}cm kf={slam.n_keyframes()} "
          f"pts={slam.n_points()} init_lag={n-k}")
    assert ate < 0.06, f"mono ATE {ate:.3f}m"
