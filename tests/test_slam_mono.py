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


@pytest.mark.slow
def test_mono_tracking_ref_scale():
    """Mono e2e at the reference's 640x480/1000-feature operating point
    (reference Examples/Monocular/TUM1.yaml).  The DOUBLED init feature
    budget (System's ini extractor = 2x nFeatures, reference
    Tracking.cc:121-124) must bootstrap within a few frames here."""
    n = 36
    seq = generate_sequence(n_frames=n, width=640, height=480, fx=520.0,
                            seed=6)
    cam = CameraParams.create(fx=520.0, fy=520.0, cx=320.0, cy=240.0,
                              bf=0.0, width=640, height=480)
    slam = System(SlamConfig(
        camera=cam, orb=OrbConfig(n_features=1000),
        caps=Capacities(max_keyframes=32, max_points=16384,
                        local_points=1024),
        tracking=TrackingConfig(max_frames_between_kf=8,
                                kf_ref_ratio_stereo=0.8),
        sensor="mono",
    ))
    for i in range(n):
        slam.track_monocular(seq.images[i], float(seq.timestamps[i]))
    assert slam.state == STATE_OK, "mono tracking lost at ref scale"
    _, est = slam.get_trajectory()
    k = len(est)
    init_lag = n - k
    assert init_lag <= 6, f"mono init took {init_lag} frames at ref scale"
    gt = seq.poses_gt[init_lag:]
    ate = ate_rmse(est, gt, with_scale=True)
    print(f"mono ref-scale ATE: {ate*100:.2f}cm init_lag={init_lag} "
          f"kf={slam.n_keyframes()} pts={slam.n_points()}")
    assert ate < 0.06, f"mono ref-scale ATE {ate:.3f}m"


@pytest.mark.slow
def test_mono_batch_streaming_matches_per_frame():
    """track_batch_mono: bootstrap consumes leading frames through the
    per-frame path, the rest stream in chunks; trajectory must match the
    per-frame API's (same compiled step, same chunk math)."""
    n = 30
    seq = generate_sequence(n_frames=n, width=320, height=240, seed=5)

    ref = System(make_mono_config())
    for i in range(n):
        ref.track_monocular(seq.images[i], float(seq.timestamps[i]))
    assert ref.state == STATE_OK

    slam = System(make_mono_config())
    poses = slam.track_batch_mono(seq.images, seq.timestamps)
    assert slam.state == STATE_OK, "mono streaming lost tracking"
    assert len(poses) > 0
    _, est = slam.get_trajectory()
    _, est_ref = ref.get_trajectory()
    assert len(est) == len(est_ref)
    k = len(est)
    ate = ate_rmse(est, seq.poses_gt[n - k:], with_scale=True)
    ate_r = ate_rmse(est_ref, seq.poses_gt[n - k:], with_scale=True)
    print(f"mono stream ATE={ate*100:.2f}cm per-frame={ate_r*100:.2f}cm")
    assert ate < 0.08
