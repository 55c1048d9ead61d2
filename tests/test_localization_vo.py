"""Localization-mode visual odometry: survive off-map excursions.

Reference semantics under test (src/Tracking.cc):
  * UpdateLastFrame (:1247-1350) — temporal "VO" map points from the last
    frame's close stereo/RGB-D depth keep motion tracking alive where the
    map has no coverage;
  * the mbVO machinery (:523-656) — when matches to REAL map points drop
    below 10, the tracker flags "map support lost", skips local-map
    tracking, and hunts for relocalization every frame, preferring the
    reloc solution when it lands (:568-624).

Scenario: build a map of the cluster sector, switch to localization mode,
yaw the camera ~125 degrees away from everything mapped (VO territory),
then yaw back.  The tracker must (a) enter VO mode off-map instead of
going LOST, (b) keep producing poses there, (c) relocalize on return and
drop the VO flag.
"""

import numpy as np
import pytest

from self_commit_orb_slam2_tpu.models.config import (
    Capacities, SlamConfig, TrackingConfig,
)
from self_commit_orb_slam2_tpu.models.system import STATE_OK, System
from self_commit_orb_slam2_tpu.ops.bow import train_vocabulary
from self_commit_orb_slam2_tpu.ops.camera import CameraParams
from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig, extract
from self_commit_orb_slam2_tpu.utils.synthetic import (
    generate_sequence, lookat_trajectory,
)

N_MAP = 24          # mapping phase frames (lookat arc over the cluster)
YAW_MAX = 2.2       # rad (~126 deg): far outside the mapped sector
YAW_STEP = 0.05     # rad/frame (~13 px/frame at fx=260)
HOLD = 4


def _yaw_pose(yaw: float, center: np.ndarray) -> np.ndarray:
    cy, sy = np.cos(yaw), np.sin(yaw)
    Rwc = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    T = np.eye(4)
    T[:3, :3] = Rwc.T
    T[:3, 3] = -Rwc.T @ center
    return T


def _excursion_trajectory():
    """Mapping arc, then yaw away to YAW_MAX and back (Tcw [n,4,4])."""
    poses = [p for p in lookat_trajectory(N_MAP)]
    center = np.array([0.0, 0.0, 1.0])  # first lookat camera center
    ramp = np.arange(YAW_STEP, YAW_MAX + 1e-9, YAW_STEP)
    yaws = np.concatenate([
        ramp, np.full(HOLD, YAW_MAX), ramp[::-1], np.zeros(HOLD),
    ])
    poses += [_yaw_pose(y, center) for y in yaws]
    return np.stack(poses).astype(np.float32), len(ramp)


@pytest.fixture(scope="module")
def seq_and_vocab():
    traj, n_ramp = _excursion_trajectory()
    seq = generate_sequence(width=320, height=240, seed=11, trajectory=traj)
    cfg = OrbConfig(n_features=300)
    descs = []
    for i in range(0, N_MAP, 4):
        import jax.numpy as jnp

        f = extract(jnp.asarray(seq.images[i]), cfg)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    vocab = train_vocabulary(np.concatenate(descs), k=8, L=3, seed=3)
    return seq, vocab, n_ramp


def _make_system(vocab):
    cam = CameraParams.create(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                              bf=26.0, width=320, height=240)
    cfg = SlamConfig(
        camera=cam, orb=OrbConfig(n_features=500),
        caps=Capacities(max_keyframes=32, max_points=8192, local_points=1024),
        tracking=TrackingConfig(max_frames_between_kf=8),
        sensor="rgbd", vocab=vocab,
    )
    return System(cfg)


@pytest.mark.slow
def test_vo_survives_offmap_excursion(seq_and_vocab):
    seq, vocab, n_ramp = seq_and_vocab
    slam = _make_system(vocab)
    for i in range(N_MAP):
        slam.track_rgbd(seq.images[i], seq.depths[i], float(seq.timestamps[i]))
    assert slam.state == STATE_OK
    assert slam.n_keyframes() >= 2
    assert not slam.vo_mode

    slam.activate_localization_mode()
    n_loc = len(seq.images) - N_MAP
    vo_flags, ok_flags, centers = [], [], []
    for j in range(n_loc):
        i = N_MAP + j
        T = slam.track_rgbd(seq.images[i], seq.depths[i],
                            float(seq.timestamps[i]))
        vo_flags.append(slam.vo_mode)
        ok_flags.append(slam.state == STATE_OK)
        centers.append(-T[:3, :3].T @ T[:3, 3])
    vo_flags = np.asarray(vo_flags)
    ok_flags = np.asarray(ok_flags)

    # (a) far off-map (yaw near YAW_MAX) the tracker must flag VO mode —
    # matches to real map points have collapsed, yet tracking continues
    far = slice(n_ramp - 6, n_ramp + HOLD)
    assert vo_flags[far].any(), "never entered VO mode off-map"
    # (b) VO keeps the tracker alive through the excursion: the reference
    # would be LOST the whole way without temporal points
    assert ok_flags.mean() >= 0.7, f"tracking alive only {ok_flags.mean():.0%}"
    assert ok_flags[far].any(), "LOST throughout the off-map segment"
    # (c) back home: relocalized onto the map, VO flag dropped, pose correct.
    # SLAM's world frame is the FIRST camera (identity at init), so the
    # expected pose is the gt pose composed against the first frame's gt.
    assert ok_flags[-1], "did not recover on return"
    assert not vo_flags[-1], "VO flag stuck after relocalization"
    T0_inv = np.linalg.inv(seq.poses_gt[0])

    def exp_center(i):
        T = seq.poses_gt[i] @ T0_inv
        return -T[:3, :3].T @ T[:3, 3]

    err = np.linalg.norm(centers[-1] - exp_center(len(seq.images) - 1))
    assert err < 0.15, f"return pose off by {err:.3f} m"

    # VO poses should stay sane (bounded drift, not teleporting): every
    # tracked camera center within 1 m of ground truth
    gt_centers = np.stack([exp_center(N_MAP + j) for j in range(n_loc)])
    errs = np.linalg.norm(np.stack(centers) - gt_centers, axis=1)[ok_flags]
    assert np.max(errs) < 1.0, f"VO pose diverged: max err {np.max(errs):.2f} m"


@pytest.mark.slow
def test_fleet_serving_survives_offmap_excursion(seq_and_vocab):
    """Fleet localization-serving inherits VO through the shared pipeline:
    one stream replays mapped views (control) while another leaves the
    mapped sector — the excursion stream must flag vo, keep tracking, and
    recover on return; the control stream must never flag vo."""
    from self_commit_orb_slam2_tpu.parallel.fleet import (
        FleetTracker, make_fleet_mesh,
    )

    seq, vocab, n_ramp = seq_and_vocab
    slam = _make_system(vocab)
    for i in range(N_MAP):
        slam.track_rgbd(seq.images[i], seq.depths[i], float(seq.timestamps[i]))
    m = slam.map

    fleet = FleetTracker(slam.config, n_streams=2, mesh=make_fleet_mesh(2),
                         localization_only=True)
    ok = fleet.initialize_localization(
        m,
        np.stack([seq.images[0], seq.images[N_MAP]]),   # both near yaw 0
        np.stack([seq.depths[0], seq.depths[N_MAP]]),
        np.zeros(2, np.float32),
    )
    assert ok.all(), "fleet relocalization bring-up failed"

    n_loc = len(seq.images) - N_MAP
    B = 8
    n_chunks = n_loc // B
    saw_vo_away = False
    for c in range(n_chunks):
        lo = N_MAP + c * B
        # stream 0 (control): cycle mapped views; stream 1: the excursion
        ctrl = [(c * B + k) % N_MAP for k in range(B)]
        a = np.stack([seq.images[ctrl], seq.images[lo:lo + B]])
        d = np.stack([seq.depths[ctrl], seq.depths[lo:lo + B]])
        ts = np.tile((np.arange(B) + c * B) / 30.0, (2, 1))
        fleet.track_chunk(a, d, ts)
        assert not fleet.vo[0], "control stream flagged VO on mapped views"
        if lo + B > N_MAP + n_ramp - 6 and lo < N_MAP + n_ramp + HOLD:
            saw_vo_away = saw_vo_away or bool(fleet.vo[1])
    assert saw_vo_away, "excursion stream never entered VO off-map"
    assert fleet.state_ok[1], "excursion stream did not recover on return"
    assert not fleet.vo[1], "VO flag stuck after return"


@pytest.mark.slow
def test_localization_mode_stays_on_map(seq_and_vocab):
    """Control: while the view stays mapped, localization mode must track
    on real map support (vo_mode False throughout) and create no keyframes."""
    seq, vocab, _ = seq_and_vocab
    slam = _make_system(vocab)
    for i in range(N_MAP):
        slam.track_rgbd(seq.images[i], seq.depths[i], float(seq.timestamps[i]))
    n_kf = slam.n_keyframes()
    slam.activate_localization_mode()
    for i in range(N_MAP - 8, N_MAP):  # replay mapped views
        slam.track_rgbd(seq.images[i], seq.depths[i],
                        float(seq.timestamps[i]) + 10.0)
        assert slam.state == STATE_OK
        assert not slam.vo_mode
    assert slam.n_keyframes() == n_kf, "localization mode created keyframes"
