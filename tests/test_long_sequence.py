"""Bounded-map operation over long sequences: slot reuse under culling.

The reference runs 4500-frame KITTI sequences with keyframe/point culling
keeping the map bounded (src/LocalMapping.cc:261,873).  Our analogue: culled
keyframe/point slots are RECLAIMED by the free-list allocator, so keyframe
creation never starves at `max_keyframes` while culling keeps up, and old
trajectory entries stay resolvable through the cull archive.
"""

import numpy as np
import pytest

from self_commit_orb_slam2_tpu.models.config import (
    Capacities, SlamConfig, TrackingConfig,
)
from self_commit_orb_slam2_tpu.models.system import STATE_OK, System
from self_commit_orb_slam2_tpu.ops.camera import CameraParams
from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig
from self_commit_orb_slam2_tpu.utils.evaluation import ate_rmse
from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence


def _config(width=320, height=240, fx=260.0, max_kf=12):
    cam = CameraParams.create(
        fx=fx, fy=fx, cx=width / 2, cy=height / 2, bf=fx * 0.1,
        width=width, height=height,
    )
    return SlamConfig(
        camera=cam,
        orb=OrbConfig(n_features=400),
        # deliberately tiny keyframe capacity: a long run MUST recycle slots
        caps=Capacities(max_keyframes=max_kf, max_points=8192,
                        local_points=768, cull_log=256),
        tracking=TrackingConfig(max_frames_between_kf=2,
                                min_frames_between_kf=0,
                                # each KF births ~100 single-observation
                                # points, capping redundancy below the 0.9
                                # default on this short synthetic loop
                                kf_cull_redundancy=0.7),
        sensor="rgbd",
    )


@pytest.mark.slow
def test_long_sequence_bounded_map():
    """KF creation keeps flowing long after total insertions exceed the
    capacity; live counts stay bounded; trajectory stays accurate."""
    n = 60
    # lingering oscillation around one view: every keyframe re-observes the
    # same points, so the 90%-redundancy rule keeps firing and slots recycle
    from self_commit_orb_slam2_tpu.utils.synthetic import lookat_trajectory

    traj = lookat_trajectory(n, sweep=0.22, frames_per_cycle=24)
    seq = generate_sequence(n_frames=n, width=320, height=240, fx=260.0,
                            seed=7, trajectory=traj)
    cfg = _config()
    slam = System(cfg, enable_loop_closing=False)
    created_late = 0
    for i in range(n):
        slam.track_rgbd(seq.images[i], seq.depths[i],
                        float(seq.timestamps[i]))
        assert slam.state == STATE_OK, f"tracking lost at frame {i}"
        total = int(np.asarray(slam.map.n_kf))
        live = int(np.asarray(slam.map.kf_valid).sum())
        assert live <= cfg.caps.max_keyframes
        if i > n // 2 and total > cfg.caps.max_keyframes:
            created_late += 1

    total = int(np.asarray(slam.map.n_kf))
    live = int(np.asarray(slam.map.kf_valid).sum())
    culled = int(np.asarray(slam.map.n_culled))
    # the run must have inserted MORE keyframes than the capacity holds —
    # i.e. culled slots were actually reclaimed, not starved
    assert total > cfg.caps.max_keyframes, (
        f"only {total} keyframes ever inserted; capacity {cfg.caps.max_keyframes} "
        "was never exceeded, so slot reuse is untested")
    assert culled == total - live

    # point slots too: live points bounded, allocation kept working
    live_pts = int(np.asarray(slam.map.pt_valid).sum())
    assert 0 < live_pts <= cfg.caps.max_points

    ts, poses = slam.get_trajectory()
    assert len(ts) == n
    ate = ate_rmse(poses, seq.poses_gt)
    print(f"long-run: {total} KFs inserted, {live} live, {culled} culled, "
          f"{live_pts} pts, ATE {ate*100:.2f}cm")
    assert ate < 0.08, f"ATE {ate:.3f}m too high over the long run"


def test_insert_reuses_freed_slot():
    """Unit check: insert_keyframe lands in a freed slot and allocation
    never starves while any slot is invalid."""
    import jax.numpy as jnp

    from self_commit_orb_slam2_tpu.models import map_state as ms
    from self_commit_orb_slam2_tpu.models.frame import FrameData

    cfg = _config(max_kf=4)
    m = ms.empty_map(cfg)
    N = cfg.orb.feat_capacity()
    frame = FrameData(
        xy=jnp.zeros((N, 2)), xy_raw=jnp.zeros((N, 2)),
        response=jnp.zeros(N), angle=jnp.zeros(N),
        level=jnp.zeros(N, jnp.int32), desc=jnp.zeros((N, 8), jnp.uint32),
        valid=jnp.ones(N, bool), u_right=jnp.full(N, -1.0),
        depth=jnp.full(N, -1.0),
    )
    obs = jnp.full(N, -1, jnp.int32)
    slots = []
    for i in range(4):
        m, s = ms.insert_keyframe(m, frame, jnp.eye(4), jnp.int32(i),
                                  jnp.float32(i), obs)
        slots.append(int(s))
    assert slots == [0, 1, 2, 3]
    assert int(m.n_kf) == 4
    # full: the next insert is dropped
    m2, s = ms.insert_keyframe(m, frame, jnp.eye(4), jnp.int32(4),
                               jnp.float32(4.0), obs)
    assert int(m2.n_kf) == 4 and not bool(m2.kf_valid[int(s)] & (m2.kf_seq[int(s)] == 4))
    # free slot 2 -> next insert reuses it with a fresh seq
    m = m._replace(kf_valid=m.kf_valid.at[2].set(False))
    m, s = ms.insert_keyframe(m, frame, jnp.eye(4), jnp.int32(5),
                              jnp.float32(5.0), obs)
    assert int(s) == 2
    assert int(m.kf_seq[2]) == 4
    assert int(ms.latest_kf(m)) == 2
