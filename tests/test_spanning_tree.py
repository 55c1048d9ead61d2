"""Covisibility spanning tree: the essential graph's backbone.

Reference: each keyframe's parent is its most covisible existing keyframe
(KeyFrame::ChangeParent / first UpdateConnections, src/KeyFrame.cc:498-556),
children re-parent when the parent is culled (SetBadFlag :571-724), and
OptimizeEssentialGraph runs over spanning-tree + covisibility + loop edges
(src/Optimizer.cc:1100-1265).

On a sequential video the tree equals the temporal chain.  This test builds
a BRANCHING trajectory where they differ: map a sector, kidnap, relocalize
back at the START view, then branch into a new sector.  Keyframes created
after relocalization are covisible with the EARLIEST keyframes, not the
latest — their tree parents must jump back across the sequence, and the
essential-graph edges must follow the tree, not insertion order.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from self_commit_orb_slam2_tpu.models.config import (
    Capacities, SlamConfig, TrackingConfig,
)
from self_commit_orb_slam2_tpu.models.loop_closing import essential_tree_edges
from self_commit_orb_slam2_tpu.models.system import STATE_OK, System
from self_commit_orb_slam2_tpu.ops.bow import train_vocabulary
from self_commit_orb_slam2_tpu.ops.camera import CameraParams
from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig, extract
from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence

N_A = 22   # sector-A frames (sweep one way)
N_B = 22   # sector-B frames (sweep the other way, from the start view)


def _lookat_pose(th: float, radius: float = 2.0) -> np.ndarray:
    target = np.array([0.0, 0.0, 3.0])
    c = target + np.array([radius * np.sin(th), 0.0, -radius * np.cos(th)])
    z = target - c
    z = z / np.linalg.norm(z)
    x = np.cross(np.array([0.0, 1.0, 0.0]), z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    Rwc = np.stack([x, y, z], axis=1)
    T = np.eye(4)
    T[:3, :3] = Rwc.T
    T[:3, 3] = -Rwc.T @ c
    return T


def _branching_trajectory():
    ths_a = [0.55 * np.sin(2 * np.pi * i / 120) for i in range(N_A)]
    ths_b = [-0.030 * j for j in range(N_B)]   # branch from the START view
    return np.stack([_lookat_pose(t) for t in ths_a + ths_b]).astype(np.float32)


@pytest.fixture(scope="module")
def branch_run():
    traj = _branching_trajectory()
    seq = generate_sequence(width=320, height=240, seed=13, trajectory=traj)
    ocfg = OrbConfig(n_features=300)
    descs = []
    for i in range(0, N_A, 4):
        f = extract(jnp.asarray(seq.images[i]), ocfg)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    vocab = train_vocabulary(np.concatenate(descs), k=8, L=3, seed=4)

    cam = CameraParams.create(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                              bf=26.0, width=320, height=240)
    slam = System(SlamConfig(
        camera=cam, orb=OrbConfig(n_features=500),
        caps=Capacities(max_keyframes=32, max_points=8192, local_points=1024),
        tracking=TrackingConfig(max_frames_between_kf=6),
        sensor="rgbd", vocab=vocab,
    ))
    for i in range(N_A):
        slam.track_rgbd(seq.images[i], seq.depths[i], i / 30.0)
    assert slam.state == STATE_OK
    seq_before_branch = int(np.asarray(slam.map.n_kf)) - 1  # last sector-A seq

    # kidnap: blank frames force LOST, then the START view relocalizes
    blank = np.zeros_like(seq.images[0])
    for j in range(3):
        slam.track_rgbd(blank, seq.depths[0] * 0, 2.0 + j / 30.0)
    # branch: sweep the other way from the start view
    for j in range(N_B):
        slam.track_rgbd(seq.images[N_A + j], seq.depths[N_A + j],
                        3.0 + j / 30.0)
    assert slam.state == STATE_OK, "failed to relocalize and track the branch"
    return slam, seq_before_branch


@pytest.mark.slow
def test_tree_parent_jumps_across_branch(branch_run):
    slam, seq_a_last = branch_run
    m = slam.map
    kf_valid = np.asarray(m.kf_valid)
    kf_seq = np.asarray(m.kf_seq)
    parent = np.asarray(m.kf_tree_parent_seq)

    branch_kfs = [s for s in np.nonzero(kf_valid)[0]
                  if kf_seq[s] > seq_a_last]
    assert branch_kfs, "no keyframes created after the branch"
    # the FIRST branch keyframe is covisible with the earliest sector-A
    # keyframes (the start view), not with the last one: its tree parent
    # must differ from its temporal predecessor
    first_b = min(branch_kfs, key=lambda s: kf_seq[s])
    temporal_pred_seq = kf_seq[first_b] - 1
    assert parent[first_b] != temporal_pred_seq, (
        "tree parent equals the temporal predecessor on a branching "
        f"trajectory (parent seq {parent[first_b]})")
    assert parent[first_b] <= seq_a_last // 2, (
        f"branch keyframe's parent seq {parent[first_b]} is not an early "
        f"sector-A keyframe (expected <= {seq_a_last // 2})")


@pytest.mark.slow
def test_tree_well_formed(branch_run):
    slam, _ = branch_run
    m = slam.map
    kf_valid = np.asarray(m.kf_valid)
    kf_seq = np.asarray(m.kf_seq)
    parent = np.asarray(m.kf_tree_parent_seq)
    live = np.nonzero(kf_valid)[0]
    roots = 0
    for s in live:
        if parent[s] < 0:
            roots += 1
            continue
        # acyclic: parent strictly older
        assert parent[s] < kf_seq[s], (
            f"kf slot {s}: parent seq {parent[s]} >= own seq {kf_seq[s]}")
    assert roots >= 1, "no root keyframe"


@pytest.mark.slow
def test_essential_edges_follow_tree(branch_run):
    slam, seq_a_last = branch_run
    m = slam.map
    ei, ej, ev = (np.asarray(x) for x in essential_tree_edges(m))
    kf_seq = np.asarray(m.kf_seq)
    kf_valid = np.asarray(m.kf_valid)
    parent = np.asarray(m.kf_tree_parent_seq)
    # map live parent seqs to slots
    seq_to_slot = {int(kf_seq[s]): s for s in np.nonzero(kf_valid)[0]}
    checked = 0
    for i, j, ok in zip(ei, ej, ev):
        if not ok:
            continue
        pseq = int(parent[i])
        if pseq in seq_to_slot:   # live parent: edge must target it
            assert j == seq_to_slot[pseq], (
                f"edge from slot {i} goes to {j}, tree parent is "
                f"{seq_to_slot[pseq]} (seq {pseq})")
            checked += 1
    assert checked >= 3, "too few tree edges verified"
    # at least one edge crosses the branch (connects a post-branch keyframe
    # to an early sector-A keyframe, skipping the insertion order)
    crossing = [
        (i, j) for i, j, ok in zip(ei, ej, ev)
        if ok and kf_seq[i] > seq_a_last and kf_seq[j] <= seq_a_last // 2
    ]
    assert crossing, "no essential edge follows the tree across the branch"
