"""Relocalization: recover tracking after getting kidnapped/lost."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from self_commit_orb_slam2_tpu.models.config import Capacities, SlamConfig, TrackingConfig
from self_commit_orb_slam2_tpu.models.system import STATE_LOST, STATE_OK, System
from self_commit_orb_slam2_tpu.ops.bow import train_vocabulary
from self_commit_orb_slam2_tpu.ops.camera import CameraParams
from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig, extract
from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence


@pytest.fixture(scope="module")
def vocab_and_seq():
    seq = generate_sequence(n_frames=20, width=320, height=240, seed=5)
    cfg = OrbConfig(n_features=300)
    descs = []
    for i in range(0, 20, 4):
        f = extract(jnp.asarray(seq.images[i]), cfg)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    vocab = train_vocabulary(np.concatenate(descs), k=8, L=3, seed=2)
    return vocab, seq


def make_config(vocab):
    cam = CameraParams.create(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                              bf=26.0, width=320, height=240)
    return SlamConfig(
        camera=cam, orb=OrbConfig(n_features=500),
        caps=Capacities(max_keyframes=32, max_points=8192, local_points=1024),
        tracking=TrackingConfig(max_frames_between_kf=8),
        sensor="rgbd", vocab=vocab,
    )


@pytest.mark.slow
def test_relocalization_after_kidnap(vocab_and_seq):
    vocab, seq = vocab_and_seq
    slam = System(make_config(vocab))
    # map the sequence
    for i in range(16):
        slam.track_rgbd(seq.images[i], seq.depths[i], float(i) / 30.0)
    assert slam.state == STATE_OK
    assert slam.n_keyframes() >= 2

    # kidnap: feed blank frames to force LOST
    blank = np.zeros_like(seq.images[0])
    for j in range(3):
        slam.track_rgbd(blank, seq.depths[0] * 0, 1.0 + j)
    assert slam.state == STATE_LOST

    # return to a previously mapped view: relocalization must recover
    recovered = False
    for j in range(3):
        T = slam.track_rgbd(seq.images[4], seq.depths[4], 2.0 + j)
        if slam.state == STATE_OK:
            recovered = True
            break
    assert recovered, "relocalization failed"
    # recovered pose should be near the original frame-4 estimate
    T4 = slam.trajectory[4][1]
    c_new = -T[:3, :3].T @ T[:3, 3]
    c_old = -T4[:3, :3].T @ T4[:3, 3]
    assert np.linalg.norm(c_new - c_old) < 0.1, np.linalg.norm(c_new - c_old)


@pytest.mark.slow
def test_relocalization_in_batched_mode(vocab_and_seq):
    """Mid-batch kidnap recovery: the in-graph reloc branch (pipeline
    track_step's lax.cond on the LOST edge) must recover INSIDE one
    track_batch call — the benched/throughput mode no longer dead-reckons
    to the end of the batch (reference Tracking.cc:523-629,:2030)."""
    vocab, seq = vocab_and_seq
    slam = System(make_config(vocab))
    # map the scene with per-frame calls first
    for i in range(14):
        slam.track_rgbd(seq.images[i], seq.depths[i], float(i) / 30.0)
    assert slam.state == STATE_OK

    # one batched call: 3 blank frames (kidnap) then mapped views again
    imgs = np.stack([np.zeros_like(seq.images[0])] * 3
                    + [seq.images[4]] * 3 + [seq.images[5]] * 2)
    deps = np.stack([np.zeros_like(seq.depths[0])] * 3
                    + [seq.depths[4]] * 3 + [seq.depths[5]] * 2)
    ts = np.arange(8) / 30.0 + 1.0
    poses = slam.track_batch_rgbd(imgs, deps, ts)
    assert slam.state == STATE_OK, "batched mode failed to relocalize in-graph"
    # recovered pose near the original frame-4 estimate
    T4 = slam.trajectory[4][1]
    T = poses[-3]
    c_new = -T[:3, :3].T @ T[:3, 3]
    c_old = -T4[:3, :3].T @ T4[:3, 3]
    assert np.linalg.norm(c_new - c_old) < 0.15, np.linalg.norm(c_new - c_old)
