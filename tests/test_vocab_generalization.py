"""The SHIPPED vocabulary must work on scenes outside its training corpus.

The reference ships ORBvoc.txt, trained on an independent real-image corpus
and used on every dataset (DBoW2 TemplatedVocabulary.h:1338) — its whole
value is generalization.  Our shipped vocabulary
(assets/vocab_synthetic.npz) is trained by scripts/train_vocab.py on the
held-out texture families (voronoi / stripe-blob / warped-checker /
halftone + photometric augmentation, utils/synthetic.py) — a corpus
DISJOINT from the value-noise family that every test and bench scene is
built from.  These tests prove, on the shipped file itself:

  1. provenance: the asset records the held-out corpus (no value-noise);
  2. retrieval: on value-noise scenes the vocabulary has NEVER seen, the
     true revisit outranks distractor scenes;
  3. e2e: relocalization works in-pipeline with the shipped vocabulary.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from self_commit_orb_slam2_tpu.ops.bow import (
    bow_vector, l1_score, load_vocabulary, transform, vocabulary_provenance,
)
from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig, extract
from self_commit_orb_slam2_tpu.run_slam import _default_vocab_path
from self_commit_orb_slam2_tpu.utils.synthetic import (
    generate_sequence, lookat_trajectory,
)

N_SCENES = 6


@pytest.fixture(scope="module")
def shipped_vocab():
    return load_vocabulary(_default_vocab_path())


def test_shipped_vocab_provenance_is_held_out():
    prov = vocabulary_provenance(_default_vocab_path())
    assert "held-out corpus" in prov, (
        f"shipped vocabulary lacks held-out training provenance: {prov!r}")
    assert "value_noise test family EXCLUDED" in prov


@pytest.mark.slow
def test_retrieval_ranks_true_revisit_on_unseen_scenes(shipped_vocab):
    """Two views of each of N_SCENES unseen value-noise scenes: querying
    with view B must rank its own scene's view A above every distractor."""
    vocab = shipped_vocab
    cfg = OrbConfig(n_features=500)
    traj = lookat_trajectory(8)  # views 0 and 5: same place, ~20deg apart
    vecs_a, vecs_b = [], []
    for s in range(N_SCENES):
        seq = generate_sequence(width=320, height=240, seed=100 + s,
                                trajectory=traj)
        for img, store in ((seq.images[0], vecs_a), (seq.images[5], vecs_b)):
            f = extract(jnp.asarray(img), cfg)
            words, _ = transform(vocab, f.desc, f.valid)
            store.append(np.asarray(bow_vector(vocab, words)))
    db = jnp.asarray(np.stack(vecs_a))       # [S, W] view-A database
    hits, margins = 0, []
    for s in range(N_SCENES):
        scores = np.asarray(l1_score(jnp.asarray(vecs_b[s]), db))
        hits += int(np.argmax(scores) == s)
        others = np.delete(scores, s)
        margins.append(scores[s] - others.max())
    assert hits >= N_SCENES - 1, (
        f"top-1 retrieval only {hits}/{N_SCENES} on unseen scenes")
    assert np.median(margins) > 0.01, (
        f"revisit barely separated from distractors: margins={margins}")


@pytest.mark.slow
def test_relocalization_with_shipped_vocab(shipped_vocab):
    """End-to-end: kidnap + recovery through the in-pipeline relocalizer
    using the shipped (held-out-trained) vocabulary on unseen scenes."""
    from self_commit_orb_slam2_tpu.models.config import (
        Capacities, SlamConfig, TrackingConfig,
    )
    from self_commit_orb_slam2_tpu.models.system import STATE_LOST, STATE_OK, System
    from self_commit_orb_slam2_tpu.ops.camera import CameraParams

    seq = generate_sequence(n_frames=20, width=320, height=240, seed=5)
    cam = CameraParams.create(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                              bf=26.0, width=320, height=240)
    slam = System(SlamConfig(
        camera=cam, orb=OrbConfig(n_features=500),
        caps=Capacities(max_keyframes=32, max_points=8192, local_points=1024),
        tracking=TrackingConfig(max_frames_between_kf=8),
        sensor="rgbd", vocab=shipped_vocab,
    ))
    for i in range(16):
        slam.track_rgbd(seq.images[i], seq.depths[i], float(i) / 30.0)
    assert slam.state == STATE_OK
    blank = np.zeros_like(seq.images[0])
    for j in range(3):
        slam.track_rgbd(blank, seq.depths[0] * 0, 1.0 + j)
    assert slam.state == STATE_LOST
    recovered = False
    for j in range(3):
        T = slam.track_rgbd(seq.images[4], seq.depths[4], 2.0 + j)
        if slam.state == STATE_OK:
            recovered = True
            break
    assert recovered, "relocalization failed with the shipped vocabulary"
    T4 = slam.trajectory[4][1]
    c_new = -T[:3, :3].T @ T[:3, 3]
    c_old = -T4[:3, :3].T @ T4[:3, 3]
    assert np.linalg.norm(c_new - c_old) < 0.1
