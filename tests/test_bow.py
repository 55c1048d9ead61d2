import jax.numpy as jnp
import numpy as np
import pytest

from self_commit_orb_slam2_tpu.ops.bow import (
    Vocabulary, bow_vector, l1_score, train_vocabulary, transform,
)


def rand_desc(rng, n):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


@pytest.fixture(scope="module")
def vocab():
    rng = np.random.default_rng(0)
    return train_vocabulary(rand_desc(rng, 3000), k=8, L=3, seed=0)


def test_vocab_structure(vocab):
    assert vocab.n_words > 100
    wid = np.asarray(vocab.word_id)
    assert (wid >= 0).sum() == vocab.n_words


def test_transform_deterministic(vocab, rng):
    d = jnp.asarray(rand_desc(rng, 100))
    w1, n1 = transform(vocab, d, jnp.ones(100, bool))
    w2, n2 = transform(vocab, d, jnp.ones(100, bool))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    assert np.all(np.asarray(w1) >= 0)


def test_invalid_descriptors_masked(vocab, rng):
    d = jnp.asarray(rand_desc(rng, 10))
    valid = jnp.asarray(np.arange(10) < 5)
    w, n = transform(vocab, d, valid)
    assert np.all(np.asarray(w)[5:] == -1)
    assert np.all(np.asarray(n)[5:] == -1)


def test_similar_descriptors_same_word(vocab, rng):
    base = rand_desc(rng, 50)
    # flip 3 bits
    noisy = base.copy()
    for i in range(50):
        for b in rng.choice(256, 3, replace=False):
            noisy[i, b // 32] ^= np.uint32(1 << (b % 32))
    w1, _ = transform(vocab, jnp.asarray(base), jnp.ones(50, bool))
    w2, _ = transform(vocab, jnp.asarray(noisy), jnp.ones(50, bool))
    same = (np.asarray(w1) == np.asarray(w2)).mean()
    assert same > 0.6, f"only {same:.0%} stable under 3-bit noise"


def test_bow_scoring_discriminates(vocab, rng):
    d1 = rand_desc(rng, 300)
    d2 = d1.copy()
    # frame 2 = frame 1 with some churn
    d2[:100] = rand_desc(rng, 100)
    d3 = rand_desc(rng, 300)
    vs = []
    for d in (d1, d2, d3):
        w, _ = transform(vocab, jnp.asarray(d), jnp.ones(300, bool))
        vs.append(bow_vector(vocab, w))
    db = jnp.stack(vs)
    scores = np.asarray(l1_score(vs[0], db))
    assert scores[0] > 0.99  # self
    assert scores[1] > scores[2] + 0.1  # overlapping frame beats random
    assert np.all(scores >= -1e-5) and np.all(scores <= 1 + 1e-5)


def test_place_recognition_on_images():
    """Frames near each other in the synthetic sequence must score higher
    than distant ones."""
    from self_commit_orb_slam2_tpu.ops.orb import OrbConfig
    from self_commit_orb_slam2_tpu.ops.orb.extractor import extract
    from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence

    seq = generate_sequence(n_frames=30, width=320, height=240, seed=5)
    cfg = OrbConfig(n_features=300)
    descs, valids = [], []
    for i in (0, 1, 2, 14, 15, 28, 29):
        f = extract(jnp.asarray(seq.images[i]), cfg)
        descs.append(np.asarray(f.desc))
        valids.append(np.asarray(f.valid))
    train = np.concatenate([d[v] for d, v in zip(descs, valids)])
    vocab = train_vocabulary(train, k=8, L=3, seed=1)
    vs = []
    for d, v in zip(descs, valids):
        w, _ = transform(vocab, jnp.asarray(d), jnp.asarray(v))
        vs.append(bow_vector(vocab, w))
    db = jnp.stack(vs)
    s = np.asarray(l1_score(vs[0], db))  # query = frame 0
    # neighbors (frames 1,2) beat the far frames (14,15)
    assert s[1] > s[3] and s[2] > s[3], s
    assert s[1] > s[4] and s[2] > s[4], s


def test_sparse_scoring_matches_dense():
    """sparse_bow/sparse_l1_score must reproduce the dense l1_score exactly —
    the sparse path is what scales the database to ORBvoc-sized (10^5-10^6
    word) vocabularies where a dense [K, W] store is impossible."""
    import numpy as np
    import jax.numpy as jnp
    from self_commit_orb_slam2_tpu.ops import bow as bow_ops

    rng = np.random.default_rng(0)
    descs = rng.integers(0, 2**32, (600, 8), dtype=np.uint32)
    vocab = bow_ops.train_vocabulary(descs, k=5, L=3, seed=1)
    T = 128

    def frame_vecs(seed):
        d = rng.integers(0, 2**32, (90, 8), dtype=np.uint32)
        words, _ = bow_ops.transform(vocab, jnp.asarray(d),
                                     jnp.ones(len(d), bool))
        dense = bow_ops.bow_vector(vocab, words)
        ids, vals = bow_ops.sparse_bow(vocab, words, T)
        return words, dense, ids, vals

    q_words, q_dense, q_ids, q_vals = frame_vecs(1)
    rows = [frame_vecs(i + 2) for i in range(6)]
    db_dense = jnp.stack([r[1] for r in rows])
    db_ids = jnp.stack([r[2] for r in rows])
    db_vals = jnp.stack([r[3] for r in rows])

    want = np.asarray(bow_ops.l1_score(q_dense, db_dense))
    got = np.asarray(bow_ops.sparse_l1_score(q_ids, q_vals, db_ids, db_vals))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # shared-word counts match the dense formulation too
    want_cw = np.asarray(jnp.sum((q_dense > 0)[None, :] & (db_dense > 0),
                                 axis=1))
    got_cw = np.asarray(bow_ops.sparse_common_words(q_ids, db_ids))
    np.testing.assert_array_equal(got_cw, want_cw)
