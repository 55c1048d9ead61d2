import jax
import jax.numpy as jnp
import numpy as np
import pytest

from self_commit_orb_slam2_tpu.ops.matching import (
    hamming_table,
    masked_best_match,
    mutual_best_match,
    rotation_consistency_mask,
    window_mask,
)
from self_commit_orb_slam2_tpu.ops.matching.hamming import INVALID_DIST


def np_hamming(a, b):
    return np.sum([bin(int(x) ^ int(y)).count("1") for x, y in zip(a, b)])


def rand_desc(rng, n):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


def test_hamming_table_matches_numpy(rng):
    d1 = rand_desc(rng, 5)
    d2 = rand_desc(rng, 7)
    table = np.asarray(hamming_table(jnp.asarray(d1), jnp.asarray(d2)))
    for i in range(5):
        for j in range(7):
            assert table[i, j] == np_hamming(d1[i], d2[j])


def test_hamming_invalid_masking(rng):
    d1 = rand_desc(rng, 4)
    d2 = rand_desc(rng, 4)
    v1 = jnp.array([True, False, True, True])
    v2 = jnp.array([True, True, False, True])
    t = np.asarray(hamming_table(jnp.asarray(d1), jnp.asarray(d2), v1, v2))
    assert (t[1] == int(INVALID_DIST)).all()
    assert (t[:, 2] == int(INVALID_DIST)).all()


def flip_bits(rng, desc, n_bits):
    """Flip n_bits random bits of one 8-word descriptor."""
    d = desc.copy()
    for b in rng.choice(256, size=n_bits, replace=False):
        d[b // 32] ^= np.uint32(1 << (b % 32))
    return d


def test_best_match_finds_noisy_copy(rng):
    base = rand_desc(rng, 20)
    noisy = np.stack([flip_bits(rng, base[i], 10) for i in range(20)])
    perm = rng.permutation(20)
    res = masked_best_match(
        jnp.asarray(base), jnp.asarray(noisy[perm]),
        jnp.ones((20, 20), bool), jnp.ones(20, bool), jnp.ones(20, bool),
        max_dist=50,
    )
    inv = np.argsort(perm)
    np.testing.assert_array_equal(np.asarray(res.idx), inv)
    assert np.all(np.asarray(res.dist) == 10)


def test_best_match_respects_mask(rng):
    base = rand_desc(rng, 4)
    res = masked_best_match(
        jnp.asarray(base), jnp.asarray(base),
        ~jnp.eye(4, dtype=bool),  # forbid the perfect self match
        jnp.ones(4, bool), jnp.ones(4, bool), max_dist=256,
    )
    assert np.all(np.asarray(res.idx) != np.arange(4))


def test_ratio_test_rejects_ambiguous(rng):
    d = rand_desc(rng, 1)
    # two targets nearly equidistant
    t = np.stack([flip_bits(rng, d[0], 20), flip_bits(rng, d[0], 22)])
    res = masked_best_match(
        jnp.asarray(d), jnp.asarray(t), jnp.ones((1, 2), bool),
        jnp.ones(1, bool), jnp.ones(2, bool), max_dist=100, ratio=0.8,
    )
    assert not bool(res.valid[0])
    # one clear winner
    t2 = np.stack([flip_bits(rng, d[0], 5), flip_bits(rng, d[0], 120)])
    res2 = masked_best_match(
        jnp.asarray(d), jnp.asarray(t2), jnp.ones((1, 2), bool),
        jnp.ones(1, bool), jnp.ones(2, bool), max_dist=100, ratio=0.8,
    )
    assert bool(res2.valid[0]) and int(res2.idx[0]) == 0


def test_mutual_best_match_unique(rng):
    base = rand_desc(rng, 30)
    noisy = np.stack([flip_bits(rng, base[i], 8) for i in range(30)])
    res = mutual_best_match(
        jnp.asarray(base), jnp.asarray(noisy), jnp.ones((30, 30), bool),
        jnp.ones(30, bool), jnp.ones(30, bool), max_dist=60, ratio=0.9,
    )
    idx = np.asarray(res.idx)[np.asarray(res.valid)]
    assert len(np.unique(idx)) == len(idx)  # no target matched twice
    assert len(idx) >= 25


def test_window_mask():
    pred = jnp.array([[10.0, 10.0], [50.0, 50.0]])
    tgt = jnp.array([[12.0, 9.0], [80.0, 80.0], [52.0, 47.0]])
    m = np.asarray(window_mask(pred, tgt, jnp.array([4.0, 4.0])))
    assert m[0, 0] and not m[0, 1] and not m[0, 2]
    assert m[1, 2] and not m[1, 0] and not m[1, 1]


def test_rotation_consistency(rng):
    from self_commit_orb_slam2_tpu.ops.matching.core import MatchResult

    n = 100
    angle_q = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    angle_t = angle_q - 0.3  # consistent rotation of 0.3 rad
    outliers = rng.choice(n, 10, replace=False)
    angle_t[outliers] = rng.uniform(0, 2 * np.pi, 10)  # inconsistent
    match = MatchResult(
        idx=jnp.arange(n, dtype=jnp.int32), dist=jnp.zeros(n, jnp.int32),
        valid=jnp.ones(n, bool),
    )
    keep = np.asarray(
        rotation_consistency_mask(jnp.asarray(angle_q), jnp.asarray(angle_t), match)
    )
    assert keep.sum() >= 85  # inliers kept
    assert keep[outliers].sum() <= 3  # most outliers dropped


@pytest.mark.slow
def test_stereo_depth_on_synthetic():
    from self_commit_orb_slam2_tpu.ops.matching.stereo import match_stereo
    from self_commit_orb_slam2_tpu.ops.orb import OrbConfig
    from self_commit_orb_slam2_tpu.ops.orb.extractor import extract
    from self_commit_orb_slam2_tpu.ops.orb.pyramid import build_pyramid
    from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence

    baseline = 0.12
    seq = generate_sequence(n_frames=1, width=320, height=240, seed=2,
                            stereo_baseline=baseline)
    cfg = OrbConfig(n_features=600)
    img_l = jnp.asarray(seq.images[0])
    img_r = jnp.asarray(seq.right_images[0])
    f_l = extract(img_l, cfg)
    f_r = extract(img_r, cfg)
    bf = seq.K[0, 0] * baseline
    sm = match_stereo(
        f_l.xy, f_l.level, f_l.desc, f_l.valid,
        f_r.xy, f_r.level, f_r.desc, f_r.valid,
        build_pyramid(img_l, cfg.n_levels, cfg.scale_factor),
        build_pyramid(img_r, cfg.n_levels, cfg.scale_factor),
        jnp.float32(bf), jnp.float32(baseline * 2),
        jnp.asarray(cfg.scale_factors()),
    )
    valid = np.asarray(sm.valid)
    assert valid.sum() > 100, f"only {valid.sum()} stereo matches"
    xy = np.asarray(f_l.xy)[valid]
    est_depth = np.asarray(sm.depth)[valid]
    gt = seq.depths[0][
        np.clip(xy[:, 1].astype(int), 0, 239), np.clip(xy[:, 0].astype(int), 0, 319)
    ]
    rel_err = np.abs(est_depth - gt) / np.maximum(gt, 1e-6)
    # majority of matched points within 5% depth error
    assert np.median(rel_err) < 0.05, f"median depth error {np.median(rel_err):.3f}"
    assert (rel_err < 0.1).mean() > 0.7
