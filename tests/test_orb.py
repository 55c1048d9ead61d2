import jax
import jax.numpy as jnp
import numpy as np
import pytest

from self_commit_orb_slam2_tpu.ops.orb import OrbConfig, build_extractor
from self_commit_orb_slam2_tpu.ops.orb import fast as fast_mod
from self_commit_orb_slam2_tpu.ops.orb.brief import describe
from self_commit_orb_slam2_tpu.ops.orb.pyramid import build_pyramid, gaussian_blur
from self_commit_orb_slam2_tpu.utils.synthetic import value_noise_texture


def hamming(d1, d2):
    return int(jnp.sum(jax.lax.population_count(jnp.bitwise_xor(d1, d2))))


@pytest.fixture(scope="module")
def texture():
    return value_noise_texture(np.random.default_rng(1), size=320, sharp_features=120)


def test_fast_detects_synthetic_corner():
    img = np.zeros((64, 64), np.float32)
    img[20:44, 20:44] = 200.0  # bright square: 4 strong corners
    resp = np.asarray(fast_mod.fast_response(jnp.asarray(img), 20.0))
    nms = np.asarray(fast_mod.nms3x3(jnp.asarray(resp)))
    ys, xs = np.nonzero(nms)
    corners = {(20, 20), (20, 43), (43, 20), (43, 43)}
    found = set(zip(ys.tolist(), xs.tolist()))
    # each true corner has a detection within 2px
    for cy, cx in corners:
        assert any(abs(cy - y) <= 2 and abs(cx - x) <= 2 for y, x in found), (cy, cx)


def test_fast_flat_image_no_corners():
    img = jnp.full((64, 64), 100.0)
    resp = np.asarray(fast_mod.fast_response(img, 20.0))
    assert resp.max() == 0.0


def test_fast_threshold_monotonic(texture):
    hi = np.asarray(fast_mod.fast_response(jnp.asarray(texture), 20.0))
    lo = np.asarray(fast_mod.fast_response(jnp.asarray(texture), 7.0))
    assert (lo > 0).sum() >= (hi > 0).sum()


def test_pyramid_shapes(texture):
    levels = build_pyramid(jnp.asarray(texture), 8, 1.2)
    assert len(levels) == 8
    assert levels[0].shape == (320, 320)
    for lv in range(1, 8):
        assert levels[lv].shape[0] == int(round(320 / 1.2**lv))


def test_extractor_end_to_end(texture):
    cfg = OrbConfig(n_features=500)
    ext = build_extractor(cfg)
    feats = ext(jnp.asarray(texture))
    assert feats.capacity == cfg.feat_capacity()  # budget padded to 128 lanes
    assert not np.asarray(feats.valid)[sum(cfg.level_budgets()):].any()
    n_valid = int(np.asarray(feats.valid).sum())
    assert n_valid > 300, f"only {n_valid} features on rich texture"
    xy = np.asarray(feats.xy)[np.asarray(feats.valid)]
    assert xy[:, 0].min() >= 0 and xy[:, 0].max() < 320 * 1.0 + 1
    # spatial spread: features cover at least half the image quadrants
    qx = (xy[:, 0] > 160).astype(int) + 2 * (xy[:, 1] > 160).astype(int)
    assert len(np.unique(qx)) == 4
    # levels populated
    lv = np.asarray(feats.level)[np.asarray(feats.valid)]
    assert len(np.unique(lv)) >= 4


def test_descriptor_rotation_invariance(texture):
    """Descriptors of the same physical point should be Hamming-close under
    in-plane rotation (the point of steered BRIEF)."""
    from scipy.ndimage import rotate

    cfg = OrbConfig(n_features=300, n_levels=1)
    ext = build_extractor(cfg)
    f0 = ext(jnp.asarray(texture))
    deg = 20.0
    rot = rotate(texture, deg, reshape=False, order=1, mode="nearest").astype(np.float32)
    f1 = ext(jnp.asarray(rot))

    # map f0 keypoints into rotated image coords
    th = np.deg2rad(deg)
    c, s = np.cos(th), np.sin(th)
    ctr = np.array([159.5, 159.5])
    xy0 = np.asarray(f0.xy) - ctr
    # scipy.ndimage.rotate rotates image CCW by deg; a point at p in original
    # appears at R(-th) p in the rotated image (inverse mapping).
    xy0_in_rot = np.stack([c * xy0[:, 0] + s * xy0[:, 1], -s * xy0[:, 0] + c * xy0[:, 1]], -1) + ctr

    v0 = np.asarray(f0.valid)
    v1 = np.asarray(f1.valid)
    xy1 = np.asarray(f1.xy)
    d0 = np.asarray(f0.desc)
    d1 = np.asarray(f1.desc)

    dists = []
    for i in np.nonzero(v0)[0]:
        # nearest rotated keypoint within 2px
        dd = np.linalg.norm(xy1 - xy0_in_rot[i], axis=-1)
        dd[~v1] = 1e9
        j = np.argmin(dd)
        if dd[j] < 2.0:
            dists.append(hamming(jnp.asarray(d0[i]), jnp.asarray(d1[j])))
    assert len(dists) > 30, "too few repeatable keypoints under rotation"
    med = np.median(dists)
    assert med <= 40, f"median Hamming {med} too high: rotation invariance broken"


def test_descriptor_distinctiveness(texture):
    cfg = OrbConfig(n_features=300, n_levels=1)
    ext = build_extractor(cfg)
    f = ext(jnp.asarray(texture))
    v = np.asarray(f.valid)
    d = np.asarray(f.desc)[v]
    # random pairs should be ~128 bits apart
    rng = np.random.default_rng(0)
    idx = rng.permutation(len(d))
    dists = [hamming(jnp.asarray(d[i]), jnp.asarray(d[j]))
             for i, j in zip(idx[:50], np.roll(idx, 1)[:50])]
    assert 80 < np.mean(dists) < 180


def test_blur_preserves_mean(texture):
    b = np.asarray(gaussian_blur(jnp.asarray(texture)))
    assert abs(b.mean() - texture.mean()) < 1.0
    assert b.std() < texture.std()


def test_descriptor_bits_deterministic(texture):
    cfg = OrbConfig(n_features=100, n_levels=2)
    ext = build_extractor(cfg)
    f1 = ext(jnp.asarray(texture))
    f2 = ext(jnp.asarray(texture))
    np.testing.assert_array_equal(np.asarray(f1.desc), np.asarray(f2.desc))
