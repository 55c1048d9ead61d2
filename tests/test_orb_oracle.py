"""Bit-exactness of rotated BRIEF + IC orientation vs a from-spec numpy oracle.

The oracle below is written INDEPENDENTLY from the reference's spec
(src/ORBextractor.cc: IC_Angle :108 with the umax row widths :579-608,
computeOrbDescriptor :173 with the rotation convention
x' = round(px*cos - py*sin), y' = round(px*sin + py*cos), bit = t0 < t1),
in plain numpy loops — no shared code with the JAX kernels under test.
"""

import jax.numpy as jnp
import numpy as np

from self_commit_orb_slam2_tpu.ops.orb import brief, orientation, pyramid
from self_commit_orb_slam2_tpu.ops.orb.brief_pattern import BIT_PATTERN_31

HALF = 15


def _umax_mask():
    """Circular patch exactly as the reference builds it: per-row widths
    umax[v] = round(sqrt(15^2 - v^2)) with the symmetry fix-up
    (ORBextractor.cc:579-608)."""
    vmax = int(np.floor(HALF * np.sqrt(2.0) / 2 + 1))
    vmin = int(np.ceil(HALF * np.sqrt(2.0) / 2))
    umax = np.zeros(HALF + 2, np.int32)
    for v in range(vmax + 1):
        umax[v] = int(round(np.sqrt(HALF * HALF - v * v)))
    # symmetry fix-up
    v0 = 0
    for v in range(HALF, vmin - 1, -1):
        while umax[v0] == umax[v0 + 1]:
            v0 += 1
        umax[v] = v0
        v0 += 1
    mask = np.zeros((2 * HALF + 1, 2 * HALF + 1), bool)
    for v in range(-HALF, HALF + 1):
        u_lim = umax[abs(v)]
        for u in range(-u_lim, u_lim + 1):
            mask[v + HALF, u + HALF] = True
    return mask


def _oracle_ic_angle(img, cx, cy):
    """IC_Angle oracle: moments over the umax-shaped circular patch."""
    mask = _umax_mask()
    m10 = m01 = 0.0
    for v in range(-HALF, HALF + 1):
        for u in range(-HALF, HALF + 1):
            if mask[v + HALF, u + HALF]:
                val = float(img[cy + v, cx + u])
                m10 += u * val
                m01 += v * val
    return np.arctan2(m01, m10)


def _oracle_brief(blurred, cx, cy, angle):
    """computeOrbDescriptor oracle: 256 rotated point-pair comparisons."""
    ca, sa = np.cos(angle), np.sin(angle)
    pat = np.asarray(BIT_PATTERN_31).reshape(256, 4)
    words = np.zeros(8, np.uint32)
    h, w = blurred.shape
    for i in range(256):
        x1, y1, x2, y2 = (float(v) for v in pat[i])
        rx1 = int(round(x1 * ca - y1 * sa)); ry1 = int(round(x1 * sa + y1 * ca))
        rx2 = int(round(x2 * ca - y2 * sa)); ry2 = int(round(x2 * sa + y2 * ca))
        gx1 = min(max(cx + rx1, 0), w - 1); gy1 = min(max(cy + ry1, 0), h - 1)
        gx2 = min(max(cx + rx2, 0), w - 1); gy2 = min(max(cy + ry2, 0), h - 1)
        t0 = blurred[gy1, gx1]
        t1 = blurred[gy2, gx2]
        if t0 < t1:
            words[i // 32] |= np.uint32(1) << np.uint32(i % 32)
    return words


def _test_image(h=96, w=128, seed=3):
    rng = np.random.default_rng(seed)
    # smooth-ish random texture so orientations are well defined
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    k = np.outer(np.hanning(9), np.hanning(9))
    from numpy.fft import irfft2, rfft2

    img = np.real(irfft2(rfft2(img) * rfft2(k, img.shape)))
    img = (img - img.min()) / (np.ptp(img) + 1e-9) * 255.0
    return img.astype(np.float32)


def test_brief_bit_exact_vs_oracle():
    img = _test_image()
    blurred = np.asarray(pyramid.gaussian_blur(jnp.asarray(img)))
    rng = np.random.default_rng(1)
    n = 24
    xs = rng.integers(20, img.shape[1] - 20, n)
    ys = rng.integers(20, img.shape[0] - 20, n)
    angles = rng.uniform(-np.pi, np.pi, n).astype(np.float32)

    xy = jnp.asarray(np.stack([xs, ys], 1).astype(np.float32))
    desc = np.asarray(brief.describe(jnp.asarray(blurred), xy,
                                     jnp.asarray(angles)))
    for i in range(n):
        want = _oracle_brief(blurred, int(xs[i]), int(ys[i]), float(angles[i]))
        got = desc[i].astype(np.uint32)
        assert np.array_equal(got, want), (
            f"descriptor {i} mismatch: {np.binary_repr(int(got[0]), 32)} vs "
            f"{np.binary_repr(int(want[0]), 32)}")


def test_ic_angle_matches_oracle():
    img = _test_image(seed=5)
    rng = np.random.default_rng(2)
    n = 16
    xs = rng.integers(18, img.shape[1] - 18, n)
    ys = rng.integers(18, img.shape[0] - 18, n)
    xy = jnp.asarray(np.stack([xs, ys], 1).astype(np.float32))
    slab = jnp.asarray(img)[None]  # single-level slab
    got = np.asarray(orientation.keypoint_angles_slab(
        slab, xy, jnp.zeros(n, jnp.int32)))
    for i in range(n):
        want = _oracle_ic_angle(img, int(xs[i]), int(ys[i]))
        # the JAX kernel uses the centered-disc mask, the oracle the umax
        # widths — the regions agree (the disc test reproduces the umax
        # widths), so angles must agree to float-accumulation order
        da = np.arctan2(np.sin(got[i] - want), np.cos(got[i] - want))
        assert abs(da) < 2e-3, f"angle {i}: {got[i]} vs {want} (d={da})"
