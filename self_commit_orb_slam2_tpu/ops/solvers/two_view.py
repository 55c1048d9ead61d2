"""Monocular two-view initialization: batched H/F RANSAC + motion recovery.

TPU-native redesign of the reference Initializer (src/Initializer.cc):

  * the reference runs 200 sequential RANSAC iterations for H (DLT) and F
    (8-point) in two std::threads (:188-198); here ALL hypotheses are solved
    in one batched SVD/eigh call each — RANSAC is embarrassingly parallel and
    exactly the kind of work the TPU eats;
  * model selection keeps the reference's symmetric-transfer scoring
    (CheckHomography :616 / CheckFundamental :813, thresholds 5.991 / 3.841)
    and the RH = SH/(SH+SF) > 0.40 rule (:203-210);
  * motion recovery: F -> E -> 4 decompositions (DecomposeE :1798) and
    H -> Faugeras' 8 hypotheses (ReconstructH :1135), all checked in batch by
    cheirality/parallax/reprojection (CheckRT :1578).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import se3
from ..camera import CameraParams
from ..triangulate import triangulate_linear


class TwoViewResult(NamedTuple):
    success: jnp.ndarray       # scalar bool
    Tcw2: jnp.ndarray          # [4, 4] pose of view 2 (view 1 = identity)
    points: jnp.ndarray        # [N, 3] triangulated points
    is_triangulated: jnp.ndarray  # [N] bool
    used_homography: jnp.ndarray  # scalar bool
    n_good: jnp.ndarray        # scalar int32


def _normalize(pts: jnp.ndarray, valid: jnp.ndarray):
    """Hartley normalization (reference Initializer::Normalize :1501)."""
    w = valid.astype(pts.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(pts * w[:, None], axis=0) / n
    d = jnp.abs(pts - mean) * w[:, None]
    mean_dev = jnp.sum(d, axis=0) / n
    s = 1.0 / jnp.maximum(mean_dev, 1e-9)
    norm = (pts - mean) * s
    T = jnp.array(
        [[s[0], 0, -mean[0] * s[0]], [0, s[1], -mean[1] * s[1]], [0, 0, 1.0]],
        dtype=pts.dtype,
    )
    return norm, T


def _sample_minimal_sets(key, n_points: int, valid, n_hyp: int, set_size: int = 8):
    """[n_hyp, 8] indices drawn from valid correspondences (with replacement
    across sets; reference uses seeded draws without replacement per set,
    DUtils::Random — collisions merely waste a hypothesis)."""
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    return jax.random.choice(
        key, n_points, shape=(n_hyp, set_size), replace=True, p=probs
    )


def _solve_h_batch(p1: jnp.ndarray, p2: jnp.ndarray, weights=None) -> jnp.ndarray:
    """DLT homographies for [B, 4+, 2] point sets -> [B, 3, 3] (reference
    ComputeH21 :1318: SVD of the 2n x 9 system).  Optional weights [B, n]
    zero out constraint rows (all-inlier refit)."""
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    zero = jnp.zeros_like(x1)
    one = jnp.ones_like(x1)
    rows_a = jnp.stack([zero, zero, zero, -x1, -y1, -one, y2 * x1, y2 * y1, y2], -1)
    rows_b = jnp.stack([x1, y1, one, zero, zero, zero, -x2 * x1, -x2 * y1, -x2], -1)
    if weights is not None:
        rows_a = rows_a * weights[..., None]
        rows_b = rows_b * weights[..., None]
    A = jnp.concatenate([rows_a, rows_b], axis=-2)  # [B, 2n, 9]
    AtA = jnp.einsum("bki,bkj->bij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    h = vecs[..., :, 0]
    return h.reshape(h.shape[:-1] + (3, 3))


def _solve_f_batch(p1: jnp.ndarray, p2: jnp.ndarray, weights=None) -> jnp.ndarray:
    """8-point fundamental matrices [B, 8, 2] -> [B, 3, 3] with rank-2
    projection (reference ComputeF21 :1390)."""
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    one = jnp.ones_like(x1)
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, one], -1)
    if weights is not None:
        A = A * weights[..., None]
    AtA = jnp.einsum("bki,bkj->bij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    f = vecs[..., :, 0].reshape(-1, 3, 3)
    U, S, Vt = jnp.linalg.svd(f)
    S = S.at[..., 2].set(0.0)
    return U @ (S[..., :, None] * Vt)


def _score_h(H, Hinv, p1, p2, valid, sigma: float = 1.0):
    """Symmetric transfer score (reference CheckHomography :616, th 5.991)."""
    th = 5.991
    inv_s2 = 1.0 / (sigma * sigma)

    def transfer(M, a, b):
        # M [B, 3, 3] applied to a [N, 2] -> errors [B, N]
        ax, ay = a[None, :, 0], a[None, :, 1]
        g = lambda i, j: M[:, i, j][:, None]
        x = g(0, 0) * ax + g(0, 1) * ay + g(0, 2)
        y = g(1, 0) * ax + g(1, 1) * ay + g(1, 2)
        w = g(2, 0) * ax + g(2, 1) * ay + g(2, 2)
        w = jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
        return ((x / w - b[None, :, 0]) ** 2 + (y / w - b[None, :, 1]) ** 2) * inv_s2

    c1 = transfer(H, p1, p2)
    c2 = transfer(Hinv, p2, p1)
    ok = (c1 < th) & (c2 < th) & valid
    score = jnp.where(ok, (th - c1) + (th - c2), 0.0)
    return jnp.sum(score, axis=-1), ok


def _score_f(F, p1, p2, valid, sigma: float = 1.0):
    """Symmetric epipolar score (reference CheckFundamental :813,
    th 3.841 gating / 5.991 scoring)."""
    th = 3.841
    th_score = 5.991
    inv_s2 = 1.0 / (sigma * sigma)

    def epi(Fm, a, b):
        # distance of b [N,2] to the epipolar lines Fm [B,3,3] @ a -> [B, N]
        ax, ay = a[None, :, 0], a[None, :, 1]
        g = lambda i, j: Fm[:, i, j][:, None]
        l0 = g(0, 0) * ax + g(0, 1) * ay + g(0, 2)
        l1 = g(1, 0) * ax + g(1, 1) * ay + g(1, 2)
        l2 = g(2, 0) * ax + g(2, 1) * ay + g(2, 2)
        num = (b[None, :, 0] * l0 + b[None, :, 1] * l1 + l2) ** 2
        den = jnp.maximum(l0 * l0 + l1 * l1, 1e-12)
        return num / den * inv_s2

    c1 = epi(F, p1, p2)
    Ft = jnp.swapaxes(F, -1, -2)
    c2 = epi(Ft, p2, p1)
    ok = (c1 < th) & (c2 < th) & valid
    score = jnp.where(c1 < th, th_score - c1, 0.0) + jnp.where(c2 < th, th_score - c2, 0.0)
    return jnp.sum(jnp.where(valid, score, 0.0), axis=-1), ok


def _check_rt(cam, R, t, p1, p2, valid, sigma: float = 1.0):
    """Cheirality + parallax + reprojection check for one (R, t) hypothesis
    over all correspondences (reference CheckRT :1578).  Returns
    (n_good, good_mask, points, parallax_ok)."""
    T1 = jnp.eye(4, dtype=R.dtype)
    T2 = se3.rt_to_mat(R, t)
    K = cam.K
    P1 = jnp.einsum("ij,jk->ik", K, T1[:3, :4])
    P2 = jnp.einsum("ij,jk->ik", K, T2[:3, :4])
    pts = triangulate_linear(p1, p2, P1, P2)
    finite = jnp.all(jnp.isfinite(pts), axis=-1)

    c1 = jnp.zeros(3, dtype=R.dtype)
    c2 = -R.T @ t
    ray1 = pts - c1
    ray2 = pts - c2
    n1 = jnp.linalg.norm(ray1, axis=-1)
    n2 = jnp.linalg.norm(ray2, axis=-1)
    cos_par = jnp.sum(ray1 * ray2, axis=-1) / jnp.maximum(n1 * n2, 1e-9)

    z1 = pts[:, 2]
    pc2 = pts @ R.T + t
    z2 = pc2[:, 2]

    th2 = 4.0 * sigma * sigma
    u1 = cam.fx * pts[:, 0] / jnp.where(jnp.abs(z1) < 1e-9, 1e-9, z1) + cam.cx
    v1 = cam.fy * pts[:, 1] / jnp.where(jnp.abs(z1) < 1e-9, 1e-9, z1) + cam.cy
    e1 = (u1 - p1[:, 0]) ** 2 + (v1 - p1[:, 1]) ** 2
    u2 = cam.fx * pc2[:, 0] / jnp.where(jnp.abs(z2) < 1e-9, 1e-9, z2) + cam.cx
    v2 = cam.fy * pc2[:, 1] / jnp.where(jnp.abs(z2) < 1e-9, 1e-9, z2) + cam.cy
    e2 = (u2 - p2[:, 0]) ** 2 + (v2 - p2[:, 1]) ** 2

    good = (
        valid & finite & (z1 > 0) & (z2 > 0)
        & (cos_par < 0.99998) & (e1 < th2) & (e2 < th2)
    )
    n_good = jnp.sum(good)
    # parallax of the 50th-best (reference takes the min(50, n)-th parallax)
    par = jnp.where(good, jnp.arccos(jnp.clip(cos_par, -1.0, 1.0)), 0.0)
    par_sorted = jnp.sort(par)[::-1]
    idx50 = jnp.minimum(49, jnp.maximum(n_good - 1, 0))
    parallax_deg = jnp.rad2deg(par_sorted[idx50])
    return n_good, good, pts, parallax_deg


def _decompose_e(E: jnp.ndarray):
    """E -> (R1, R2, t) candidates (reference DecomposeE :1798)."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = U @ W.T @ Vt
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-9)
    return R1, R2, t


def _reconstruct_f(cam, F, p1, p2, inliers, sigma=1.0, min_points=50, min_parallax=1.0):
    """Pick the best of the 4 E decompositions (reference ReconstructF :956)."""
    K = cam.K
    E = K.T @ F @ K
    R1, R2, t = _decompose_e(E)
    hyps = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    results = [ _check_rt(cam, R, tt, p1, p2, inliers, sigma) for R, tt in hyps ]
    n_goods = jnp.stack([r[0] for r in results])
    best = jnp.argmax(n_goods)
    n_best = n_goods[best]
    good = jnp.stack([r[1] for r in results])[best]
    pts = jnp.stack([r[2] for r in results])[best]
    par = jnp.stack([r[3] for r in results])[best]
    R = jnp.stack([h[0] for h in hyps])[best]
    tt = jnp.stack([h[1] for h in hyps])[best]
    # acceptance (reference :1090-1130): clear winner, enough points, parallax
    n_second = jnp.sort(n_goods)[-2]
    n_inl = jnp.sum(inliers)
    ok = (
        (n_best > 0.7 * jnp.maximum(n_second, 1))
        & (n_best >= jnp.maximum(0.9 * n_inl, min_points))
        & (par > min_parallax)
    )
    return ok, se3.rt_to_mat(R, tt), pts, good, n_best


def _reconstruct_h(cam, H, p1, p2, inliers, sigma=1.0, min_points=50, min_parallax=1.0):
    """Faugeras decomposition: 8 motion hypotheses from H (reference
    ReconstructH :1135)."""
    K = cam.K
    Kinv = jnp.linalg.inv(K)
    A = Kinv @ H @ K
    U, w, Vt = jnp.linalg.svd(A)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = w[0], w[1], w[2]

    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    x1s = jnp.array([aux1, aux1, -aux1, -aux1])
    x3s = jnp.array([aux3, -aux3, aux3, -aux3])

    # case d' > 0
    aux_st = jnp.sqrt(jnp.maximum(
        (d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.maximum((d1 + d3) * d2, 1e-12)
    ct = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    sts = jnp.array([aux_st, -aux_st, -aux_st, aux_st])
    # case d' < 0
    aux_sp = jnp.sqrt(jnp.maximum(
        (d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.maximum((d1 - d3) * d2, 1e-12)
    cp = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    sps = jnp.array([aux_sp, -aux_sp, -aux_sp, aux_sp])

    hyps_R, hyps_t = [], []
    for i in range(4):
        Rp = jnp.array([[ct, 0.0, -sts[i]], [0.0, 1.0, 0.0], [sts[i], 0.0, ct]])
        tp = (d1 - d3) * jnp.array([x1s[i], 0.0, -x3s[i]])
        hyps_R.append(s * U @ Rp @ Vt)
        hyps_t.append(U @ tp)
    for i in range(4):
        Rp = jnp.array([[cp, 0.0, sps[i]], [0.0, -1.0, 0.0], [sps[i], 0.0, -cp]])
        tp = (d1 + d3) * jnp.array([x1s[i], 0.0, x3s[i]])
        hyps_R.append(s * U @ Rp @ Vt)
        hyps_t.append(U @ tp)

    results = []
    for R, t in zip(hyps_R, hyps_t):
        t = t / jnp.maximum(jnp.linalg.norm(t), 1e-9)
        results.append(_check_rt(cam, R, t, p1, p2, inliers, sigma))
    n_goods = jnp.stack([r[0] for r in results])
    best = jnp.argmax(n_goods)
    n_best = n_goods[best]
    n_second = jnp.sort(n_goods)[-2]
    good = jnp.stack([r[1] for r in results])[best]
    pts = jnp.stack([r[2] for r in results])[best]
    par = jnp.stack([r[3] for r in results])[best]
    R = jnp.stack(hyps_R)[best]
    t = jnp.stack(hyps_t)[best]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-9)
    n_inl = jnp.sum(inliers)
    ok = (
        (n_best > 0.75 * jnp.maximum(n_second, 1))
        & (n_best >= jnp.maximum(0.9 * n_inl, min_points))
        & (par > min_parallax)
    )
    return ok, se3.rt_to_mat(R, t), pts, good, n_best


def initialize_two_view(
    cam: CameraParams,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    valid: jnp.ndarray,
    key: jnp.ndarray,
    n_hypotheses: int = 256,
    sigma: float = 1.0,
    min_points: int = 50,
    min_parallax: float = 1.0,
) -> TwoViewResult:
    """Full monocular bootstrap from matched pixel pairs.

    uv1/uv2 [N, 2] matched undistorted pixels, valid [N].  Reference:
    Initializer::Initialize (src/Initializer.cc:68-231) with 200 hypotheses;
    we use 256 solved fully in parallel.
    """
    n1, T1n = _normalize(uv1, valid)
    n2, T2n = _normalize(uv2, valid)
    k1, k2 = jax.random.split(key)
    sets = _sample_minimal_sets(k1, uv1.shape[0], valid, n_hypotheses)

    s1 = n1[sets]  # [B, 8, 2]
    s2 = n2[sets]
    H_n = _solve_h_batch(s1, s2)
    F_n = _solve_f_batch(s1, s2)
    T2n_inv = jnp.linalg.inv(T2n)
    H = T2n_inv @ H_n @ T1n          # denormalize (reference :1336)
    F = T2n.T @ F_n @ T1n

    h_scores, h_inl = _score_h(H, jnp.linalg.inv(H), uv1, uv2, valid, sigma)
    f_scores, f_inl = _score_f(F, uv1, uv2, valid, sigma)

    bh = jnp.argmax(h_scores)
    bf = jnp.argmax(f_scores)
    SH = h_scores[bh]
    SF = f_scores[bf]
    rh = SH / jnp.maximum(SH + SF, 1e-9)
    use_h = rh > 0.40  # reference :203-210

    # Refit the winning models on ALL their inliers (masked full-DLT): the
    # f32 minimal-set estimate is too noisy to survive CheckRT's 4 sigma^2
    # gate; the reference gets away without this because its solves run in
    # double precision.
    def refit(solver, inliers):
        return solver(n1[None], n2[None], inliers.astype(n1.dtype)[None])[0]

    H_best = T2n_inv @ refit(_solve_h_batch, h_inl[bh]) @ T1n
    F_best = T2n.T @ refit(_solve_f_batch, f_inl[bf]) @ T1n
    _, h_inl_r = _score_h(H_best[None], jnp.linalg.inv(H_best)[None], uv1, uv2, valid, sigma)
    _, f_inl_r = _score_f(F_best[None], uv1, uv2, valid, sigma)

    ok_h, T_h, pts_h, good_h, n_h = _reconstruct_h(cam, H_best, uv1, uv2, h_inl_r[0], sigma, min_points, min_parallax)
    ok_f, T_f, pts_f, good_f, n_f = _reconstruct_f(cam, F_best, uv1, uv2, f_inl_r[0], sigma, min_points, min_parallax)

    success = jnp.where(use_h, ok_h, ok_f)
    Tcw2 = jnp.where(use_h, T_h, T_f)
    pts = jnp.where(use_h, pts_h, pts_f)
    good = jnp.where(use_h, good_h, good_f)
    n_good = jnp.where(use_h, n_h, n_f)
    return TwoViewResult(
        success=success, Tcw2=Tcw2, points=pts, is_triangulated=good,
        used_homography=use_h, n_good=n_good.astype(jnp.int32),
    )
