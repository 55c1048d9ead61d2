"""Batched two-view linear triangulation and its acceptance gates.

TPU-native equivalent of Initializer::Triangulate (reference
src/Initializer.cc:1461-1499: DLT via SVD of the 4x4 system) and the
per-candidate gating logic of LocalMapping::CreateNewMapPoints
(src/LocalMapping.cc:312-626: parallax, positive depth, reprojection chi2,
scale consistency).  Designed to triangulate thousands of candidate pairs in
one batched call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import se3
from .camera import CameraParams, project


def projection_matrix(K: jnp.ndarray, Tcw: jnp.ndarray) -> jnp.ndarray:
    """K [3,3] x Tcw [...,4,4] -> P [...,3,4]."""
    return jnp.einsum("ij,...jk->...ik", K, Tcw[..., :3, :4])


def triangulate_linear(
    uv1: jnp.ndarray, uv2: jnp.ndarray, P1: jnp.ndarray, P2: jnp.ndarray
) -> jnp.ndarray:
    """DLT triangulation of pixel pairs.

    uv1, uv2: [..., 2] pixel coords; P1, P2: [..., 3, 4] projection matrices.
    Returns world points [..., 3].  Solves the 4x4 homogeneous system with SVD
    exactly like the reference (src/Initializer.cc:1461: A row_i = u*P.row2 -
    P.row0 etc., x = V.col3 dehomogenized).
    """
    rows = jnp.stack(
        [
            uv1[..., 0, None] * P1[..., 2, :] - P1[..., 0, :],
            uv1[..., 1, None] * P1[..., 2, :] - P1[..., 1, :],
            uv2[..., 0, None] * P2[..., 2, :] - P2[..., 0, :],
            uv2[..., 1, None] * P2[..., 2, :] - P2[..., 1, :],
        ],
        axis=-2,
    )  # [..., 4, 4]
    # Null vector of A: eigenvector of A^T A with smallest eigenvalue.
    # (eigh is cheaper & more TPU-friendly than full SVD for 4x4 batches.)
    AtA = jnp.einsum("...ki,...kj->...ij", rows, rows)
    _, vecs = jnp.linalg.eigh(AtA)
    x = vecs[..., :, 0]  # smallest eigenvalue first for eigh
    w = x[..., 3]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return x[..., :3] / w[..., None]


def triangulate_linear_fast(
    uv1: jnp.ndarray, uv2: jnp.ndarray, P1: jnp.ndarray, P2: jnp.ndarray
) -> jnp.ndarray:
    """Inhomogeneous DLT: fix w=1 and solve the 4x3 system by closed-form
    3x3 normal equations (adjugate / determinant).

    The hot-path alternative to triangulate_linear: batched 4x4 eigh lowers
    to an iterative Jacobi sweep on TPU (~3ms per mapping phase at 1024
    candidates); this is ~200 flops of pure VPU math per point.  The w=1
    normalization differs from the SVD null vector only for points near
    infinity, which the parallax/depth gates reject anyway (reference gates
    LocalMapping.cc:430-560)."""
    rows = jnp.stack(
        [
            uv1[..., 0, None] * P1[..., 2, :] - P1[..., 0, :],
            uv1[..., 1, None] * P1[..., 2, :] - P1[..., 1, :],
            uv2[..., 0, None] * P2[..., 2, :] - P2[..., 0, :],
            uv2[..., 1, None] * P2[..., 2, :] - P2[..., 1, :],
        ],
        axis=-2,
    )  # [..., 4, 4]
    A = rows[..., :3]                                   # [..., 4, 3]
    b = -rows[..., 3]                                   # [..., 4]
    N = jnp.einsum("...ki,...kj->...ij", A, A)          # [..., 3, 3]
    rhs = jnp.einsum("...ki,...k->...i", A, b)          # [..., 3]
    # closed-form 3x3 solve via adjugate
    c00 = N[..., 1, 1] * N[..., 2, 2] - N[..., 1, 2] * N[..., 2, 1]
    c01 = N[..., 0, 2] * N[..., 2, 1] - N[..., 0, 1] * N[..., 2, 2]
    c02 = N[..., 0, 1] * N[..., 1, 2] - N[..., 0, 2] * N[..., 1, 1]
    c10 = N[..., 1, 2] * N[..., 2, 0] - N[..., 1, 0] * N[..., 2, 2]
    c11 = N[..., 0, 0] * N[..., 2, 2] - N[..., 0, 2] * N[..., 2, 0]
    c12 = N[..., 0, 2] * N[..., 1, 0] - N[..., 0, 0] * N[..., 1, 2]
    c20 = N[..., 1, 0] * N[..., 2, 1] - N[..., 1, 1] * N[..., 2, 0]
    c21 = N[..., 0, 1] * N[..., 2, 0] - N[..., 0, 0] * N[..., 2, 1]
    c22 = N[..., 0, 0] * N[..., 1, 1] - N[..., 0, 1] * N[..., 1, 0]
    det = (N[..., 0, 0] * c00 + N[..., 1, 0] * c01 + N[..., 2, 0] * c02)
    inv_det = jnp.where(jnp.abs(det) > 1e-20, 1.0 / det, 0.0)
    adj = jnp.stack([
        jnp.stack([c00, c01, c02], -1),
        jnp.stack([c10, c11, c12], -1),
        jnp.stack([c20, c21, c22], -1),
    ], -2)
    return jnp.einsum("...ij,...j->...i", adj, rhs) * inv_det[..., None]


def triangulation_gates(
    cam: CameraParams,
    pts_w: jnp.ndarray,
    Tcw1: jnp.ndarray,
    Tcw2: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    sigma2_1: jnp.ndarray,
    sigma2_2: jnp.ndarray,
    min_parallax_cos: float = 0.9998,
    chi2_th: float = 5.991,
) -> jnp.ndarray:
    """Acceptance mask for triangulated points.

    Mirrors the gate sequence in LocalMapping::CreateNewMapPoints
    (src/LocalMapping.cc:430-560): finite, sufficient parallax (cos between
    viewing rays < min_parallax_cos), positive depth in both views, and
    reprojection error chi2 < 5.991 * sigma^2 in both views.
    """
    c1 = se3.inverse(Tcw1)[..., :3, 3]
    c2 = se3.inverse(Tcw2)[..., :3, 3]
    ray1 = pts_w - c1
    ray2 = pts_w - c2
    n1 = jnp.linalg.norm(ray1, axis=-1)
    n2 = jnp.linalg.norm(ray2, axis=-1)
    cos_par = jnp.sum(ray1 * ray2, axis=-1) / jnp.maximum(n1 * n2, 1e-9)

    R1, t1 = Tcw1[..., :3, :3], Tcw1[..., :3, 3]
    R2, t2 = Tcw2[..., :3, :3], Tcw2[..., :3, 3]
    pc1 = jnp.einsum("...ij,...j->...i", R1, pts_w) + t1
    pc2 = jnp.einsum("...ij,...j->...i", R2, pts_w) + t2
    uv1_hat, z1 = project(cam, pc1)
    uv2_hat, z2 = project(cam, pc2)
    e1 = jnp.sum((uv1_hat - uv1) ** 2, axis=-1)
    e2 = jnp.sum((uv2_hat - uv2) ** 2, axis=-1)
    finite = jnp.all(jnp.isfinite(pts_w), axis=-1)
    return (
        finite
        & (cos_par < min_parallax_cos)
        & (cos_par > 0.0)
        & (z1 > 0.0)
        & (z2 > 0.0)
        & (e1 < chi2_th * sigma2_1)
        & (e2 < chi2_th * sigma2_2)
    )


def parallax_cos(pts_w: jnp.ndarray, Tcw1: jnp.ndarray, Tcw2: jnp.ndarray) -> jnp.ndarray:
    """Cosine of the triangulation parallax angle per point."""
    c1 = se3.inverse(Tcw1)[..., :3, 3]
    c2 = se3.inverse(Tcw2)[..., :3, 3]
    ray1 = pts_w - c1
    ray2 = pts_w - c2
    n1 = jnp.linalg.norm(ray1, axis=-1)
    n2 = jnp.linalg.norm(ray2, axis=-1)
    return jnp.sum(ray1 * ray2, axis=-1) / jnp.maximum(n1 * n2, 1e-9)
