"""Batched EPnP + RANSAC for relocalization.

TPU-native redesign of the reference PnPsolver (src/PnPsolver.cc): EPnP
(4 control points, barycentric coordinates, 12x12 M'M eigendecomposition,
compute_pose :684) wrapped in RANSAC (iterate :240).  Where the reference
iterates hypotheses sequentially with early exit, ALL hypotheses are solved
in one batch (control-point PCA, eigh, Horn alignment are all batched) and
the best inlier count wins — RANSAC as a single fused kernel.

Simplifications vs the reference: the betas case analysis (cases 1/2/3 +
Gauss-Newton, :1213) is replaced by the dominant N=1 kernel vector with a
closed-form scale — accurate for the well-conditioned minimal sets RANSAC
feeds it, and the winning hypothesis is refined by the robust pose optimizer
downstream exactly like the reference calls PoseOptimization afterwards
(Tracking.cc:2127).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import se3
from ..camera import CameraParams
from .horn import horn_align


class PnPResult(NamedTuple):
    Tcw: jnp.ndarray        # [4, 4] best hypothesis pose
    inliers: jnp.ndarray    # [N] bool under best hypothesis
    n_inliers: jnp.ndarray  # scalar int32
    success: jnp.ndarray    # scalar bool


def _epnp_solve(pts_w: jnp.ndarray, uv: jnp.ndarray, cam: CameraParams):
    """EPnP for one batch of correspondence sets.

    pts_w [B, n, 3], uv [B, n, 2] -> (R [B, 3, 3], t [B, 3]).
    """
    B, n, _ = pts_w.shape
    # control points: centroid + principal axes (reference
    # choose_control_points :507)
    c0 = jnp.mean(pts_w, axis=1, keepdims=True)
    centered = pts_w - c0
    cov = jnp.einsum("bni,bnj->bij", centered, centered) / n
    vals, vecs = jnp.linalg.eigh(cov)
    # scale axes by sqrt(eigenvalue) (descending)
    axes = vecs * jnp.sqrt(jnp.maximum(vals, 1e-12))[..., None, :]
    ctrl_w = jnp.concatenate(
        [c0, c0 + axes[..., :, 2][:, None], c0 + axes[..., :, 1][:, None],
         c0 + axes[..., :, 0][:, None]], axis=1,
    )  # [B, 4, 3]

    # barycentric coordinates (compute_barycentric_coordinates :572)
    basis = ctrl_w[:, 1:] - ctrl_w[:, :1]  # [B, 3, 3] rows = c_i - c_0
    basis_inv = jnp.linalg.inv(jnp.swapaxes(basis, 1, 2) + 1e-9 * jnp.eye(3))
    rel = pts_w - ctrl_w[:, :1]
    a123 = jnp.einsum("bij,bnj->bni", basis_inv, rel)
    a0 = 1.0 - jnp.sum(a123, axis=-1, keepdims=True)
    alphas = jnp.concatenate([a0, a123], axis=-1)  # [B, n, 4]

    # M matrix (reference fill_M, columns ordered x0 y0 z0 x1 y1 z1 ...):
    # u-row of point i: sum_j alpha_ij * (fx*X_j + (cx-u_i)*Z_j)
    # v-row of point i: sum_j alpha_ij * (fy*Y_j + (cy-v_i)*Z_j)
    u = uv[..., 0]
    v = uv[..., 1]
    fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy
    zeros = jnp.zeros_like(alphas)
    Mu = jnp.stack([alphas * fx, zeros, alphas * (cx - u)[..., None]], axis=-1)
    Mv = jnp.stack([zeros, alphas * fy, alphas * (cy - v)[..., None]], axis=-1)
    # [B, n, 4, 3] -> [B, n, 12] with (x, y, z) contiguous per control point
    M = jnp.concatenate([Mu.reshape(B, n, 12), Mv.reshape(B, n, 12)], axis=1)

    MtM = jnp.einsum("bki,bkj->bij", M, M)
    _, evecs = jnp.linalg.eigh(MtM)
    kernel = evecs[..., :, 0]  # [B, 12]
    ctrl_c = kernel.reshape(B, 4, 3)

    # resolve scale + sign: match inter-control-point distances; positive depth
    def pdist(c):
        d = c[:, :, None, :] - c[:, None, :, :]
        return jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1), 1e-18))

    dw = pdist(ctrl_w)
    dc = pdist(ctrl_c)
    beta = jnp.sum(dw * dc, axis=(1, 2)) / jnp.maximum(
        jnp.sum(dc * dc, axis=(1, 2)), 1e-12
    )
    ctrl_c = ctrl_c * beta[:, None, None]
    # sign: mean z of reconstructed points must be positive
    pts_c = jnp.einsum("bnj,bjk->bnk", alphas, ctrl_c)
    sign = jnp.where(jnp.mean(pts_c[..., 2], axis=-1) < 0, -1.0, 1.0)
    ctrl_c = ctrl_c * sign[:, None, None]

    # R, t from world->camera control-point alignment (estimate_R_and_t)
    _, R, t = horn_align(ctrl_w, ctrl_c)
    return R, t


def pnp_ransac(
    cam: CameraParams,
    pts_w: jnp.ndarray,
    uv: jnp.ndarray,
    valid: jnp.ndarray,
    sigma2: jnp.ndarray,
    key: jnp.ndarray,
    n_hypotheses: int = 256,
    min_set: int = 6,
    chi2_th: float = 5.991,
    min_inliers: int = 10,
) -> PnPResult:
    """RANSAC-EPnP over matched (3D point, 2D pixel) pairs.

    Reference: PnPsolver::iterate (:240) with chi2 5.991 scaled per octave
    (:181 SetRansacParameters).
    """
    n = pts_w.shape[0]
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    sets = jax.random.choice(key, n, shape=(n_hypotheses, min_set), replace=True, p=probs)

    R, t = _epnp_solve(pts_w[sets], uv[sets], cam)

    # score all hypotheses against all correspondences
    pc = jnp.einsum("bij,nj->bni", R, pts_w) + t[:, None, :]
    z = pc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u_hat = cam.fx * pc[..., 0] / z_safe + cam.cx
    v_hat = cam.fy * pc[..., 1] / z_safe + cam.cy
    err2 = (u_hat - uv[None, :, 0]) ** 2 + (v_hat - uv[None, :, 1]) ** 2
    inl = (err2 / jnp.maximum(sigma2[None, :], 1e-9) < chi2_th) & (z > 0) & valid[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    n_best = counts[best]

    # The winning hypothesis is refined downstream by the robust pose
    # optimizer over all inliers (reference Tracking.cc:2127 calls
    # PoseOptimization right after PnPsolver::iterate).
    Tcw = se3.rt_to_mat(R[best], t[best])
    return PnPResult(
        Tcw=Tcw,
        inliers=inl[best],
        n_inliers=n_best.astype(jnp.int32),
        success=n_best >= min_inliers,
    )
