"""Relative Sim3 refinement over matched point pairs.

TPU-native equivalent of Optimizer::OptimizeSim3 (reference
src/Optimizer.cc:1364-1592): given 3D points expressed in each keyframe's
camera frame and their pixel observations in the OTHER image, Gauss-Newton
refine the relative Sim3 with paired forward/inverse projection residuals,
Huber weighting, and chi2=10 outlier gating between two stages.  Jacobians
come from jax.jacfwd of the exact residual (7-dof tangent; scale frozen for
stereo/RGB-D via bFixScale).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import sim3
from ..camera import CameraParams
from .robust import huber_weight

CHI2_TH = 10.0  # reference :1524


class Sim3OptResult(NamedTuple):
    S12: jnp.ndarray       # [8]
    inliers: jnp.ndarray   # [N]
    n_inliers: jnp.ndarray


def _proj(cam: CameraParams, p: jnp.ndarray) -> jnp.ndarray:
    z = jnp.where(jnp.abs(p[..., 2]) < 1e-6, 1e-6, p[..., 2])
    return jnp.stack(
        [cam.fx * p[..., 0] / z + cam.cx, cam.fy * p[..., 1] / z + cam.cy], -1
    )


def _residuals(cam, S12, p1, p2, uv1, uv2):
    """[N, 4]: forward (S12 p2 -> image1) and inverse (S12^-1 p1 -> image2)."""
    e1 = _proj(cam, sim3.apply(S12, p2)) - uv1
    e2 = _proj(cam, sim3.apply(sim3.inverse(S12), p1)) - uv2
    return jnp.concatenate([e1, e2], axis=-1)


def optimize_sim3(
    cam: CameraParams,
    S12_init: jnp.ndarray,
    p1: jnp.ndarray,      # [N, 3] points in camera-1 frame
    p2: jnp.ndarray,      # [N, 3] points in camera-2 frame
    uv1: jnp.ndarray,     # [N, 2] observations in image 1
    uv2: jnp.ndarray,     # [N, 2] observations in image 2
    valid: jnp.ndarray,   # [N]
    fix_scale: bool = True,
    n_iters: int = 10,
    damping: float = 1e-4,
) -> Sim3OptResult:
    def res_of_xi(xi, S):
        return _residuals(cam, sim3.compose(sim3.exp(xi), S), p1, p2, uv1, uv2)

    jac = jax.jacfwd(res_of_xi, argnums=0)
    zero7 = jnp.zeros(7, jnp.float32)
    dof_mask = jnp.array([1, 1, 1, 1, 1, 1, 0.0 if fix_scale else 1.0], jnp.float32)

    def stage(S, active, n):
        def it(_, S):
            r = res_of_xi(zero7, S)            # [N, 4]
            J = jac(zero7, S)                  # [N, 4, 7]
            chi2 = jnp.sum(r[:, :2] ** 2, -1) + jnp.sum(r[:, 2:] ** 2, -1)
            w = huber_weight(chi2, CHI2_TH) * active
            Jm = J * dof_mask[None, None, :]
            H = jnp.einsum("nai,n,naj->ij", Jm, w, Jm)
            b = jnp.einsum("nai,na->i", Jm, r * w[:, None])
            H = H + damping * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(7)
            H = H + jnp.diag(jnp.where(dof_mask > 0, 0.0, 1.0))
            dx = jnp.linalg.solve(H, -b) * dof_mask
            ok = jnp.all(jnp.isfinite(dx))
            return sim3.compose(sim3.exp(jnp.where(ok, dx, 0.0)), S)

        return jax.lax.fori_loop(0, n, it, S)

    active0 = valid.astype(jnp.float32)
    S = stage(S12_init, active0, n_iters // 2)
    r = _residuals(cam, S, p1, p2, uv1, uv2)
    chi2_f = jnp.sum(r[:, :2] ** 2, -1)
    chi2_b = jnp.sum(r[:, 2:] ** 2, -1)
    inl = valid & (chi2_f < CHI2_TH) & (chi2_b < CHI2_TH)
    S = stage(S, inl.astype(jnp.float32), n_iters)
    r = _residuals(cam, S, p1, p2, uv1, uv2)
    inl = valid & (jnp.sum(r[:, :2] ** 2, -1) < CHI2_TH) & (
        jnp.sum(r[:, 2:] ** 2, -1) < CHI2_TH
    )
    return Sim3OptResult(S12=S, inliers=inl, n_inliers=jnp.sum(inl).astype(jnp.int32))
