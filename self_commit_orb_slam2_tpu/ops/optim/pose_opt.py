"""Motion-only bundle adjustment (pose optimization), jit-compiled.

TPU-native equivalent of Optimizer::PoseOptimization (reference
src/Optimizer.cc:363-627): optimize a single camera pose against its matched
map points with unary reprojection edges.  Reference semantics preserved:

  * 4 rounds x 10 iterations (:509-517), Huber kernel with
    delta = sqrt(5.991) mono / sqrt(7.815) stereo in the first two rounds,
    plain least squares afterwards,
  * between rounds every observation is re-classified by raw chi2
    (5.991 / 7.815), and outliers are excluded from (re-included into) the
    next round (:519-560 region),
  * information = 1 / sigma2(octave).

Where g2o runs sparse LM over dynamically-built graphs, here the normal
equations are a dense batched reduction: J^T W J is a [6, 6] einsum over all
N observations with masks — exactly what the MXU wants.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import se3
from ..camera import CameraParams
from .robust import CHI2_MONO, CHI2_STEREO, huber_weight


class PoseOptResult(NamedTuple):
    Tcw: jnp.ndarray          # [4, 4] optimized pose
    inliers: jnp.ndarray      # [N] bool
    n_inliers: jnp.ndarray    # scalar int32
    chi2: jnp.ndarray         # [N] final per-observation chi2


def _residuals_jacobians(cam: CameraParams, Tcw, pts_w, obs, is_stereo):
    """Residuals [N, 3] and Jacobians [N, 3, 6] (third row zero for mono).

    obs: [N, 3] = (u, v, u_right); u_right < 0 marks mono observations.
    Jacobian is wrt a left-multiplicative se3 update (rho, phi), matching
    se3.update_left.
    """
    R = Tcw[:3, :3]
    t = Tcw[:3, 3]
    pc = pts_w @ R.T + t
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z

    u = cam.fx * x * inv_z + cam.cx
    v = cam.fy * y * inv_z + cam.cy
    ur = u - cam.bf * inv_z

    r_u = u - obs[:, 0]
    r_v = v - obs[:, 1]
    r_ur = jnp.where(is_stereo, ur - obs[:, 2], 0.0)
    res = jnp.stack([r_u, r_v, r_ur], axis=-1)

    # d(pc)/d(xi) = [I | -hat(pc)]  (left perturbation)
    # du/dpc rows:
    du_dpc = jnp.stack(
        [cam.fx * inv_z, jnp.zeros_like(z), -cam.fx * x * inv_z2], axis=-1
    )
    dv_dpc = jnp.stack(
        [jnp.zeros_like(z), cam.fy * inv_z, -cam.fy * y * inv_z2], axis=-1
    )
    dur_dpc = du_dpc + jnp.stack(
        [jnp.zeros_like(z), jnp.zeros_like(z), cam.bf * inv_z2], axis=-1
    )
    duvw_dpc = jnp.stack([du_dpc, dv_dpc, dur_dpc], axis=-2)  # [N, 3, 3]

    dpc_dxi = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (pc.shape[0], 3, 3)),
            -se3.hat(pc),
        ],
        axis=-1,
    )  # [N, 3, 6]
    J = duvw_dpc @ dpc_dxi  # [N, 3, 6]
    # zero the u_right row for mono observations
    J = J.at[:, 2, :].multiply(is_stereo[:, None].astype(J.dtype))
    return res, J


def _chi2(res, inv_sigma2, is_stereo):
    e2 = jnp.sum(res[:, :2] ** 2, axis=-1) + jnp.where(
        is_stereo, res[:, 2] ** 2, 0.0
    )
    return e2 * inv_sigma2


def pose_optimize(
    cam: CameraParams,
    Tcw0: jnp.ndarray,
    pts_w: jnp.ndarray,
    obs: jnp.ndarray,
    sigma2: jnp.ndarray,
    valid: jnp.ndarray,
    n_rounds: int = 4,
    n_iters: int = 10,
    damping: float = 1e-5,
    ur_weight: float = 1.0,
) -> PoseOptResult:
    """Optimize Tcw against map points.  All shapes static; invalid rows are
    zero-weighted.

    ur_weight: extra information weight on the u_right (disparity) residual.
    The reference weights all three residual components equally, which models
    stereo-matcher noise; RGB-D depth sensors are far more precise than one
    pixel of disparity, so RGB-D mode uses ur_weight > 1 (sigma_ur =
    1/sqrt(w) px).  This is what anchors translation-along-view drift in
    low-parallax scenes.
    """
    is_stereo = obs[:, 2] >= 0.0
    inv_sigma2 = 1.0 / jnp.maximum(sigma2, 1e-9)
    chi2_th = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)

    sw = jnp.array([1.0, 1.0, ur_weight**0.5], jnp.float32)

    def gn_iteration(T, active, use_huber):
        res, J = _residuals_jacobians(cam, T, pts_w, obs, is_stereo)
        res = res * sw
        J = J * sw[:, None]
        chi2 = _chi2(res, inv_sigma2, is_stereo)
        w_rob = jnp.where(
            use_huber, huber_weight(chi2, chi2_th), jnp.ones_like(chi2)
        )
        # per-observation scalar weight (info * robust * active)
        w = inv_sigma2 * w_rob * active.astype(res.dtype)
        Jw = J * w[:, None, None]
        H = jnp.einsum("nij,nik->jk", Jw, J)
        b = jnp.einsum("nij,ni->j", Jw, res)
        H = H + damping * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6, dtype=H.dtype)
        dx = jnp.linalg.solve(H, -b)
        # guard: reject NaN/huge steps
        ok = jnp.all(jnp.isfinite(dx)) & (jnp.linalg.norm(dx) < 1e3)
        dx = jnp.where(ok, dx, 0.0)
        return se3.update_left(T, dx)

    def round_body(carry, round_idx):
        T, active = carry
        use_huber = round_idx < 2

        # early-exit GN: a tracked pose typically converges in 2-4 steps, and
        # on TPU the sequential per-iteration overhead dominates this tiny
        # [N,3,6] problem, so a while_loop with a step-size test beats the
        # reference's fixed 10 iterations (g2o LM, Optimizer.cc:509-517) at
        # identical fixed points.
        def iter_cond(state):
            i, _, delta = state
            return (i < n_iters) & (delta > 1e-6)

        def iter_body(state):
            i, T, _ = state
            T_new = gn_iteration(T, active, use_huber)
            delta = jnp.sum((T_new[:3] - T[:3]) ** 2)
            return i + 1, T_new, delta

        _, T, _ = jax.lax.while_loop(
            iter_cond, iter_body, (jnp.int32(0), T, jnp.float32(jnp.inf))
        )
        res, _ = _residuals_jacobians(cam, T, pts_w, obs, is_stereo)
        chi2 = _chi2(res, inv_sigma2, is_stereo)
        active = valid & (chi2 <= chi2_th)
        return (T, active), None

    (T, active), _ = jax.lax.scan(
        round_body, (Tcw0, valid), jnp.arange(n_rounds)
    )
    res, _ = _residuals_jacobians(cam, T, pts_w, obs, is_stereo)
    chi2 = _chi2(res, inv_sigma2, is_stereo)
    return PoseOptResult(
        Tcw=T,
        inliers=active,
        n_inliers=jnp.sum(active).astype(jnp.int32),
        chi2=chi2,
    )
