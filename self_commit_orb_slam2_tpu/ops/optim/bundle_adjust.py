"""Bundle adjustment with a dense Schur-complement reduced camera system.

TPU-native equivalent of Optimizer::LocalBundleAdjustment /
GlobalBundleAdjustemnt (reference src/Optimizer.cc:629-1014 and :55-361),
which build g2o graphs with SE3 camera vertices, XYZ point vertices and
(stereo) projection edges, marginalize points via g2o's Schur block solver,
and run LM.  Here the whole problem is dense batched linear algebra:

  * observations live in a [K, N] keyframe-feature grid (the map's native
    layout) instead of an edge list;
  * per-iteration: residuals/Jacobians for all observations at once,
    Huber-weighted Gauss-Newton with LM diagonal damping;
  * the reduced camera system S = Hcc - Hcp Hpp^-1 Hcp^T is assembled by one
    scatter into a [P, 6K, 3] tensor followed by an einsum — MXU-shaped work;
  * fixed keyframes (observers outside the local window, reference
    Optimizer.cc:703-724) simply have their Jacobians zeroed.

Reference semantics preserved: Huber delta sqrt(5.991)/sqrt(7.815), two
stages (5 iters, chi2 outlier removal, 10 more iters — Optimizer.cc:863-917),
information = 1/sigma2(octave).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import se3
from ..camera import CameraParams
from .robust import CHI2_MONO, CHI2_STEREO, huber_weight


class BAResult(NamedTuple):
    kf_Tcw: jnp.ndarray    # [K, 4, 4] optimized poses
    pt_pos: jnp.ndarray    # [P, 3] optimized points
    obs_inlier: jnp.ndarray  # [K, N] surviving observations
    mean_chi2: jnp.ndarray


def _residuals(cam: CameraParams, kf_Tcw, pt_pos, obs_pt, obs_uvr, active):
    """Per-observation residuals/Jacobians over the [K, N] grid.

    Returns res [K,N,3], J_c [K,N,3,6], J_p [K,N,3,3], pc [K,N,3].
    """
    P = pt_pos.shape[0]
    pid = jnp.clip(obs_pt, 0, P - 1)
    pw = pt_pos[pid]  # [K, N, 3]
    R = kf_Tcw[:, :3, :3]
    t = kf_Tcw[:, :3, 3]
    pc = jnp.einsum("kij,knj->kni", R, pw) + t[:, None, :]
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z

    is_stereo = obs_uvr[..., 2] >= 0.0
    u = cam.fx * x * inv_z + cam.cx
    v = cam.fy * y * inv_z + cam.cy
    ur = u - cam.bf * inv_z
    res = jnp.stack(
        [u - obs_uvr[..., 0], v - obs_uvr[..., 1],
         jnp.where(is_stereo, ur - obs_uvr[..., 2], 0.0)],
        axis=-1,
    )

    zeros = jnp.zeros_like(z)
    du = jnp.stack([cam.fx * inv_z, zeros, -cam.fx * x * inv_z2], axis=-1)
    dv = jnp.stack([zeros, cam.fy * inv_z, -cam.fy * y * inv_z2], axis=-1)
    dur = du + jnp.stack([zeros, zeros, cam.bf * inv_z2], axis=-1)
    duvw = jnp.stack([du, dv, dur], axis=-2)  # [K,N,3,3] d(res)/d(pc)
    duvw = duvw.at[..., 2, :].multiply(is_stereo[..., None].astype(duvw.dtype))

    eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), pc.shape + (3,))
    dpc_dxi = jnp.concatenate([eye, -se3.hat(pc)], axis=-1)  # [K,N,3,6]
    J_c = duvw @ dpc_dxi
    J_p = jnp.einsum("knij,kjl->knil", duvw, R)  # d(pc)/d(pw) = R
    act = active[..., None].astype(res.dtype)
    return res * act, J_c * act[..., None], J_p * act[..., None], is_stereo


def _chi2(res, inv_sigma2, is_stereo):
    e2 = res[..., 0] ** 2 + res[..., 1] ** 2 + jnp.where(is_stereo, res[..., 2] ** 2, 0.0)
    return e2 * inv_sigma2


def bundle_adjust(
    cam: CameraParams,
    kf_Tcw: jnp.ndarray,     # [K, 4, 4]
    pt_pos: jnp.ndarray,     # [P, 3]
    obs_pt: jnp.ndarray,     # [K, N] local point index (-1 = no obs)
    obs_uvr: jnp.ndarray,    # [K, N, 3] (u, v, u_right<0 for mono)
    obs_sigma2: jnp.ndarray, # [K, N]
    obs_valid: jnp.ndarray,  # [K, N]
    kf_free: jnp.ndarray,    # [K] bool: optimize this pose
    pt_free: jnp.ndarray,    # [P] bool: optimize this point
    n_iters_pre: int = 5,
    n_iters_post: int = 10,
    damping: float = 1e-4,
    ur_weight: float = 1.0,
) -> BAResult:
    K, N = obs_pt.shape
    P = pt_pos.shape[0]
    inv_sigma2 = 1.0 / jnp.maximum(obs_sigma2, 1e-9)
    # extra information on the u_right component (see pose_opt.pose_optimize)
    sw = jnp.array([1.0, 1.0, ur_weight**0.5], jnp.float32)

    def stage(carry, n_iters, use_huber, active):
        kf_Tcw, pt_pos = carry

        def iteration(_, state):
            kf_Tcw, pt_pos = state
            res, J_c, J_p, is_stereo = _residuals(
                cam, kf_Tcw, pt_pos, obs_pt, obs_uvr, active
            )
            res = res * sw
            J_c = J_c * sw[:, None]
            J_p = J_p * sw[:, None]
            chi2 = _chi2(res, inv_sigma2, is_stereo)
            chi2_th = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
            w_rob = jnp.where(use_huber, huber_weight(chi2, chi2_th), 1.0)
            w = inv_sigma2 * w_rob * active
            # zero Jacobians of fixed cameras / fixed points
            J_c = J_c * kf_free[:, None, None, None].astype(J_c.dtype)
            J_p = J_p * pt_free[jnp.clip(obs_pt, 0, P - 1)][..., None, None].astype(J_p.dtype)

            Wres = res * w[..., None]
            # camera blocks
            H_cc = jnp.einsum("knia,kn,knib->kab", J_c, w, J_c)  # [K,6,6]
            b_c = jnp.einsum("knia,kni->ka", J_c, Wres)          # [K,6]
            # point blocks (scatter over local point index)
            pid = jnp.clip(obs_pt, 0, P - 1)
            Hpp_obs = jnp.einsum("knia,kn,knib->knab", J_p, w, J_p)
            bp_obs = jnp.einsum("knia,kni->kna", J_p, Wres)
            pid_safe = jnp.where(active, pid, P)
            H_pp = jnp.zeros((P + 1, 3, 3), res.dtype).at[pid_safe].add(
                Hpp_obs, mode="drop"
            )[:P]
            b_p = jnp.zeros((P + 1, 3), res.dtype).at[pid_safe].add(
                bp_obs, mode="drop"
            )[:P]
            # cross blocks, gathered per point: A[p, 6K, 3]
            U = jnp.einsum("knia,kn,knib->knab", J_c, w, J_p)  # [K,N,6,3]
            A = jnp.zeros((P + 1, K, 6, 3), res.dtype).at[
                pid_safe, jnp.arange(K)[:, None].repeat(N, 1)
            ].add(U, mode="drop")[:P]

            # damp + invert point blocks
            H_pp = H_pp + (damping * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(H_pp))
                           + 1e-6 * jnp.eye(3, dtype=res.dtype))
            Hpp_inv = jnp.linalg.inv(H_pp)
            Hpp_inv = Hpp_inv * pt_free[:, None, None].astype(res.dtype)

            A2 = A.reshape(P, K * 6, 3)
            # S = Hcc(blockdiag) - A Hpp^-1 A^T
            S = jnp.zeros((K * 6, K * 6), res.dtype)
            idx = jnp.arange(K * 6).reshape(K, 6)
            S = S.at[idx[:, :, None], idx[:, None, :]].add(
                H_cc + damping * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(H_cc))
            )
            S = S - jnp.einsum("pai,pij,pbj->ab", A2, Hpp_inv, A2)
            # fixed cameras: identity rows keep S invertible
            free6 = jnp.repeat(kf_free, 6)
            S = jnp.where(free6[:, None] & free6[None, :], S, 0.0)
            S = S + jnp.diag(jnp.where(free6, 1e-8, 1.0))

            rhs = (-b_c).reshape(K * 6) + jnp.einsum(
                "pai,pij,pj->a", A2, Hpp_inv, b_p
            )
            rhs = rhs * free6
            dx_c = jnp.linalg.solve(S, rhs).reshape(K, 6)
            dx_p = jnp.einsum(
                "pij,pj->pi", Hpp_inv,
                -b_p - jnp.einsum("pai,a->pi", A2, dx_c.reshape(K * 6)),
            )
            ok = jnp.all(jnp.isfinite(dx_c)) & jnp.all(jnp.isfinite(dx_p))
            dx_c = jnp.where(ok, dx_c, 0.0)
            dx_p = jnp.where(ok, dx_p, 0.0)
            kf_Tcw = jax.vmap(se3.update_left)(kf_Tcw, dx_c)
            pt_pos = pt_pos + dx_p
            return kf_Tcw, pt_pos

        return jax.lax.fori_loop(0, n_iters, iteration, (kf_Tcw, pt_pos))

    active0 = obs_valid & (obs_pt >= 0)
    state = (kf_Tcw, pt_pos)
    state = stage(state, n_iters_pre, True, active0.astype(jnp.float32))

    # outlier removal between stages (reference Optimizer.cc:863-917)
    res, _, _, is_stereo = _residuals(cam, *state, obs_pt, obs_uvr, active0.astype(jnp.float32))
    chi2 = _chi2(res, inv_sigma2, is_stereo)
    chi2_th = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    active1 = active0 & (chi2 <= chi2_th)
    state = stage(state, n_iters_post, False, active1.astype(jnp.float32))

    res, _, _, is_stereo = _residuals(cam, *state, obs_pt, obs_uvr, active1.astype(jnp.float32))
    chi2 = _chi2(res, inv_sigma2, is_stereo)
    inlier = active1 & (chi2 <= chi2_th)
    mean = jnp.sum(jnp.where(inlier, chi2, 0.0)) / jnp.maximum(jnp.sum(inlier), 1)
    return BAResult(
        kf_Tcw=state[0], pt_pos=state[1], obs_inlier=inlier, mean_chi2=mean
    )
