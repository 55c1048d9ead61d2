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


def inv3x3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form batched 3x3 inverse (adjugate / det).

    TPU-friendly replacement for generic LU `jnp.linalg.inv` on [..., 3, 3]
    stacks: pure VPU elementwise math, no per-matrix control flow.
    """
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack([
        jnp.stack([A, B, C], -1),
        jnp.stack([D, E, F], -1),
        jnp.stack([G, H, I], -1),
    ], -2)
    return adj * inv_det[..., None, None]


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

        # TPU layout strategy.  Per-point block assembly (g2o does this with
        # pointer-chasing edge lists) is a grouping problem that XLA lowers
        # terribly as either scatter-add or minor-axis gather (measured 3-40ms
        # per GN iteration).  Instead: the (keyframe, point) incidence is
        # LOOP-INVARIANT, so build its one-hot matrix once per stage and turn
        # the per-iteration grouping into ONE batched MXU matmul
        # [K, 30, N] @ [K, N, P].  Everything P-sized keeps p in the MINOR
        # (lane) dimension — P is a multiple of 128 so all elementwise /
        # reduce ops vectorize, and the Schur correction collapses to one
        # clean [6K, 3P] @ [3P, 6K] matmul.
        pid = jnp.clip(obs_pt, 0, P - 1)
        col = jnp.where(active > 0, pid, P)        # inactive -> dropped
        onehot = (col[:, :, None] ==
                  jnp.arange(P, dtype=jnp.int32)[None, None, :]
                  ).astype(kf_Tcw.dtype)           # [K, N, P]

        def iteration(state):
            i, kf_Tcw, pt_pos, _ = state
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
            # per-observation point/cross blocks, packed into one [K, 30, N]
            # operand: rows 0:18 = J_c^T W J_p, 18:27 = J_p^T W J_p,
            # 27:30 = J_p^T W res
            U = jnp.einsum("knia,kn,knib->kabn", J_c, w, J_p)        # [K,6,3,N]
            Hpp_obs = jnp.einsum("knia,kn,knib->kabn", J_p, w, J_p)  # [K,3,3,N]
            bp_obs = jnp.einsum("knia,kni->kan", J_p, Wres)          # [K,3,N]
            packed = jnp.concatenate([
                U.reshape(K, 18, N), Hpp_obs.reshape(K, 9, N), bp_obs,
            ], axis=1)                                               # [K,30,N]
            # grouping-by-point as a batched matmul (MXU), p stays minor
            grouped = jnp.einsum(
                "kxn,knp->kxp", packed, onehot,
                preferred_element_type=res.dtype,
            )                                                        # [K,30,P]
            A = grouped[:, :18].reshape(K * 6, 3, P)                 # [6K,3,P]
            H_pp = jnp.sum(grouped[:, 18:27], axis=0).reshape(3, 3, P)
            b_p = jnp.sum(grouped[:, 27:30], axis=0)                 # [3,P]

            # damp + invert point blocks (closed-form 3x3 on p-minor stacks)
            eye3 = jnp.eye(3, dtype=res.dtype)[:, :, None]
            H_pp = H_pp + damping * (eye3 * H_pp) + 1e-6 * eye3
            Hpp_inv = jnp.moveaxis(
                inv3x3(jnp.moveaxis(H_pp, -1, 0)), 0, -1
            )                                                    # [3,3,P]
            Hpp_inv = Hpp_inv * pt_free[None, None, :].astype(res.dtype)

            # S = Hcc(blockdiag) - A Hpp^-1 A^T as ONE MXU matmul:
            # contraction over (i, p) with row-major [6K, 3, P] collapsing
            # losslessly to [6K, 3P].
            B = jnp.einsum("aip,ijp->ajp", A, Hpp_inv)           # [6K,3,P]
            Br = B.reshape(K * 6, 3 * P)
            Ar = A.reshape(K * 6, 3 * P)
            S_corr = jnp.dot(Br, Ar.T, preferred_element_type=res.dtype)
            S = jnp.zeros((K * 6, K * 6), res.dtype)
            idx = jnp.arange(K * 6).reshape(K, 6)
            diag_cc = jnp.eye(6, dtype=res.dtype) * H_cc
            S = S.at[idx[:, :, None], idx[:, None, :]].add(H_cc + damping * diag_cc)
            S = S - S_corr
            # fixed cameras: identity rows keep S invertible
            free6 = jnp.repeat(kf_free, 6)
            S = jnp.where(free6[:, None] & free6[None, :], S, 0.0)
            S = S + jnp.diag(jnp.where(free6, 1e-8, 1.0))

            c_p = jnp.einsum("ijp,jp->ip", Hpp_inv, b_p)         # [3,P]
            rhs = (-b_c).reshape(K * 6) + Ar @ c_p.reshape(3 * P)
            rhs = rhs * free6
            dx_c = jnp.linalg.solve(S, rhs).reshape(K, 6)
            back = (dx_c.reshape(K * 6) @ Ar).reshape(3, P)      # A^T dx_c
            dx_p = jnp.einsum("ijp,jp->ip", Hpp_inv, -b_p - back)  # [3,P]
            ok = jnp.all(jnp.isfinite(dx_c)) & jnp.all(jnp.isfinite(dx_p))
            dx_c = jnp.where(ok, dx_c, 0.0)
            dx_p = jnp.where(ok, dx_p, 0.0)
            kf_Tcw = jax.vmap(se3.update_left)(kf_Tcw, dx_c)
            pt_pos = pt_pos + dx_p.T
            # step size for the early-exit test (GN on a near-converged local
            # window typically needs 2-4 iterations, and the sequential
            # per-iteration cost dominates this problem size on TPU)
            delta = jnp.sum(dx_c * dx_c) + jnp.sum(dx_p * dx_p)
            return i + 1, kf_Tcw, pt_pos, delta

        def cond(state):
            i, _, _, delta = state
            return (i < n_iters) & (delta > 1e-8)

        _, kf_Tcw, pt_pos, _ = jax.lax.while_loop(
            cond, iteration,
            (jnp.int32(0), kf_Tcw, pt_pos, jnp.float32(jnp.inf)),
        )
        return kf_Tcw, pt_pos

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
