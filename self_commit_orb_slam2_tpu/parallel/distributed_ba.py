"""Distributed bundle adjustment over a TPU device mesh.

The Schur-complement reduction of ops/optim/bundle_adjust.py, sharded:

  * the "map" mesh axis is data parallelism over independent maps (each map's
    BA is independent — multi-sequence processing);
  * the "blk" axis shards the map-point blocks of ONE map: each chip owns a
    stripe of points, builds that stripe's Hpp / b_p / cross blocks, and the
    reduced camera system S = Hcc - A Hpp^-1 A^T is accumulated with a psum
    over ICI.  Point positions are exchanged with one all_gather per
    iteration; camera updates are computed identically on every chip
    (replicated solve of the small [6K, 6K] system).

This replaces the reference's single-threaded g2o LocalBundleAdjustment /
GlobalBundleAdjustemnt (src/Optimizer.cc:629, :55) with collective-parallel
linear algebra — the map lock (Map.h:150) has no equivalent because phases
exchange immutable sharded pytrees.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import se3
from ..ops.camera import CameraParams
from ..ops.optim.bundle_adjust import _chi2, _residuals
from ..ops.optim.robust import CHI2_MONO, CHI2_STEREO, huber_weight


class DistBAResult(NamedTuple):
    kf_Tcw: jnp.ndarray  # [S, K, 4, 4]
    pt_pos: jnp.ndarray  # [S, P, 3]


def _ba_shard_body(
    cam: CameraParams,
    n_iters: int,
    damping: float,
    ur_weight: float,
    kf_Tcw, pt_pos_stripe, obs_pt, obs_uvr, obs_sigma2, obs_valid,
    kf_free, pt_free_stripe,
):
    """shard_map body: runs on one device.

    kf_Tcw [s, K, 4, 4] (replicated over blk), pt_pos_stripe [s, P/D, 3],
    obs_* [s, K, N], pt_free_stripe [s, P/D].
    """
    D = jax.lax.axis_size("blk")
    my = jax.lax.axis_index("blk")
    s, K, N = obs_pt.shape
    Pl = pt_pos_stripe.shape[1]
    P_total = Pl * D
    lo = my * Pl
    inv_sigma2 = 1.0 / jnp.maximum(obs_sigma2, 1e-9)
    sw = jnp.array([1.0, 1.0, ur_weight**0.5], jnp.float32)

    def one_map(kf_Tcw, pt_stripe, obs_pt, obs_uvr, inv_s2, obs_valid, kf_free, pt_free):
        def iteration(_, state):
            kf_Tcw, pt_stripe = state
            # exchange point stripes (ICI all_gather)
            pt_full = jax.lax.all_gather(pt_stripe, "blk", tiled=True)
            active = (obs_valid & (obs_pt >= 0)).astype(jnp.float32)
            res, J_c, J_p, is_stereo = _residuals(
                cam, kf_Tcw, pt_full, obs_pt, obs_uvr, active
            )
            res = res * sw
            J_c = J_c * sw[:, None]
            J_p = J_p * sw[:, None]
            chi2 = _chi2(res, inv_s2, is_stereo)
            chi2_th = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
            w = inv_s2 * huber_weight(chi2, chi2_th) * active
            J_c = J_c * kf_free[:, None, None, None].astype(J_c.dtype)
            pid = jnp.clip(obs_pt, 0, P_total - 1)
            pt_free_full = jax.lax.all_gather(pt_free, "blk", tiled=True)
            J_p = J_p * pt_free_full[pid][..., None, None].astype(J_p.dtype)

            # ownership mask: this chip accumulates obs of its point stripe
            mine = (pid >= lo) & (pid < lo + Pl) & (active > 0)
            wm = w * mine.astype(w.dtype)
            Wres = res * wm[..., None]

            H_cc = jnp.einsum("knia,kn,knib->kab", J_c, wm, J_c)
            b_c = jnp.einsum("knia,kni->ka", J_c, Wres)
            Hpp_obs = jnp.einsum("knia,kn,knib->knab", J_p, wm, J_p)
            bp_obs = jnp.einsum("knia,kni->kna", J_p, Wres)
            U = jnp.einsum("knia,kn,knib->knab", J_c, wm, J_p)

            pid_local = jnp.where(mine, pid - lo, Pl)
            H_pp = jnp.zeros((Pl + 1, 3, 3), res.dtype).at[pid_local].add(
                Hpp_obs, mode="drop"
            )[:Pl]
            b_p = jnp.zeros((Pl + 1, 3), res.dtype).at[pid_local].add(
                bp_obs, mode="drop"
            )[:Pl]
            A = jnp.zeros((Pl + 1, K, 6, 3), res.dtype).at[
                pid_local, jnp.arange(K)[:, None].repeat(N, 1)
            ].add(U, mode="drop")[:Pl]

            H_pp = H_pp + (
                damping * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(H_pp))
                + 1e-6 * jnp.eye(3, dtype=res.dtype)
            )
            Hpp_inv = jnp.linalg.inv(H_pp)
            Hpp_inv = Hpp_inv * pt_free[:, None, None].astype(res.dtype)

            A2 = A.reshape(Pl, K * 6, 3)
            S_partial = -jnp.einsum("pai,pij,pbj->ab", A2, Hpp_inv, A2)
            idx = jnp.arange(K * 6).reshape(K, 6)
            S_partial = S_partial.at[idx[:, :, None], idx[:, None, :]].add(
                H_cc + damping * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(H_cc))
            )
            rhs_partial = (-b_c).reshape(K * 6) + jnp.einsum(
                "pai,pij,pj->a", A2, Hpp_inv, b_p
            )
            # ICI reduction of the camera system
            S_mat = jax.lax.psum(S_partial, "blk")
            rhs = jax.lax.psum(rhs_partial, "blk")

            free6 = jnp.repeat(kf_free, 6)
            S_mat = jnp.where(free6[:, None] & free6[None, :], S_mat, 0.0)
            S_mat = S_mat + jnp.diag(jnp.where(free6, 1e-8, 1.0))
            rhs = rhs * free6
            dx_c = jnp.linalg.solve(S_mat, rhs).reshape(K, 6)
            dx_p = jnp.einsum(
                "pij,pj->pi", Hpp_inv,
                -b_p - jnp.einsum("pai,a->pi", A2, dx_c.reshape(K * 6)),
            )
            ok = jnp.all(jnp.isfinite(dx_c)) & jnp.all(jnp.isfinite(dx_p))
            dx_c = jnp.where(ok, dx_c, 0.0)
            dx_p = jnp.where(ok, dx_p, 0.0)
            kf_Tcw = jax.vmap(se3.update_left)(kf_Tcw, dx_c)
            pt_stripe = pt_stripe + dx_p
            return kf_Tcw, pt_stripe

        return jax.lax.fori_loop(0, n_iters, iteration, (kf_Tcw, pt_stripe))

    new_kf, new_pt = jax.vmap(one_map)(
        kf_Tcw, pt_pos_stripe, obs_pt, obs_uvr, inv_sigma2, obs_valid,
        kf_free, pt_free_stripe,
    )
    return new_kf, new_pt


def distributed_bundle_adjust(
    mesh: Mesh,
    cam: CameraParams,
    kf_Tcw: jnp.ndarray,     # [S, K, 4, 4]
    pt_pos: jnp.ndarray,     # [S, P, 3]  (P divisible by mesh "blk")
    obs_pt: jnp.ndarray,     # [S, K, N]
    obs_uvr: jnp.ndarray,    # [S, K, N, 3]
    obs_sigma2: jnp.ndarray, # [S, K, N]
    obs_valid: jnp.ndarray,  # [S, K, N]
    kf_free: jnp.ndarray,    # [S, K]
    pt_free: jnp.ndarray,    # [S, P]
    n_iters: int = 10,
    damping: float = 1e-4,
    ur_weight: float = 1.0,
):
    """Jit-compiled sharded BA over ("map", "blk").  Returns DistBAResult."""
    body = functools.partial(_ba_shard_body, cam, n_iters, damping, ur_weight)
    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P("map"), P("map", "blk"), P("map"), P("map"), P("map"), P("map"),
            P("map"), P("map", "blk"),
        ),
        out_specs=(P("map"), P("map", "blk")),
        check_vma=False,
    )
    new_kf, new_pt = jax.jit(mapped)(
        kf_Tcw, pt_pos, obs_pt, obs_uvr, obs_sigma2, obs_valid, kf_free, pt_free
    )
    return DistBAResult(kf_Tcw=new_kf, pt_pos=new_pt)
