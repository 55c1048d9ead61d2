"""Sim(3) pose-graph (essential graph) optimization.

TPU-native equivalent of Optimizer::OptimizeEssentialGraph (reference
src/Optimizer.cc:1017-1362): keyframe poses become Sim3 vertices; loop edges,
spanning/sequential edges and strong-covisibility edges constrain relative
Sim3s; Gauss-Newton over all 7K DoF with the loop-anchor keyframe fixed.

Design differences from the g2o version: the edge list is a fixed-capacity
array (masked), per-edge 7x14 Jacobians come from jax.jacfwd of the exact
residual (no hand-derived approximations), and the normal equations assemble
into one dense [7K, 7K] system — K here is the keyframe capacity (hundreds),
so the dense solve is MXU-friendly and far below HBM limits.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import sim3


class PoseGraphResult(NamedTuple):
    kf_sim3: jnp.ndarray   # [K, 8] optimized Sim3 poses (world->cam)
    mean_residual: jnp.ndarray


def edge_residual(S_i: jnp.ndarray, S_j: jnp.ndarray, meas_ij: jnp.ndarray) -> jnp.ndarray:
    """r = log( meas_ij^-1 . S_i . S_j^-1 )  [7].

    meas_ij is the measured relative Sim3 S_i . S_j^-1 (g2o EdgeSim3 stores
    Sji; conventions match up to sign of the residual, irrelevant for GN).
    """
    rel = sim3.compose(S_i, sim3.inverse(S_j))
    return sim3.log(sim3.compose(sim3.inverse(meas_ij), rel))


def _residual_of_perturbation(xi_i, xi_j, S_i, S_j, meas):
    return edge_residual(
        sim3.compose(sim3.exp(xi_i), S_i), sim3.compose(sim3.exp(xi_j), S_j), meas
    )


_jac_i = jax.jacfwd(_residual_of_perturbation, argnums=0)
_jac_j = jax.jacfwd(_residual_of_perturbation, argnums=1)


def optimize_pose_graph(
    kf_sim3: jnp.ndarray,     # [K, 8]
    edge_i: jnp.ndarray,      # [E] int32
    edge_j: jnp.ndarray,      # [E] int32
    edge_meas: jnp.ndarray,   # [E, 8] measured S_i . S_j^-1
    edge_valid: jnp.ndarray,  # [E] bool
    kf_fixed: jnp.ndarray,    # [K] bool (loop anchor / invalid slots)
    n_iters: int = 20,
    damping: float = 1e-6,
) -> PoseGraphResult:
    K = kf_sim3.shape[0]
    E = edge_i.shape[0]
    zero7 = jnp.zeros(7, jnp.float32)

    def iteration(_, S):
        Si = S[edge_i]
        Sj = S[edge_j]
        r = jax.vmap(lambda a, b, m: edge_residual(a, b, m))(Si, Sj, edge_meas)
        Ji = jax.vmap(lambda a, b, m: _jac_i(zero7, zero7, a, b, m))(Si, Sj, edge_meas)
        Jj = jax.vmap(lambda a, b, m: _jac_j(zero7, zero7, a, b, m))(Si, Sj, edge_meas)
        w = edge_valid.astype(jnp.float32)
        # zero columns of fixed vertices
        free = ~kf_fixed
        Ji = Ji * free[edge_i][:, None, None]
        Jj = Jj * free[edge_j][:, None, None]

        H = jnp.zeros((K, K, 7, 7), jnp.float32)
        b = jnp.zeros((K, 7), jnp.float32)
        wJi = Ji * w[:, None, None]
        wJj = Jj * w[:, None, None]
        H = H.at[edge_i, edge_i].add(jnp.einsum("eai,eaj->eij", wJi, Ji))
        H = H.at[edge_j, edge_j].add(jnp.einsum("eai,eaj->eij", wJj, Jj))
        H = H.at[edge_i, edge_j].add(jnp.einsum("eai,eaj->eij", wJi, Jj))
        H = H.at[edge_j, edge_i].add(jnp.einsum("eai,eaj->eij", wJj, Ji))
        b = b.at[edge_i].add(jnp.einsum("eai,ea->ei", wJi, r))
        b = b.at[edge_j].add(jnp.einsum("eai,ea->ei", wJj, r))

        Hd = H.transpose(0, 2, 1, 3).reshape(K * 7, K * 7)
        bd = b.reshape(K * 7)
        free7 = jnp.repeat(free, 7)
        Hd = jnp.where(free7[:, None] & free7[None, :], Hd, 0.0)
        Hd = Hd + jnp.diag(jnp.where(free7, damping, 1.0))
        Hd = Hd + damping * jnp.diag(jnp.diag(Hd))
        dx = jnp.linalg.solve(Hd, -bd).reshape(K, 7)
        ok = jnp.all(jnp.isfinite(dx))
        dx = jnp.where(ok, dx, 0.0)
        return jax.vmap(lambda x, s: sim3.compose(sim3.exp(x), s))(dx, S)

    S = jax.lax.fori_loop(0, n_iters, iteration, kf_sim3)
    Si = S[edge_i]
    Sj = S[edge_j]
    r = jax.vmap(edge_residual)(Si, Sj, edge_meas)
    w = edge_valid.astype(jnp.float32)
    mean = jnp.sum(jnp.sum(r * r, -1) * w) / jnp.maximum(jnp.sum(w), 1.0)
    return PoseGraphResult(kf_sim3=S, mean_residual=mean)
