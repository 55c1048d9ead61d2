"""Distributed Sim(3) pose-graph optimization over a TPU device mesh.

The essential-graph solve of ops/optim/pose_graph.py, sharded:

  * the "map" mesh axis is data parallelism over independent maps (each
    sequence's pose graph is independent — the multi-sequence sharded-maps
    configuration);
  * the "blk" axis shards the EDGE list of one map: each chip owns a stripe
    of edges, computes that stripe's residuals + 7x7 Jacobian blocks, and
    assembles a partial dense normal system [7K, 7K]; the full system is the
    psum over ICI.  The (small) solve and the pose update are replicated, so
    every chip holds identical poses for the next iteration — no gather
    needed.

This replaces the reference's single-threaded g2o essential-graph LM
(Optimizer::OptimizeEssentialGraph, src/Optimizer.cc:1017-1362): loop edges +
spanning-tree edges + strong covisibility edges over all keyframes, anchor
fixed.  Edge counts grow with map size (covisibility edges dominate), so
edges are the natural shard axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import sim3
from ..ops.optim.pose_graph import _jac_i, _jac_j, edge_residual


def _pg_shard_body(n_iters, damping,
                   kf_sim3, edge_i, edge_j, edge_meas, edge_valid, kf_fixed):
    """shard_map body.  kf_sim3 [s, K, 8] (replicated over blk), edge_*
    [s, E/D, ...] (edge stripe of this chip), kf_fixed [s, K]."""
    K = kf_sim3.shape[1]
    zero7 = jnp.zeros(7, jnp.float32)

    def one_map(S0, ei, ej, meas, valid, fixed):
        free = ~fixed
        w_edge = valid.astype(jnp.float32)

        def iteration(_, S):
            Si = S[ei]
            Sj = S[ej]
            r = jax.vmap(edge_residual)(Si, Sj, meas)
            Ji = jax.vmap(lambda a, b, m: _jac_i(zero7, zero7, a, b, m))(Si, Sj, meas)
            Jj = jax.vmap(lambda a, b, m: _jac_j(zero7, zero7, a, b, m))(Si, Sj, meas)
            Ji = Ji * free[ei][:, None, None]
            Jj = Jj * free[ej][:, None, None]
            wJi = Ji * w_edge[:, None, None]
            wJj = Jj * w_edge[:, None, None]

            H = jnp.zeros((K, K, 7, 7), jnp.float32)
            b = jnp.zeros((K, 7), jnp.float32)
            H = H.at[ei, ei].add(jnp.einsum("eai,eaj->eij", wJi, Ji))
            H = H.at[ej, ej].add(jnp.einsum("eai,eaj->eij", wJj, Jj))
            H = H.at[ei, ej].add(jnp.einsum("eai,eaj->eij", wJi, Jj))
            H = H.at[ej, ei].add(jnp.einsum("eai,eaj->eij", wJj, Ji))
            b = b.at[ei].add(jnp.einsum("eai,ea->ei", wJi, r))
            b = b.at[ej].add(jnp.einsum("eai,ea->ei", wJj, r))

            # full normal system = sum of every chip's edge-stripe partials
            H = jax.lax.psum(H, "blk")
            b = jax.lax.psum(b, "blk")

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

        S = jax.lax.fori_loop(0, n_iters, iteration, S0)
        r = jax.vmap(edge_residual)(S[ei], S[ej], meas)
        sq = jax.lax.psum(jnp.sum(jnp.sum(r * r, -1) * w_edge), "blk")
        cnt = jax.lax.psum(jnp.sum(w_edge), "blk")
        return S, sq / jnp.maximum(cnt, 1.0)

    return jax.vmap(one_map)(kf_sim3, edge_i, edge_j, edge_meas, edge_valid,
                             kf_fixed)


def distributed_pose_graph(
    mesh: Mesh,
    kf_sim3: jnp.ndarray,     # [S, K, 8]
    edge_i: jnp.ndarray,      # [S, E] int32 (E divisible by mesh "blk")
    edge_j: jnp.ndarray,      # [S, E] int32
    edge_meas: jnp.ndarray,   # [S, E, 8] measured S_i . S_j^-1
    edge_valid: jnp.ndarray,  # [S, E] bool
    kf_fixed: jnp.ndarray,    # [S, K] bool
    n_iters: int = 20,
    damping: float = 1e-6,
):
    """Jit-compiled sharded pose-graph GN over ("map", "blk").

    Returns (kf_sim3 [S, K, 8], mean_residual [S]).
    """
    body = functools.partial(_pg_shard_body, n_iters, damping)
    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P("map"), P("map", "blk"), P("map", "blk"), P("map", "blk"),
            P("map", "blk"), P("map"),
        ),
        out_specs=(P("map"), P("map")),
        check_vma=False,
    )
    return jax.jit(mapped)(kf_sim3, edge_i, edge_j, edge_meas, edge_valid,
                           kf_fixed)
