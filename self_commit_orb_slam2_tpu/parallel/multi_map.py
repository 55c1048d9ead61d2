"""Multi-sequence sharded-map refinement (the "KITTI 00+02+05" configuration).

Several independent maps (one per sequence) are refined jointly on a device
mesh: maps ride the "map" axis (pure data parallelism, DCN-friendly), and
inside each map the point blocks / pose-graph edges are sharded over "blk"
(ICI collectives).  This is the distributed analogue of running the
reference's LoopClosing::RunGlobalBundleAdjustment (src/LoopClosing.cc:880)
once per sequence, back to back, on one CPU.

Pipeline per map (all maps concurrently):
  1. optional distributed Sim3 pose graph over sequential + strong
     covisibility (+ caller-provided loop) edges — Optimizer::
     OptimizeEssentialGraph parity (src/Optimizer.cc:1017);
  2. map points transformed via their reference keyframe's correction
     (reference spanning-tree propagation, src/Optimizer.cc:1297-1345);
  3. distributed Schur-complement global BA (src/Optimizer.cc:55).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..models.config import SlamConfig
from ..models.map_state import MapState
from ..ops import se3, sim3
from .distributed_ba import distributed_bundle_adjust
from .distributed_pose_graph import distributed_pose_graph

# reference Optimizer.cc:1053 — covisibility edges enter the essential graph
# only above this shared-observation count
MIN_COVIS_WEIGHT = 100


def stack_maps(maps: Sequence[MapState]) -> MapState:
    """Stack S same-capacity maps into one [S, ...] batched MapState."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *maps)


def unstack_maps(batched: MapState, n: int) -> list[MapState]:
    return [jax.tree.map(lambda x, s=s: x[s], batched) for s in range(n)]


def _covis_weights(m: MapState) -> jnp.ndarray:
    """[S, K, K] shared-map-point counts (KeyFrame::UpdateConnections weight,
    reference KeyFrame.cc:386) — one incidence matmul per map."""
    obs = (m.kf_obs_pt >= 0) & m.kf_feat_valid & m.kf_valid[:, :, None]
    P = m.pt_pos.shape[-2]
    pid = jnp.clip(m.kf_obs_pt, 0, P - 1)

    def one(pid_s, obs_s):
        inc = jnp.zeros((pid_s.shape[0], P), jnp.float32)
        inc = jax.vmap(lambda row_p, row_o, row:
                       row.at[row_p].add(row_o.astype(jnp.float32)))(
            pid_s, obs_s, inc)
        inc = jnp.minimum(inc, 1.0)
        return inc @ inc.T

    W = jax.vmap(one)(pid, obs)
    K = W.shape[-1]
    return W * (1.0 - jnp.eye(K))


def build_essential_edges(
    m: MapState,
    edge_cap: int,
    extra_i: np.ndarray | None = None,   # [S, L] caller loop edges
    extra_j: np.ndarray | None = None,
    min_weight: int = MIN_COVIS_WEIGHT,
    extra_meas: np.ndarray | None = None,  # [S, L, 8] Sim3 measurements
):
    """Sequential + strong-covisibility (+ loop) edges per map, padded to
    edge_cap (divisible by the blk width).

    Non-loop edges are measured from the CURRENT poses — their residuals are
    zero at initialization, so they act purely as stiffness holding the chain
    together.  Loop edges MUST carry their own measurement (`extra_meas`,
    e.g. the Sim3 from loop detection): the reference's
    OptimizeEssentialGraph corrects drift precisely because loop-edge
    measurements come from the Sim3 solver, not the drifted poses
    (src/Optimizer.cc:1100-1265).  Loop edges without a measurement are
    rejected — they would be exact no-ops."""
    S, K = m.kf_valid.shape
    W = np.asarray(_covis_weights(m))
    Tcw = np.asarray(m.kf_Tcw)
    valid = np.asarray(m.kf_valid)

    ei = np.zeros((S, edge_cap), np.int32)
    ej = np.zeros((S, edge_cap), np.int32)
    meas = np.tile(np.array([0, 0, 0, 1, 0, 0, 0, 1], np.float32),
                   (S, edge_cap, 1))
    ok = np.zeros((S, edge_cap), bool)
    for s in range(S):
        pairs = []  # (a, b, measurement-or-None)
        live = np.nonzero(valid[s])[0]
        for a, b in zip(live[1:], live[:-1]):       # spanning/sequential chain
            pairs.append((int(a), int(b), None))
        strong = np.argwhere(np.triu(W[s]) >= min_weight)
        for a, b in strong:
            if valid[s, a] and valid[s, b] and abs(int(a) - int(b)) > 1:
                pairs.append((int(a), int(b), None))
        if extra_i is not None:
            if extra_meas is None:
                raise ValueError(
                    "loop edges need explicit Sim3 measurements (extra_meas); "
                    "measuring them from the drifted poses makes the pose "
                    "graph a no-op")
            for le, (a, b) in enumerate(zip(extra_i[s], extra_j[s])):
                if a >= 0 and b >= 0:
                    pairs.append((int(a), int(b), np.asarray(extra_meas[s, le])))
        pairs = pairs[:edge_cap]
        for e, (a, b, mm) in enumerate(pairs):
            ei[s, e], ej[s, e] = a, b
            if mm is None:
                rel = Tcw[s, a] @ np.linalg.inv(Tcw[s, b])
                mm = np.asarray(sim3.from_se3(jnp.asarray(rel)))
            meas[s, e] = mm
            ok[s, e] = True
    return jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(meas), jnp.asarray(ok)


def _apply_pose_graph_result(m: MapState, S_new: jnp.ndarray) -> MapState:
    """Write optimized Sim3 poses back as SE3 (s=1 after normalization) and
    transform every map point via its reference keyframe's correction —
    x' = Tnew^-1 . Told . x (reference Optimizer.cc:1297-1345)."""
    def one(ms, Ss):
        T_old = ms.kf_Tcw
        T_new = jax.vmap(sim3.to_se3)(Ss)
        T_new = jnp.where(ms.kf_valid[:, None, None], T_new, T_old)
        ref = jnp.clip(ms.pt_ref_kf, 0, ms.max_kf - 1)
        corr = jax.vmap(lambda a, b: se3.compose(se3.inverse(a), b))(
            T_new[ref], T_old[ref])
        x = jnp.einsum("pij,pj->pi", corr[:, :3, :3], ms.pt_pos) + corr[:, :3, 3]
        x = jnp.where(ms.pt_valid[:, None], x, ms.pt_pos)
        return ms._replace(kf_Tcw=T_new, pt_pos=x)

    n = m.kf_valid.shape[0]
    outs = [one(jax.tree.map(lambda x, s=s: x[s], m), S_new[s]) for s in range(n)]
    return stack_maps(outs)


def joint_refine(
    mesh: Mesh,
    config: SlamConfig,
    maps: Sequence[MapState],
    loop_edges: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None,
    edge_cap: int = 256,
    pg_iters: int = 20,
    ba_iters: int = 10,
    run_pose_graph: bool = True,
) -> list[MapState]:
    """Jointly refine S maps on the mesh; returns the refined maps."""
    n = len(maps)
    m = stack_maps(maps)

    if run_pose_graph:
        li, lj, lm = loop_edges if loop_edges is not None else (None, None, None)
        ei, ej, meas, ok = build_essential_edges(m, edge_cap, li, lj,
                                                 extra_meas=lm)
        S0 = jax.vmap(jax.vmap(sim3.from_se3))(m.kf_Tcw)
        first = jnp.argmax(m.kf_valid, axis=1)
        K = m.kf_valid.shape[1]
        fixed = (~m.kf_valid) | (jnp.arange(K)[None, :] == first[:, None])
        S_new, _ = distributed_pose_graph(
            mesh, S0, ei, ej, meas, ok, fixed, n_iters=pg_iters)
        m = _apply_pose_graph_result(m, S_new)

    obs_uvr = jnp.concatenate([m.kf_xy, m.kf_uright[..., None]], axis=-1)
    sigma2 = jnp.asarray(config.orb.sigma2())[m.kf_level]
    first = jnp.argmax(m.kf_valid, axis=1)
    K = m.kf_valid.shape[1]
    kf_free = m.kf_valid & (jnp.arange(K)[None, :] != first[:, None])
    res = distributed_bundle_adjust(
        mesh, config.camera, m.kf_Tcw, m.pt_pos, m.kf_obs_pt, obs_uvr, sigma2,
        m.kf_feat_valid & m.kf_valid[:, :, None] & (m.kf_obs_pt >= 0),
        kf_free, m.pt_valid, n_iters=ba_iters,
    )
    m = m._replace(kf_Tcw=res.kf_Tcw, pt_pos=res.pt_pos)
    return unstack_maps(m, n)
