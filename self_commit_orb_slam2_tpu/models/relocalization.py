"""Relocalization: BoW candidate retrieval + EPnP-RANSAC + robust refine.

TPU-native counterpart of Tracking::Relocalization (reference
src/Tracking.cc:2030-2240) and KeyFrameDatabase::DetectRelocalizationCandidates
(src/KeyFrameDatabase.cc:252-374):

  * candidate retrieval: one dense L1-score matvec over all keyframe BoW
    vectors instead of the inverted-file walk;
  * per candidate (vmapped): node-constrained SearchByBoW matching
    (ORBmatcher.cc:230) between the keyframe's map points and the frame,
    then batched EPnP-RANSAC (PnPsolver), then the robust pose optimizer;
  * accept at >= 50 inliers (reference :2218).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import bow as bow_ops
from ..ops.matching import core as mcore
from ..ops.optim.pose_opt import pose_optimize
from ..ops.solvers.epnp import pnp_ransac
from .config import SlamConfig
from .frame import FrameData
from .map_state import NO_POINT, MapState
from .tracking import _observations

N_CANDIDATES = 5


class RelocResult(NamedTuple):
    success: jnp.ndarray    # scalar bool
    Tcw: jnp.ndarray        # [4, 4]
    obs_pt: jnp.ndarray     # [N] matched point ids (post-refine inliers)
    n_inliers: jnp.ndarray  # scalar int32


def relocalize(
    config: SlamConfig,
    m: MapState,
    frame: FrameData,
    key: jnp.ndarray,
    min_accept: int = 50,
) -> RelocResult:
    assert config.vocab is not None, "relocalization requires a vocabulary"
    vocab = config.vocab
    sigma2 = jnp.asarray(config.orb.sigma2())

    words, nodes = bow_ops.transform(vocab, frame.desc, frame.valid)
    vec = bow_ops.bow_vector(vocab, words)
    scores = bow_ops.l1_score(vec, m.kf_bow) * m.kf_valid
    _, cand_kf = jax.lax.top_k(scores, N_CANDIDATES)

    def try_candidate(kf_id, key):
        # SearchByBoW: descriptor match constrained to identical mid-level
        # vocabulary nodes, only keyframe features that carry a map point.
        kf_has_pt = (m.kf_obs_pt[kf_id] >= 0) & m.kf_feat_valid[kf_id]
        node_mask = (
            (m.kf_node[kf_id][:, None] == nodes[None, :])
            & (m.kf_node[kf_id] >= 0)[:, None]
        )
        match = mcore.mutual_best_match(
            m.kf_desc[kf_id], frame.desc, node_mask,
            kf_has_pt, frame.valid, max_dist=mcore.TH_LOW, ratio=0.75,
        )
        keep = mcore.rotation_consistency_mask(
            m.kf_angle[kf_id], frame.angle, match
        )
        match = match._replace(valid=keep)

        pt_ids = jnp.where(match.valid, m.kf_obs_pt[kf_id], NO_POINT)
        tgt = jnp.where(match.valid, match.idx, frame.capacity + 1)
        # per-frame-feature matched point id
        obs_pt = (
            jnp.full(frame.capacity, NO_POINT, jnp.int32)
            .at[tgt].set(pt_ids, mode="drop")
        )
        sel = obs_pt >= 0
        pts_w = m.pt_pos[jnp.clip(obs_pt, 0, m.max_pt - 1)]
        res = pnp_ransac(
            config.camera, pts_w, frame.xy, sel, sigma2[frame.level], key,
            min_inliers=10,
        )
        # robust refinement over the BoW matches from the RANSAC pose
        opt = pose_optimize(
            config.camera, res.Tcw, pts_w, _observations(frame),
            sigma2[frame.level], sel & frame.valid, ur_weight=config.ur_weight,
        )
        obs_out = jnp.where(opt.inliers, obs_pt, NO_POINT)
        return opt.n_inliers * res.success.astype(jnp.int32), opt.Tcw, obs_out

    keys = jax.random.split(key, N_CANDIDATES)
    n_inl, Tcws, obs = jax.vmap(try_candidate)(cand_kf, keys)
    best = jnp.argmax(n_inl)
    return RelocResult(
        success=n_inl[best] >= min_accept,
        Tcw=Tcws[best],
        obs_pt=obs[best],
        n_inliers=n_inl[best].astype(jnp.int32),
    )
