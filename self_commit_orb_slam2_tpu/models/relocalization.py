"""Relocalization: BoW candidate retrieval + EPnP-RANSAC + robust refine.

TPU-native counterpart of Tracking::Relocalization (reference
src/Tracking.cc:2030-2240) and KeyFrameDatabase::DetectRelocalizationCandidates
(src/KeyFrameDatabase.cc:252-374):

  * candidate retrieval with the reference's full semantics: share-word
    filter at 0.8*maxCommonWords, then covisibility-group ACCUMULATED
    scores with the 0.75*best cutoff, best member per surviving group —
    computed from the sparse (word id, weight) database rows, so the
    vocabulary can be ORBvoc-sized without a dense [K, W] table;
  * per candidate (vmapped): node-constrained SearchByBoW matching
    (ORBmatcher.cc:230) between the keyframe's map points and the frame,
    then batched EPnP-RANSAC (PnPsolver), then the robust pose optimizer;
  * the reference's WIDENING PROJECTION rounds (Tracking.cc:2169-2214):
    when the BoW-seeded optimization lands below 50 inliers, the candidate
    keyframe's map points are projected through the current estimate and
    window-matched (radius 10, TH_HIGH), re-optimized; a second narrow
    round (radius 3, distance 64) runs when the count lands in [30, 50);
  * accept at >= 50 inliers (reference :2218).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import bow as bow_ops
from ..ops import se3
from ..ops.camera import project
from ..ops.matching import core as mcore
from ..ops.optim.pose_opt import pose_optimize
from ..ops.solvers.epnp import pnp_ransac
from .config import SlamConfig
from .frame import FrameData
from .map_state import NO_POINT, MapState
from . import map_state as ms
from .tracking import _observations, _scatter_matches

N_CANDIDATES = 5
N_GROUP = 8   # candidates entering covisibility-group accumulation


class RelocResult(NamedTuple):
    success: jnp.ndarray    # scalar bool
    Tcw: jnp.ndarray        # [4, 4]
    obs_pt: jnp.ndarray     # [N] matched point ids (post-refine inliers)
    n_inliers: jnp.ndarray  # scalar int32


def detect_reloc_candidates(config: SlamConfig, m: MapState,
                            q_ids: jnp.ndarray, q_vals: jnp.ndarray):
    """[N_CANDIDATES] keyframe slots by the reference's retrieval semantics
    (KeyFrameDatabase::DetectRelocalizationCandidates,
    src/KeyFrameDatabase.cc:252-374): share-word filter at
    0.8*maxCommonWords, covisibility-group accumulated scores with the
    0.75*best cutoff, best-scoring member per group.  Unlike loop detection
    there is no covisible exclusion and no minScore gate.  Returns
    (slots [C], active [C])."""
    common = bow_ops.sparse_common_words(q_ids, m.kf_bow_ids)
    eligible = m.kf_valid & (common > 0)
    max_common = jnp.max(jnp.where(eligible, common, 0))
    word_ok = common.astype(jnp.float32) >= 0.8 * max_common.astype(jnp.float32)
    scores = bow_ops.sparse_l1_score(q_ids, q_vals, m.kf_bow_ids,
                                     m.kf_bow_vals)
    cand0 = eligible & word_ok

    base_scores = jnp.where(cand0, scores, -jnp.inf)
    top_s, top_i = jax.lax.top_k(base_scores, min(N_GROUP, m.max_kf))

    C = ms.covisibility_matrix_cached(m)

    def group_score(k):
        row = C[k].at[k].set(0)
        nbv, nbi = jax.lax.top_k(row, min(10, m.max_kf))
        nb_is_cand = cand0[nbi] & (nbv > 0)
        acc = scores[k] + jnp.sum(jnp.where(nb_is_cand, scores[nbi], 0.0))
        nb_best = jnp.argmax(jnp.where(nb_is_cand, scores[nbi], -jnp.inf))
        use_nb = nb_is_cand[nb_best] & (scores[nbi[nb_best]] > scores[k])
        return acc, jnp.where(use_nb, nbi[nb_best], k).astype(jnp.int32)

    accs, best_kfs = jax.vmap(group_score)(top_i)
    cand_live = jnp.isfinite(top_s)
    accs = jnp.where(cand_live, accs, -jnp.inf)
    group_keep = cand_live & (accs >= 0.75 * jnp.max(accs))
    order = jnp.argsort(-jnp.where(group_keep, accs, -jnp.inf))
    sel = order[:N_CANDIDATES]
    return best_kfs[sel], group_keep[sel]


def relocalize(
    config: SlamConfig,
    m: MapState,
    frame: FrameData,
    key: jnp.ndarray,
    min_accept: int = 50,
) -> RelocResult:
    assert config.vocab is not None, "relocalization requires a vocabulary"
    vocab = config.vocab
    cam = config.camera
    sigma2 = jnp.asarray(config.orb.sigma2())
    scale_factors = jnp.asarray(config.orb.scale_factors())

    words, nodes = bow_ops.transform(vocab, frame.desc, frame.valid)
    q_ids, q_vals = bow_ops.sparse_bow(vocab, words, config.bow_top)
    cand_kf, cand_active = detect_reloc_candidates(config, m, q_ids, q_vals)

    def optimize(Tcw0, obs_pt):
        pts_w = m.pt_pos[jnp.clip(obs_pt, 0, m.max_pt - 1)]
        sel = (obs_pt >= 0) & frame.valid
        opt = pose_optimize(
            cam, Tcw0, pts_w, _observations(frame),
            sigma2[frame.level], sel, ur_weight=config.ur_weight,
        )
        return opt, jnp.where(opt.inliers, obs_pt, NO_POINT)

    def proj_round(kf_id, Tcw, obs_pt, radius_px, max_dist):
        """Widening SearchByProjection round (reference Tracking.cc:2169-2214
        via ORBmatcher::SearchByProjection(Frame, KeyFrame, ...) matcher
        ORBmatcher.cc:1731): project the candidate keyframe's map points
        through the current estimate, window-match still-unmatched frame
        features, merge, and re-optimize."""
        pt_row = m.kf_obs_pt[kf_id]
        ids = jnp.clip(pt_row, 0, m.max_pt - 1)
        row_ok = (pt_row >= 0) & m.kf_feat_valid[kf_id] & m.pt_valid[ids]
        pc = se3.transform_points(Tcw, m.pt_pos[ids])
        uv, z = project(cam, pc)
        vis = (
            row_ok & (z > 0)
            & (uv[:, 0] >= 0) & (uv[:, 0] < cam.width)
            & (uv[:, 1] >= 0) & (uv[:, 1] < cam.height)
        )
        # exclude points already matched (reference's sFound set)
        found = jnp.zeros(m.max_pt + 2, bool).at[
            jnp.where(obs_pt >= 0, obs_pt, m.max_pt + 1)
        ].set(True, mode="drop")
        vis &= ~found[ids]
        unmatched = frame.valid & (obs_pt < 0)
        radius = radius_px * scale_factors[m.kf_level[kf_id]]
        wmask = mcore.window_mask(uv, frame.xy, radius)
        match = mcore.masked_best_match(
            m.pt_desc[ids], frame.desc, wmask, vis, unmatched,
            max_dist=max_dist, ratio=None,
        )
        new_obs = _scatter_matches(frame.capacity, match,
                                   ids.astype(jnp.int32))
        merged = jnp.where(obs_pt >= 0, obs_pt, new_obs)
        return optimize(Tcw, merged)

    def try_candidate(kf_id, active, key):
        # SearchByBoW: descriptor match constrained to identical mid-level
        # vocabulary nodes, only keyframe features that carry a map point.
        kf_has_pt = (m.kf_obs_pt[kf_id] >= 0) & m.kf_feat_valid[kf_id]
        node_mask = (
            (m.kf_node[kf_id][:, None] == nodes[None, :])
            & (m.kf_node[kf_id] >= 0)[:, None]
        )
        match = mcore.mutual_best_match(
            m.kf_desc[kf_id], frame.desc, node_mask,
            kf_has_pt & active, frame.valid, max_dist=mcore.TH_LOW, ratio=0.75,
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
        opt, obs1 = optimize(res.Tcw, obs_pt)

        # widening round: < min_accept inliers -> radius 10, TH_HIGH
        # (reference Tracking.cc:2169-2186)
        opt_w, obs_w = proj_round(kf_id, opt.Tcw, obs1, 10.0, mcore.TH_HIGH)
        widen = opt.n_inliers < min_accept
        opt_n, obs2 = jax.tree.map(
            lambda a, b: jnp.where(widen, a, b), (opt_w, obs_w), (opt, obs1))
        # narrow round: landed in [min_accept*0.6, min_accept) -> radius 3,
        # distance 64 (reference Tracking.cc:2190-2210)
        opt_nn, obs_nn = proj_round(kf_id, opt_n.Tcw, obs2, 3.0, 64)
        narrow = widen & (opt_n.n_inliers >= (min_accept * 3) // 5) \
            & (opt_n.n_inliers < min_accept)
        opt_f, obs_f = jax.tree.map(
            lambda a, b: jnp.where(narrow, a, b), (opt_nn, obs_nn),
            (opt_n, obs2))

        n_ok = opt_f.n_inliers * res.success.astype(jnp.int32) \
            * active.astype(jnp.int32)
        return n_ok, opt_f.Tcw, obs_f

    keys = jax.random.split(key, N_CANDIDATES)
    n_inl, Tcws, obs = jax.vmap(try_candidate)(cand_kf, cand_active, keys)
    best = jnp.argmax(n_inl)
    return RelocResult(
        success=n_inl[best] >= min_accept,
        Tcw=Tcws[best],
        obs_pt=obs[best],
        n_inliers=n_inl[best].astype(jnp.int32),
    )
