"""Loop closing: BoW detection, Sim3 verification, essential-graph correction.

TPU-native counterpart of the reference LoopClosing thread
(src/LoopClosing.cc) run as a pipelined phase after keyframe insertion:

  * DetectLoop (:133) with KeyFrameDatabase::DetectLoopCandidates semantics
    (src/KeyFrameDatabase.cc:104-239): shared-word filter at
    0.8*maxCommonWords, score >= minScore (min over covisibles), then
    covisibility-group ACCUMULATED scores with the 0.75*best cutoff —
    multiple candidates survive, not just the argmax.
  * ComputeSim3 (:337) vmapped over the surviving candidates: per candidate,
    node-constrained SearchByBoW -> 3D-3D pairs -> batched Horn RANSAC over
    3-point minimal sets (Sim3Solver.cc:199/309, scale locked for
    stereo/RGB-D) -> SearchBySim3-style projection match extension
    (ORBmatcher.cc:1314) -> Sim3 GN polish -> accept >= 20 inliers.
  * Final acceptance gate: project the loop keyframe's covisibility-group
    points through the corrected Scw into the current keyframe and require
    >= 40 total matches (reference LoopClosing.cc:522-545).
  * CorrectLoop (:571): Sim3 pose-graph (essential graph) over the
    SEQ-ordered temporal chain + strong covisibility edges + ALL persisted
    loop edges (KeyFrame::AddLoopEdge, src/KeyFrame.cc:556) with the loop
    keyframe fixed (Optimizer::OptimizeEssentialGraph), pose recovery
    T = [R, t/s], and map-point remapping through reference keyframes.
  * Global BA after every loop (:880): dense in-graph when the map capacity
    permits, otherwise dispatched to the sharded parallel/distributed_ba
    path from the host (works on a single device too).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import bow as bow_ops
from ..ops import se3, sim3
from ..ops.matching import core as mcore
from ..ops.optim.pose_graph import optimize_pose_graph
from ..ops.solvers.horn import horn_align
from .config import SlamConfig
from .map_state import MapState
from . import map_state as ms

COOLDOWN = 10        # reference :147
MIN_SIM3_INLIERS = 20  # reference :463
MIN_PROJ_TOTAL = 40    # reference :545
N_HYPOTHESES = 128
N_CANDIDATES = 3       # Sim3-verified candidates per pass
N_GROUP = 8            # candidates entering group accumulation


class LoopDetection(NamedTuple):
    found: jnp.ndarray       # scalar bool: best candidate fully verified
    cand_kf: jnp.ndarray     # scalar int32 (slot of the verified candidate)
    S_cur_cand: jnp.ndarray  # [8] Sim3 mapping cand-camera coords -> cur-camera
    n_inliers: jnp.ndarray
    n_proj: jnp.ndarray      # scalar int32: Scw-projection total (>=40 gate)
    groups: jnp.ndarray      # [C, K] bool BoW-candidate covisibility groups
    group_ok: jnp.ndarray    # [C] bool: group is a live BoW-stage candidate
    best_c: jnp.ndarray      # scalar int32: which group the winner belongs to


def _sim3_verify(config: SlamConfig, m: MapState, kf_id, cand, active, key):
    """Per-candidate ComputeSim3: SearchByBoW -> Horn RANSAC ->
    projection match extension -> GN polish.  Returns (n_inliers, S)."""
    cam = config.camera
    fix_scale = config.sensor != "mono"

    cur_has = (m.kf_obs_pt[kf_id] >= 0) & m.kf_feat_valid[kf_id]
    cand_has = (m.kf_obs_pt[cand] >= 0) & m.kf_feat_valid[cand]
    node_mask = (
        (m.kf_node[kf_id][:, None] == m.kf_node[cand][None, :])
        & (m.kf_node[kf_id] >= 0)[:, None]
    )
    match = mcore.mutual_best_match(
        m.kf_desc[kf_id], m.kf_desc[cand], node_mask,
        cur_has & active, cand_has, max_dist=mcore.TH_LOW, ratio=0.75,
    )
    n_matches = jnp.sum(match.valid)

    pid_cur = jnp.clip(m.kf_obs_pt[kf_id], 0, m.max_pt - 1)
    j = jnp.where(match.valid, match.idx, 0)
    pid_cand = jnp.clip(m.kf_obs_pt[cand, j], 0, m.max_pt - 1)
    p_cur = se3.transform_points(m.kf_Tcw[kf_id], m.pt_pos[pid_cur])
    p_cand = se3.transform_points(m.kf_Tcw[cand], m.pt_pos[pid_cand])
    w = match.valid.astype(jnp.float32)

    n_feat = match.valid.shape[0]
    probs = w / jnp.maximum(jnp.sum(w), 1.0)
    sets = jax.random.choice(key, n_feat, shape=(N_HYPOTHESES, 3),
                             replace=True, p=probs)
    s_h, R_h, t_h = horn_align(p_cand[sets], p_cur[sets],
                               with_scale=not fix_scale)
    if fix_scale:
        s_h = jnp.ones_like(s_h)

    def reproj_err(R, t, s, src, dst):
        pred = s * src @ R.T + t
        z = jnp.where(jnp.abs(pred[:, 2]) < 1e-6, 1e-6, pred[:, 2])
        u = cam.fx * pred[:, 0] / z + cam.cx
        v = cam.fy * pred[:, 1] / z + cam.cy
        zd = jnp.where(jnp.abs(dst[:, 2]) < 1e-6, 1e-6, dst[:, 2])
        ud = cam.fx * dst[:, 0] / zd + cam.cx
        vd = cam.fy * dst[:, 1] / zd + cam.cy
        return (u - ud) ** 2 + (v - vd) ** 2

    def hyp_inliers(s, R, t, src, pair_ok):
        e1 = reproj_err(R, t, s, src, p_cur)
        Rt = R.T
        e2 = reproj_err(Rt, -Rt @ t / jnp.maximum(s, 1e-9),
                        1.0 / jnp.maximum(s, 1e-9), p_cur, src)
        return (e1 < 9.21) & (e2 < 9.21) & pair_ok  # reference th2 ~ 9.21/10

    inl = jax.vmap(lambda s, R, t: hyp_inliers(s, R, t, p_cand, match.valid))(
        s_h, R_h, t_h)
    n_inl = jnp.sum(inl, axis=1)
    best = jnp.argmax(n_inl)

    w_best = inl[best].astype(jnp.float32)
    s_f, R_f, t_f = horn_align(p_cand, p_cur, w_best,
                               with_scale=not fix_scale)
    if fix_scale:
        s_f = jnp.ones_like(s_f)

    # --- SearchBySim3-style match extension (reference ORBmatcher.cc:1314):
    # project the candidate's map points into the current keyframe through
    # the RANSAC Sim3 and claim window matches the BoW stage missed.
    S_r = sim3.make(R_f, t_f, s_f)
    p_cand_in_cur = jax.vmap(sim3.apply_point, in_axes=(None, 0))(S_r, p_cand)
    z = jnp.maximum(p_cand_in_cur[:, 2], 1e-6)
    uv = jnp.stack([cam.fx * p_cand_in_cur[:, 0] / z + cam.cx,
                    cam.fy * p_cand_in_cur[:, 1] / z + cam.cy], -1)
    vis = cand_has & (p_cand_in_cur[:, 2] > 0)
    ext = mcore.mutual_best_match(
        m.kf_desc[cand], m.kf_desc[kf_id],
        mcore.window_mask(uv, m.kf_xy[kf_id], jnp.full(n_feat, 7.5)),
        vis, cur_has, max_dist=mcore.TH_HIGH, ratio=None,
    )
    # merged correspondence set, indexed by CURRENT-keyframe feature: keep
    # the BoW match when both exist
    ext_scatter = jnp.full(n_feat, -1, jnp.int32).at[
        jnp.where(ext.valid, ext.idx, n_feat + 1)
    ].set(jnp.arange(n_feat, dtype=jnp.int32), mode="drop")
    j_ext = jnp.where(match.valid, j,
                      jnp.where(ext_scatter >= 0, ext_scatter, 0))
    pair_ok = match.valid | (ext_scatter >= 0)
    pid_cand2 = jnp.clip(m.kf_obs_pt[cand, j_ext], 0, m.max_pt - 1)
    p_cand2 = se3.transform_points(m.kf_Tcw[cand], m.pt_pos[pid_cand2])

    from ..ops.optim.sim3_opt import optimize_sim3

    uv_cur = m.kf_xy[kf_id]
    uv_cand = m.kf_xy[cand, jnp.clip(j_ext, 0, m.feat_cap - 1)]
    # inliers of the EXTENDED correspondence set under the refit transform —
    # so the projection-recovered pairs actually enter the GN polish
    inl_ext = hyp_inliers(sim3.scale(S_r), sim3.rotation(S_r),
                          sim3.translation(S_r), p_cand2, pair_ok)
    opt = optimize_sim3(
        cam, S_r, p_cur, p_cand2, uv_cur, uv_cand,
        inl_ext, fix_scale=fix_scale,
    )
    S = opt.S12
    final_inl = jnp.sum(hyp_inliers(
        sim3.scale(S), sim3.rotation(S), sim3.translation(S), p_cand2,
        pair_ok))
    ok = active & (n_matches >= 20) & (final_inl >= MIN_SIM3_INLIERS)
    return jnp.where(ok, final_inl, 0).astype(jnp.int32), S


def detect_and_verify(
    config: SlamConfig, m: MapState, kf_id: jnp.ndarray, key: jnp.ndarray
) -> LoopDetection:
    cam = config.camera

    # ---- candidate retrieval (DetectLoop + DetectLoopCandidates) ----
    # KF-KF covisibility = one cached-incidence matmul (inc @ inc.T)
    C = ms.covisibility_matrix_cached(m)
    counts = C[kf_id]
    covis = counts > 0
    q_ids, q_vals = m.kf_bow_ids[kf_id], m.kf_bow_vals[kf_id]
    scores = bow_ops.sparse_l1_score(q_ids, q_vals, m.kf_bow_ids,
                                     m.kf_bow_vals)
    covis_scores = jnp.where(covis & m.kf_valid, scores, jnp.inf)
    # with no valid covisible scores fall back to the absolute floor instead
    # of an impossible threshold (reference LoopClosing.cc:159-179)
    min_score = jnp.where(jnp.isfinite(jnp.min(covis_scores)),
                          jnp.minimum(jnp.min(covis_scores), 1.0), 0.0)
    seq_cur = m.kf_seq[kf_id]
    eligible = (
        m.kf_valid & ~covis & (m.kf_seq >= 0)
        & (m.kf_seq <= seq_cur - COOLDOWN)
    )
    # shared-word filter (KeyFrameDatabase.cc:104-160): candidates must share
    # >= 0.8 * maxCommonWords words with the query
    common = bow_ops.sparse_common_words(q_ids, m.kf_bow_ids)
    max_common = jnp.max(jnp.where(eligible, common, 0))
    word_ok = common.astype(jnp.float32) >= 0.8 * max_common.astype(jnp.float32)
    # score gate is exactly the reference's: si >= minScore (computed from
    # the covisible neighbourhood, KeyFrameDatabase.cc:104-160) — no extra
    # absolute floor, whose fixed constant could silently suppress every
    # candidate on imagery with a different score distribution
    cand0 = eligible & word_ok & (scores >= min_score)

    # covisibility-group accumulated scores over the best N_GROUP candidates
    # (KeyFrameDatabase.cc:180-239): each candidate's score is summed with
    # its top-10 covisible co-candidates; groups below 0.75*best are cut
    base_scores = jnp.where(cand0, scores, -jnp.inf)
    top_s, top_i = jax.lax.top_k(base_scores, min(N_GROUP, m.max_kf))

    def group_score(k):
        row = C[k].at[k].set(0)
        nbv, nbi = jax.lax.top_k(row, min(10, m.max_kf))
        nb_is_cand = cand0[nbi] & (nbv > 0)
        acc = scores[k] + jnp.sum(jnp.where(nb_is_cand, scores[nbi], 0.0))
        nb_best = jnp.argmax(jnp.where(nb_is_cand, scores[nbi], -jnp.inf))
        use_nb = nb_is_cand[nb_best] & (scores[nbi[nb_best]] > scores[k])
        best_kf = jnp.where(use_nb, nbi[nb_best], k)
        # CONSISTENCY group = the candidate's whole covisibility
        # neighborhood (reference spCandidateGroup =
        # GetConnectedKeyFrames() + itself, LoopClosing.cc:253) — NOT just
        # co-candidates: consecutive keyframes retrieve adjacent candidates
        # whose neighborhoods overlap, and that overlap is what chains.
        # (The accumulated SCORE above still sums co-candidates only,
        # KeyFrameDatabase.cc:180-239.)
        group = jnp.zeros(m.max_kf, bool).at[nbi].set(nbv > 0)
        group = group.at[k].set(True)
        return acc, best_kf.astype(jnp.int32), group

    accs, best_kfs, groups_all = jax.vmap(group_score)(top_i)
    cand_live = jnp.isfinite(top_s)
    accs = jnp.where(cand_live, accs, -jnp.inf)
    best_acc = jnp.max(accs)
    group_keep = cand_live & (accs >= 0.75 * best_acc)

    order = jnp.argsort(-jnp.where(group_keep, accs, -jnp.inf))
    sel = order[:N_CANDIDATES]
    cand_slots = best_kfs[sel]
    cand_active = group_keep[sel]
    groups = groups_all[sel] & m.kf_valid[None, :]

    # ---- vmapped Sim3 verification over the surviving candidates ----
    keys = jax.random.split(key, N_CANDIDATES)
    n_inls, Ss = jax.vmap(
        lambda c, a, k: _sim3_verify(config, m, kf_id, c, a, k)
    )(cand_slots, cand_active, keys)
    best_c = jnp.argmax(n_inls)
    cand = cand_slots[best_c]
    S = Ss[best_c]
    final_inl = n_inls[best_c]

    # ---- Scw-projection acceptance gate (LoopClosing.cc:522-545): project
    # the loop group's points into the current keyframe through the
    # corrected pose; total matches must reach 40
    group_mask = groups[best_c]
    gpt = ms.points_of_keyframes_cached(m, group_mask)
    CAP = config.caps.local_points
    gids = jnp.nonzero(gpt, size=CAP, fill_value=m.max_pt)[0]
    g_ok = gids < m.max_pt
    g_c = jnp.clip(gids, 0, m.max_pt - 1)
    # corrected current pose: Scw = S_cur_cand . S_cand_w
    S_cw = sim3.compose(S, sim3.from_se3(m.kf_Tcw[cand]))
    p_c = jax.vmap(sim3.apply_point, in_axes=(None, 0))(S_cw, m.pt_pos[g_c])
    zc = jnp.maximum(p_c[:, 2], 1e-6)
    uvc = jnp.stack([cam.fx * p_c[:, 0] / zc + cam.cx,
                     cam.fy * p_c[:, 1] / zc + cam.cy], -1)
    visc = g_ok & (p_c[:, 2] > 0) & (uvc[:, 0] >= 0) & (uvc[:, 0] < cam.width) \
        & (uvc[:, 1] >= 0) & (uvc[:, 1] < cam.height)
    pm = mcore.mutual_best_match(
        m.pt_desc[g_c], m.kf_desc[kf_id],
        mcore.window_mask(uvc, m.kf_xy[kf_id], jnp.full(CAP, 10.0)),
        visc, m.kf_feat_valid[kf_id], max_dist=mcore.TH_LOW, ratio=None,
    )
    n_proj = jnp.sum(pm.valid).astype(jnp.int32)

    found = (final_inl >= MIN_SIM3_INLIERS) & (n_proj >= MIN_PROJ_TOTAL)
    return LoopDetection(
        found=found, cand_kf=cand, S_cur_cand=S,
        n_inliers=final_inl.astype(jnp.int32),
        n_proj=n_proj,
        groups=groups, group_ok=cand_active,
        best_c=best_c.astype(jnp.int32),
    )


def _search_and_fuse_loop(
    config: SlamConfig, m: MapState, kf_id: jnp.ndarray, det: LoopDetection
) -> MapState:
    """Project the loop group's map points into the current keyframe and its
    covisible neighbors, binding matches (reference LoopClosing::SearchAndFuse
    src/LoopClosing.cc:809 -> ORBmatcher::Fuse(Scw, radius 4)
    src/ORBmatcher.cc:1179).

    Free features are bound to the loop point; features already carrying a
    point are REBOUND to the loop point (the reference replaces the current
    point with the loop one, LoopClosing.cc:835-845) — the displaced losers
    keep their other observations and are collected by the found-ratio cull.
    These cross-sector observations are what make the post-loop global BA
    actually bend the map instead of reverting to the drifted configuration.
    """
    from ..ops.camera import in_frustum
    from .map_state import NO_POINT

    cam = config.camera
    scale_factors = jnp.asarray(config.orb.scale_factors())
    n_levels = config.orb.n_levels
    bounds = (0.0, float(cam.width), 0.0, float(cam.height))

    # current covisibility group: the keyframe + its top-10 covisibles
    # (cached incidence: observations unchanged since the mapping phase)
    counts = ms.covisibility_row_cached(m, m.kf_obs_pt[kf_id]).at[kf_id].set(0)
    topv, topi = jax.lax.top_k(counts, min(10, m.max_kf))
    grp_idx = jnp.concatenate([kf_id[None], topi])
    grp_ok = jnp.concatenate([jnp.ones(1, bool), topv > 0])

    # loop-side points: everything observed by the winning candidate's group
    loop_mask = det.groups[det.best_c]
    lpt = ms.points_of_keyframes_cached(m, loop_mask)
    CAP = config.caps.local_points
    cand = jnp.nonzero(lpt, size=CAP, fill_value=m.max_pt)[0]
    cand_ok = cand < m.max_pt
    cand_c = jnp.clip(cand, 0, m.max_pt - 1)
    pos = m.pt_pos[cand_c]
    normal = m.pt_normal[cand_c]
    mind = m.pt_min_dist[cand_c] * 0.8
    maxd = m.pt_max_dist[cand_c] * 1.2
    desc = m.pt_desc[cand_c]

    def fuse_one(Tcw, kf_xy, kf_level, kf_desc, kf_fvalid, kf_obs_row, ok):
        vis, uv, dist, _ = in_frustum(
            cam, Tcw, pos, normal, mind, maxd, bounds, view_cos_limit=0.5
        )
        have = jnp.zeros(m.max_pt + 2, bool).at[
            jnp.where(kf_obs_row >= 0, kf_obs_row, m.max_pt + 1)
        ].set(True, mode="drop")
        vis &= cand_ok & ok & ~have[cand_c]
        ratio = jnp.maximum(maxd / 1.2, 1e-6) / jnp.maximum(dist, 1e-6)
        lvl = jnp.clip(
            jnp.ceil(jnp.log(ratio)
                     / jnp.log(config.orb.scale_factor)).astype(jnp.int32),
            0, n_levels - 1,
        )
        rad = 4.0 * scale_factors[lvl]  # reference Fuse(Scw) radius 4
        mm = mcore.mutual_best_match(
            desc, kf_desc,
            mcore.window_mask(uv, kf_xy, rad)
            & mcore.level_mask(lvl, kf_level, -1, 1),
            vis, kf_fvalid, max_dist=mcore.TH_LOW, ratio=None,
        )
        t = jnp.where(mm.valid, mm.idx, m.feat_cap + 1)
        return kf_obs_row.at[t].set(
            jnp.where(mm.valid, cand_c, NO_POINT).astype(jnp.int32),
            mode="drop",
        )

    new_rows = jax.vmap(fuse_one)(
        m.kf_Tcw[grp_idx], m.kf_xy[grp_idx], m.kf_level[grp_idx],
        m.kf_desc[grp_idx], m.kf_feat_valid[grp_idx], m.kf_obs_pt[grp_idx],
        grp_ok,
    )
    kf_obs_pt = m.kf_obs_pt.at[
        jnp.where(grp_ok, grp_idx, m.max_kf + 1)
    ].set(new_rows, mode="drop")
    return m._replace(kf_obs_pt=kf_obs_pt)


def essential_tree_edges(m: MapState):
    """Essential-graph backbone edges: the covisibility SPANNING TREE
    (reference OptimizeEssentialGraph spanning-tree edges,
    src/Optimizer.cc:1100-1265; tree maintained at KeyFrame.cc:498-556) —
    each live keyframe connects to its tree parent.  A parent whose seq no
    longer resolves to a live slot falls back to the keyframe's temporal
    predecessor so the graph stays connected — on a sequential video the two
    coincide; on branching/revisiting trajectories the tree routes
    corrections through covisibility instead of raw recording order.
    Returns (edge_i [K-1], edge_j [K-1], valid [K-1]) slot indices."""
    order = jnp.argsort(jnp.where(m.kf_valid, m.kf_seq, jnp.int32(1 << 30)))
    seq_i = order[1:]
    prev_j = order[:-1]

    def tree_parent_slot(i):
        pseq = m.kf_tree_parent_seq[i]
        slot = jnp.argmax(m.kf_seq == pseq).astype(jnp.int32)
        ok = (m.kf_seq[slot] == pseq) & m.kf_valid[slot] & (pseq >= 0) \
            & (slot != i)
        return slot, ok

    tp_slot, tp_ok = jax.vmap(tree_parent_slot)(seq_i)
    seq_j = jnp.where(tp_ok, tp_slot, prev_j)
    seq_valid = m.kf_valid[seq_i] & m.kf_valid[seq_j]
    return seq_i, seq_j, seq_valid


def correct_loop(
    config: SlamConfig, m: MapState, kf_id: jnp.ndarray, det: LoopDetection
) -> MapState:
    """Essential-graph correction + map-point remapping (CorrectLoop)."""
    K = m.max_kf
    S_old = jax.vmap(sim3.from_se3)(m.kf_Tcw)

    # persist the verified loop edge FIRST (KeyFrame::AddLoopEdge analogue)
    # so this and every future essential graph includes it
    L = m.loop_seq_i.shape[0]
    l_slot = m.n_loop % L
    m = m._replace(
        loop_seq_i=m.loop_seq_i.at[l_slot].set(m.kf_seq[kf_id]),
        loop_seq_j=m.loop_seq_j.at[l_slot].set(m.kf_seq[det.cand_kf]),
        loop_meas=m.loop_meas.at[l_slot].set(det.S_cur_cand),
        n_loop=m.n_loop + 1,
    )

    # corrected pose of the current keyframe: Scw_corrected = S_cur_cand . Scand_w
    S_corr_cur = sim3.compose(det.S_cur_cand, S_old[det.cand_kf])
    S_init = S_old.at[kf_id].set(S_corr_cur)

    # ---- edges ----
    idx = jnp.arange(K, dtype=jnp.int32)
    seq_i, seq_j, seq_valid = essential_tree_edges(m)
    seq_meas = jax.vmap(
        lambda i, j: sim3.compose(S_old[i], sim3.inverse(S_old[j]))
    )(seq_i, seq_j)

    # strong covisibility edges (reference adds covisibility edges with
    # weight >= minFeat=100, Optimizer.cc:1183-1230): top-3 covisible
    # partners per keyframe above a shared-observation threshold — one
    # cached-incidence [K, K] matmul instead of K gather passes
    C_all = ms.covisibility_matrix_cached(m)

    def covis_edges(k):
        counts = C_all[k].at[k].set(0)
        topv, topi = jax.lax.top_k(counts, 3)
        ok = (topv >= 30) & m.kf_valid[k] & (topi != k)
        return topi, ok

    cov_j, cov_ok = jax.vmap(covis_edges)(idx)  # [K, 3]
    cov_i = jnp.repeat(idx, 3)
    cov_j = cov_j.reshape(-1)
    cov_ok = cov_ok.reshape(-1)
    cov_meas = jax.vmap(
        lambda i, j: sim3.compose(S_old[i], sim3.inverse(S_old[j]))
    )(cov_i, cov_j)

    # ALL persisted loop edges (incl. the one just added): endpoints stored
    # as seqs, resolved to live slots; edges whose endpoint was culled drop
    def resolve_seq(seq):
        slot = jnp.argmax(m.kf_seq == seq).astype(jnp.int32)
        ok = (m.kf_seq[slot] == seq) & m.kf_valid[slot] & (seq >= 0)
        return slot, ok

    loop_i, li_ok = jax.vmap(resolve_seq)(m.loop_seq_i)
    loop_j, lj_ok = jax.vmap(resolve_seq)(m.loop_seq_j)
    loop_valid = li_ok & lj_ok
    loop_meas = m.loop_meas

    edge_i = jnp.concatenate([seq_i, cov_i, loop_i])
    edge_j = jnp.concatenate([seq_j, cov_j, loop_j])
    edge_meas = jnp.concatenate([seq_meas, cov_meas, loop_meas])
    edge_valid = jnp.concatenate([seq_valid, cov_ok, loop_valid])

    fixed = ~m.kf_valid | (idx == det.cand_kf)
    res = optimize_pose_graph(
        S_init, edge_i, edge_j, edge_meas, edge_valid, fixed, n_iters=20
    )
    S_new = res.kf_sim3

    # ---- recover SE3 poses and remap points (Optimizer.cc:1297-1362) ----
    kf_Tcw_new = jax.vmap(sim3.to_se3)(S_new)
    kf_Tcw_new = jnp.where(m.kf_valid[:, None, None], kf_Tcw_new, m.kf_Tcw)

    ref = jnp.clip(m.pt_ref_kf, 0, K - 1)
    # p' = S_new_ref^-1 ( S_old_ref (p) )
    p_in_ref = jax.vmap(sim3.apply_point)(S_old[ref], m.pt_pos)
    p_new = jax.vmap(sim3.apply_point)(jax.vmap(sim3.inverse)(S_new[ref]), p_in_ref)
    pt_pos_new = jnp.where(m.pt_valid[:, None], p_new, m.pt_pos)

    m = m._replace(kf_Tcw=kf_Tcw_new, pt_pos=pt_pos_new)

    # ---- fuse LOOP-GROUP points into the current keyframe's covisibility
    # group now that poses agree (reference SearchAndFuse, LoopClosing.cc:
    # 809-860 projects mvpLoopMapPoints into every corrected keyframe with
    # Fuse radius 4).  Selection must come from the loop group, NOT from
    # covisibility — the two loop ends share no observations yet, so a
    # covisibility-driven fuse would stitch nothing and the subsequent GBA
    # would pull the map straight back to the drifted configuration.
    m = _search_and_fuse_loop(config, m, kf_id, det)

    # Global bundle adjustment is NOT part of this program: the reference
    # runs GBA in a detached 5th thread with abort semantics
    # (RunGlobalBundleAdjustment, LoopClosing.cc:880, spawn at :797) so a
    # loop correction never stalls tracking for the GBA duration.  Our
    # analogue: LoopCloser dispatches global_bundle_adjust on a SNAPSHOT of
    # this corrected map and merges the result back later (merge_gba), while
    # the chunk stream keeps tracking on the pose-graph-corrected map.

    # fuse rebound observations above: refresh the cached incidence/counts
    return ms.rebuild_incidence(m)


def _needs_sharded_gba(config: SlamConfig, m: MapState) -> bool:
    return (config.tracking.enable_loop_gba
            and m.max_kf * m.max_pt > 4 * 1024 * 1024)


def global_bundle_adjust(config: SlamConfig, m: MapState, anchor_kf):
    """Post-loop global BA (reference RunGlobalBundleAdjustment,
    LoopClosing.cc:880: 10 iterations after every loop closure).  Jittable;
    runs on a SNAPSHOT of the corrected map so the stream keeps tracking
    while it executes.  Returns (kf_Tcw, pt_pos) arrays for merge_gba."""
    from ..ops.optim.bundle_adjust import bundle_adjust

    obs_uvr = jnp.concatenate([m.kf_xy, m.kf_uright[..., None]], axis=-1)
    sigma2 = jnp.asarray(config.orb.sigma2())[m.kf_level]
    kf_free = m.kf_valid & (jnp.arange(m.max_kf) != anchor_kf) & (
        jnp.arange(m.max_kf) != 0
    )
    ba = bundle_adjust(
        config.camera, m.kf_Tcw, m.pt_pos, m.kf_obs_pt, obs_uvr, sigma2,
        m.kf_feat_valid & m.kf_valid[:, None], kf_free, m.pt_valid,
        n_iters_pre=4, n_iters_post=6, ur_weight=config.ur_weight,
    )
    return ba.kf_Tcw, ba.pt_pos


# GBA iteration schedule for the SLICED async path: huber-weighted GN first
# (the reference's stage 1, Optimizer.cc:863), then plain GN on the
# chi2-gated observation set (stage 2, :916) — same 4+6 budget as the
# one-shot path, but each slice is its own device dispatch, so queued chunk
# scans interleave between iterations instead of stalling ~1-2s behind one
# monolithic GBA program.  This is the single-device analogue of the
# reference's detached GBA thread sharing cores with Tracking.
GBA_SLICES = [True] * 4 + [False] * 6


def global_bundle_adjust_slice(
    config: SlamConfig, m: MapState, kf_Tcw, pt_pos, anchor_kf,
    huber: bool,
):
    """ONE Gauss-Newton iteration of the post-loop GBA, threading the
    evolving (poses, points) state through repeated calls against the fixed
    observation snapshot `m`.  huber=True slices weight residuals robustly
    (stage 1); huber=False slices re-gate outliers by chi2 from the current
    state then iterate plainly (stage 2)."""
    from ..ops.optim.bundle_adjust import bundle_adjust

    obs_uvr = jnp.concatenate([m.kf_xy, m.kf_uright[..., None]], axis=-1)
    sigma2 = jnp.asarray(config.orb.sigma2())[m.kf_level]
    kf_free = m.kf_valid & (jnp.arange(m.max_kf) != anchor_kf) & (
        jnp.arange(m.max_kf) != 0
    )
    ba = bundle_adjust(
        config.camera, kf_Tcw, pt_pos, m.kf_obs_pt, obs_uvr, sigma2,
        m.kf_feat_valid & m.kf_valid[:, None], kf_free, m.pt_valid,
        n_iters_pre=1 if huber else 0,
        n_iters_post=0 if huber else 1,
        ur_weight=config.ur_weight,
    )
    return ba.kf_Tcw, ba.pt_pos


def run_sharded_gba(config: SlamConfig, m: MapState, anchor_kf):
    """Sharded-Schur variant of global_bundle_adjust for maps too big for
    the dense assembly — the reference never skips GBA (LoopClosing.cc:880).
    All available devices (fine on one).  Returns (kf_Tcw, pt_pos)."""
    from ..parallel.distributed_ba import distributed_bundle_adjust
    from ..parallel.mesh import MeshSpec, make_mesh

    n_dev = len(jax.devices())
    P = m.pt_pos.shape[0]
    while n_dev > 1 and P % n_dev:
        n_dev -= 1
    mesh = make_mesh(MeshSpec(n_map=1, n_blk=n_dev))
    obs_uvr = jnp.concatenate([m.kf_xy, m.kf_uright[..., None]], axis=-1)
    sigma2 = jnp.asarray(config.orb.sigma2())[m.kf_level]
    kf_free = m.kf_valid & (jnp.arange(m.max_kf) != int(anchor_kf)) & (
        jnp.arange(m.max_kf) != 0)
    add = lambda x: jax.tree.map(lambda a: a[None], x)
    res = distributed_bundle_adjust(
        mesh, config.camera, add(m.kf_Tcw), add(m.pt_pos), add(m.kf_obs_pt),
        add(obs_uvr), add(sigma2),
        add(m.kf_feat_valid & m.kf_valid[:, None] & (m.kf_obs_pt >= 0)),
        add(kf_free), add(m.pt_valid), n_iters=10,
        ur_weight=config.ur_weight,
    )
    return res.kf_Tcw[0], res.pt_pos[0]


def merge_gba(
    m: MapState,
    snap_kf_seq: jnp.ndarray,    # [K] kf seq numbers at GBA launch
    snap_pt_birth: jnp.ndarray,  # [P] point birth stamps at GBA launch
    gba_kf_Tcw: jnp.ndarray,     # [K, 4, 4] GBA result (snapshot slot space)
    gba_pt_pos: jnp.ndarray,     # [P, 3]
) -> MapState:
    """Fold an asynchronously-computed GBA result into the LIVE map.

    The reference's GBA thread does exactly this write-back under the map
    mutex (RunGlobalBundleAdjustment, LoopClosing.cc:897-1010): keyframes
    that were IN the GBA take their optimized poses; keyframes created while
    GBA ran are corrected through the spanning tree
    (T_child_new = T_child * T_parent^-1 * T_parent_new, applied root-down);
    map points in the GBA take their optimized positions, newer points are
    remapped through their reference keyframe's correction.

    Slot reuse during GBA is guarded by SEQ (keyframes) / birth stamps
    (points): a slot rebound to different content since the snapshot simply
    does not match and is treated as new."""
    K = m.max_kf

    def find_snap(seq):
        j = jnp.argmax(snap_kf_seq == seq).astype(jnp.int32)
        ok = (snap_kf_seq[j] == seq) & (seq >= 0)
        return j, ok

    j_of, in_snap = jax.vmap(find_snap)(m.kf_seq)
    in_snap &= m.kf_valid
    T_live = m.kf_Tcw
    T_target = jnp.where(in_snap[:, None, None], gba_kf_Tcw[j_of], T_live)

    # keyframes created during GBA: parent-chain correction, processed in
    # increasing seq order (the spanning tree's parent-strictly-older
    # invariant makes one ordered pass sufficient, like the reference's
    # root-down list walk)
    order = jnp.argsort(jnp.where(m.kf_valid, m.kf_seq, jnp.int32(1 << 30)))

    def body(T_new, slot):
        pseq = m.kf_tree_parent_seq[slot]
        pslot = jnp.argmax(m.kf_seq == pseq).astype(jnp.int32)
        p_ok = (m.kf_seq[pslot] == pseq) & m.kf_valid[pslot] & (pseq >= 0)
        T_corr = T_live[slot] @ se3.inverse(T_live[pslot]) @ T_new[pslot]
        need = m.kf_valid[slot] & ~in_snap[slot] & p_ok
        T_new = T_new.at[slot].set(jnp.where(need, T_corr, T_new[slot]))
        return T_new, None

    T_new, _ = jax.lax.scan(body, T_target, order)

    # points: GBA result where the slot still holds the same point, else
    # remap through the reference keyframe's correction (LoopClosing.cc:
    # 975-1007: p' = T_new_ref^-1 (T_old_ref p))
    pt_in_snap = (snap_pt_birth == m.pt_birth) & m.pt_valid
    ref = jnp.clip(m.pt_ref_kf, 0, K - 1)
    M_ref = jax.vmap(lambda Tn, Tl: se3.inverse(Tn) @ Tl)(
        T_new[ref], T_live[ref])
    p_corr = jnp.einsum("pij,pj->pi", M_ref[:, :3, :3], m.pt_pos) \
        + M_ref[:, :3, 3]
    pt_pos_new = jnp.where(
        pt_in_snap[:, None], gba_pt_pos,
        jnp.where(m.pt_valid[:, None], p_corr, m.pt_pos))
    return m._replace(kf_Tcw=T_new, pt_pos=pt_pos_new)


class LoopCloser:
    def __init__(self, config: SlamConfig):
        self.config = config
        self.enabled = config.vocab is not None
        self.last_loop_kf = -999
        self._kf_counter = 0
        self.n_big_changes = 0   # reference Map::InformNewBigChange (Map.cc:111)
        # covisibility-consistency chaining state: list of (group mask,
        # chain length) from previous keyframes' BOW-STAGE detections
        # (reference mvConsistentGroups chains BEFORE the Sim3 gate,
        # LoopClosing.cc:229-305)
        self._consistent_groups: list = []
        # detections dispatched but not yet resolved (see dispatch_group)
        self._pending_dets: list = []
        self._key = jax.random.PRNGKey(7)
        # vmapped multi-keyframe detection batch width: keyframes created in
        # one batched chunk-group detect in ONE device call + ONE fetch (on
        # a remote-attached TPU every fetch stalls the stream)
        self.MAX_DETECT = 4
        # detection groups allowed to queue before the oldest is consumed
        # blocking (see resolve: stale corrections are worse than a small
        # sync — the older a Sim3 measurement, the further the map has
        # drifted since, and the correction injects that delta as error)
        self.MAX_PENDING_DETS = 1
        # corrections older than this many keyframes are discarded at fire
        # time (their Sim3 no longer describes the live map)
        self.STALE_DETECTION_KFS = 16
        # group detections are computed against ONE pre-correction map
        # snapshot; after a mid-group correction fires, the remaining
        # detections are stale and must be discarded — the inner COOLDOWN
        # check does that only while MAX_DETECT < COOLDOWN holds
        assert self.MAX_DETECT < COOLDOWN
        # In-flight asynchronous global BA (reference runs GBA in a detached
        # 5th thread, LoopClosing.cc:797,880): after a correction fires, GBA
        # is dispatched on a snapshot and merged back via merge_gba when its
        # result is ready; a newer correction ABORTS (discards) the stale
        # in-flight GBA — the mbStopGBA analogue (LoopClosing.cc:586-593).
        self._pending_gba = None
        # wall-clock of the last correction's synchronous host-side cost and
        # its GBA in-flight span (for the bench stall record)
        self.last_gba_info: dict = {}
        # SLAM_LOOP_DEBUG=1: record per-detection gate values (found,
        # inliers, proj count, chain length) for harness diagnosis
        import os as _os

        self.debug = _os.environ.get("SLAM_LOOP_DEBUG") == "1"
        self.debug_log: list = []
        if self.enabled:
            self._jit_detect = jax.jit(functools.partial(detect_and_verify, config))
            self._jit_detect_many = jax.jit(jax.vmap(
                functools.partial(detect_and_verify, config),
                in_axes=(None, 0, 0)))
            self._jit_correct = jax.jit(
                functools.partial(correct_loop, config), donate_argnums=0
            )
            # sliced GBA: one GN iteration per dispatch (huber / plain
            # variants), threading (poses, points) through donated buffers
            self._jit_gba_slice = {
                h: jax.jit(functools.partial(global_bundle_adjust_slice,
                                             config, huber=h),
                           donate_argnums=(1, 2))
                for h in (True, False)
            }
            self._jit_merge = jax.jit(merge_gba, donate_argnums=0)

    def warmup(self, m: MapState) -> None:
        """Pre-compile the streaming detection + correction programs against
        a map of matching shapes, so the first real loop detection does not
        stall the chunk stream for the compile time (the analogue of the
        reference's seconds-long ORBvoc load at startup, System.cc:77-89).
        Runs one detect/correct on a throwaway copy; results are discarded."""
        if not self.enabled:
            return
        import numpy as np

        key = jax.random.PRNGKey(0)
        subs = jax.random.split(key, self.MAX_DETECT)
        slots = jnp.zeros(self.MAX_DETECT, jnp.int32)
        dets = self._jit_detect_many(m, slots, subs)
        # ... and the width-1 signature dispatch_group uses for single-KF
        # groups (its first mid-stream compile measured a 10s stall)
        self._jit_detect_many(m, slots[:1], subs[:1])
        det0 = jax.tree.map(lambda x: x[0], dets)
        scratch = jax.tree.map(jnp.copy, m)
        out = self._jit_correct(scratch, jnp.int32(0), det0)
        # pre-compile the async-GBA programs too (both slice variants + the
        # merge): a mid-stream compile when the first loop fires would stall
        # the pipeline for seconds
        if self.config.tracking.enable_loop_gba \
                and not _needs_sharded_gba(self.config, out):
            snap = jax.tree.map(jnp.copy, out)
            gba_T, gba_p = jnp.copy(out.kf_Tcw), jnp.copy(out.pt_pos)
            for huber in (True, False):
                gba_T, gba_p = self._jit_gba_slice[huber](
                    snap, gba_T, gba_p, jnp.int32(0))
            merged = self._jit_merge(out, jnp.copy(out.kf_seq),
                                     jnp.copy(out.pt_birth), gba_T, gba_p)
            jax.block_until_ready(merged.kf_Tcw)
        else:
            jax.block_until_ready(out.kf_Tcw)

    def process(self, m: MapState, kf_id) -> MapState:
        return self.process_group(m, [int(kf_id)])

    def process_group(self, m: MapState, slots: list) -> MapState:
        """Synchronous variant: dispatch + blocking resolve (used by the
        per-frame API, refine_maps, and tests; the streaming path calls
        dispatch_group / resolve separately so detection never stalls the
        chunk stream — reference analogue: the LoopClosing THREAD costs
        Tracking nothing, src/LoopClosing.cc:71-130)."""
        self.dispatch_group(m, slots)
        m, _ = self.resolve(m, block=True)
        return m

    def dispatch_group(self, m: MapState, slots: list,
                       rebase=None) -> None:
        """Dispatch loop detection for a group of just-created keyframes:
        ONE vmapped detection call per MAX_DETECT part, with the small
        host-side decision arrays copied back ASYNCHRONOUSLY.  Nothing
        blocks; results are consumed later by resolve()."""
        if not self.enabled or not slots:
            return
        import numpy as np

        live = []
        for s in slots:
            self._kf_counter += 1
            if self._kf_counter - self.last_loop_kf >= COOLDOWN:
                live.append((self._kf_counter, int(s)))
        for start in range(0, len(live), self.MAX_DETECT):
            part = live[start : start + self.MAX_DETECT]
            # pad multi-KF parts to ONE static width so the streaming path
            # compiles a single detect signature (a mid-stream compile
            # stalls the pipeline for seconds); per-frame mode keeps the
            # width-1 signature and its PRNG stream
            D = self.MAX_DETECT if len(live) > 1 else 1
            slots_arr = np.zeros(D, np.int32)
            slots_arr[: len(part)] = [s for _, s in part]
            self._key, *subs = jax.random.split(self._key, D + 1)
            dets = self._jit_detect_many(m, jnp.asarray(slots_arr),
                                         jnp.stack(subs))
            small = (dets.found, dets.best_c, dets.groups, dets.group_ok,
                     dets.cand_kf)
            if self.debug:
                small = small + (dets.n_inliers, dets.n_proj)
            for x in small:
                x.copy_to_host_async()
            self._pending_dets.append((part, dets, small, rebase))

    def pending(self) -> int:
        return len(self._pending_dets) + (self._pending_gba is not None)

    def _dispatch_gba(self, m: MapState, anchor_kf: int) -> None:
        """Launch global BA on a snapshot of the (pose-graph-corrected) map;
        the stream keeps tracking on `m` while it runs.  The reference's
        detached GBA thread (LoopClosing.cc:797).  The dense path runs
        SLICED — one GN iteration per resolve() call — so each dispatch is
        small and queued chunk scans interleave on the device instead of
        stalling behind one monolithic GBA program (~1-2s at 96KF/16k pts)."""
        import time as _t

        if not self.config.tracking.enable_loop_gba:
            return
        g = dict(
            snap_seq=jnp.copy(m.kf_seq), snap_birth=jnp.copy(m.pt_birth),
            t0=_t.perf_counter(), anchor=int(anchor_kf))
        if _needs_sharded_gba(self.config, m):
            g["path"] = "sharded"
            g["gba_T"], g["gba_p"] = run_sharded_gba(self.config, m, anchor_kf)
            g["phase"] = len(GBA_SLICES)
        else:
            g["path"] = "dense"
            g["snap"] = jax.tree.map(jnp.copy, m)
            g["gba_T"] = jnp.copy(m.kf_Tcw)
            g["gba_p"] = jnp.copy(m.pt_pos)
            g["phase"] = 0
        self._pending_gba = g

    def _advance_gba(self, block: bool = False) -> None:
        """Advance the sliced GBA by one iteration (all remaining when
        block=True)."""
        g = self._pending_gba
        if g is None or g["phase"] >= len(GBA_SLICES):
            return
        while g["phase"] < len(GBA_SLICES):
            huber = GBA_SLICES[g["phase"]]
            g["gba_T"], g["gba_p"] = self._jit_gba_slice[huber](
                g["snap"], g["gba_T"], g["gba_p"], jnp.int32(g["anchor"]))
            g["phase"] += 1
            if not block:
                break
        if g["phase"] >= len(GBA_SLICES):
            g.pop("snap", None)   # release the observation snapshot

    def _merge_pending_gba(self, m: MapState, fired: list, block: bool):
        """Fold a finished in-flight GBA back into the live map (reference
        write-back under the map mutex, LoopClosing.cc:897-1010)."""
        import time as _t

        import numpy as np

        g = self._pending_gba
        if g is None:
            return m
        if block:
            self._advance_gba(block=True)
        if g["phase"] < len(GBA_SLICES):
            return m
        if not block and not (g["gba_T"].is_ready() and g["gba_p"].is_ready()):
            return m
        self._pending_gba = None
        # carry re-base payload: the newest keyframe's pose BEFORE the merge
        # (the live tracking state hangs off it; System re-bases by its delta)
        slot = int(ms.latest_kf(m))
        pose_before = np.asarray(m.kf_Tcw[slot])
        m = self._jit_merge(m, g["snap_seq"], g["snap_birth"],
                            g["gba_T"], g["gba_p"])
        self.last_gba_info = {
            "gba_path": g["path"],
            "gba_inflight_ms": round((_t.perf_counter() - g["t0"]) * 1e3, 1),
        }
        fired.append((slot, pose_before))
        return m

    def resolve(self, m: MapState, block: bool = False):
        """Consume finished detections and any finished in-flight GBA (all
        of them when block=True): run covisibility-consistency chaining on
        host, fire corrections, dispatch + merge asynchronous GBA.
        Returns (map, fired) where fired lists (kf_slot, kf_Tcw_before)
        re-base payloads for carry correction (None entries possible for
        corrections dispatched without one)."""
        import numpy as np

        fired = []
        if not self.enabled:
            return m, fired
        self._advance_gba()   # one sliced-GBA iteration per resolve call
        m = self._merge_pending_gba(m, fired, block=False)
        th = self.config.tracking.loop_consistency_th
        while self._pending_dets:
            part, dets, small, rebase = self._pending_dets[0]
            # Bounded backlog: on the remote tunnel is_ready() may not turn
            # true without a sync, so a pure poll lets detections pile up
            # and resolve only at the final forced drain — where firing a
            # backlog of STALE Sim3 measurements (computed against maps many
            # keyframes ago) bends the since-drifted map catastrophically
            # (observed: six end-of-run corrections took a 1.3m-ATE run to
            # 17.9m).  Consume the oldest group blocking once more than
            # MAX_PENDING_DETS are queued; the fetches are tiny.
            ready = all(x.is_ready() for x in small)
            if not block and not ready \
                    and len(self._pending_dets) <= self.MAX_PENDING_DETS:
                break
            self._pending_dets.pop(0)
            found_a, best_a, groups_a, gok_a, cand_a = (
                np.asarray(x) for x in small[:5])
            dbg = ([np.asarray(x) for x in small[5:]] if self.debug else None)
            for i, (counter, s) in enumerate(part):
                if counter - self.last_loop_kf < COOLDOWN:
                    continue  # an earlier keyframe in this group just fired
                groups = groups_a[i]
                g_ok = gok_a[i]
                new_groups = []
                chains = np.zeros(len(g_ok), np.int32)
                for c in range(len(g_ok)):
                    if not g_ok[c]:
                        continue
                    chain = 1 + max(
                        (n for g, n in self._consistent_groups
                         if bool((g & groups[c]).any())), default=0,
                    )
                    chains[c] = chain
                    new_groups.append((groups[c], chain))
                self._consistent_groups = new_groups
                if self.debug:
                    self.debug_log.append({
                        "kf_counter": counter,
                        "lag": self._kf_counter - counter,
                        "found": bool(found_a[i]),
                        "chain": int(chains[int(best_a[i])]),
                        "cand": int(cand_a[i]),
                        "n_groups": int(np.sum(gok_a[i])),
                        "n_inliers": int(dbg[0][i]) if dbg else -1,
                        "n_proj": int(dbg[1][i]) if dbg else -1,
                    })
                if bool(found_a[i]) and chains[int(best_a[i])] >= th:
                    # staleness guard: a detection's Sim3 was measured
                    # against the map as of its dispatch; if many keyframes
                    # have landed since (end-of-run force drain), applying
                    # it would bend a map that has already moved on
                    if self._kf_counter - counter > self.STALE_DETECTION_KFS:
                        continue
                    # a NEWER loop correction aborts any stale in-flight GBA
                    # (reference mbStopGBA, LoopClosing.cc:586-593) — its
                    # result would overwrite the new correction
                    self._pending_gba = None
                    det_i = jax.tree.map(lambda x: x[i], dets)
                    m = self._jit_correct(m, jnp.int32(s), det_i)
                    self._dispatch_gba(m, int(cand_a[i]))
                    self.last_loop_kf = counter
                    self.n_big_changes += 1
                    self._consistent_groups = []
                    fired.append(rebase)
        if block:
            m = self._merge_pending_gba(m, fired, block=True)
        return m, fired
