"""Tracking engine: per-frame pose estimation against the map.

TPU-native counterpart of the reference Tracking thread
(src/Tracking.cc:419-779 Track() and its helpers).  The NOT_INITIALIZED /
OK / LOST state machine stays on the host (models/system.py); everything here
is jit-compiled fixed-shape compute:

  * track_motion      — TrackWithMotionModel (:1353): project last frame's
                        points with a constant-velocity prior, window-match,
                        motion-only BA.
  * track_local_map   — TrackLocalMap (:1443): covisibility-derived local
                        point set, frustum filter, scale-aware projection
                        match, second motion-only BA.
  * initialize_depth  — StereoInitialization (:788): first keyframe + points
                        from stereo/RGB-D depth.
  * create_keyframe   — CreateNewKeyFrame (:1649): keyframe insertion + new
                        close points (depth-sorted, <=100).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import se3
from ..ops.camera import backproject, in_frustum, project
from ..ops.matching import core as mcore
from ..ops.matching.hamming import INVALID_DIST
from ..ops.optim.pose_opt import pose_optimize
from . import map_state as ms
from .config import SlamConfig
from .frame import FrameData, backproject_frame
from .map_state import NO_POINT, MapState


class TrackResult(NamedTuple):
    Tcw: jnp.ndarray        # [4, 4]
    obs_pt: jnp.ndarray     # [N] matched map-point id per feature (-1)
    n_matches: jnp.ndarray  # scalar int32 (pre-optimization)
    n_inliers: jnp.ndarray  # scalar int32 (post-optimization)


def _observations(frame: FrameData) -> jnp.ndarray:
    """[N, 3] (u, v, u_right) observation rows for the pose optimizer."""
    return jnp.concatenate([frame.xy, frame.u_right[:, None]], axis=-1)


def _scatter_matches(n_feat: int, match: mcore.MatchResult, pt_ids: jnp.ndarray) -> jnp.ndarray:
    """Invert a query->feature match into per-feature point ids [N]."""
    tgt = jnp.where(match.valid, match.idx, n_feat + 1)
    return (
        jnp.full(n_feat, NO_POINT, jnp.int32)
        .at[tgt]
        .set(jnp.where(match.valid, pt_ids, NO_POINT), mode="drop")
    )


def _optimize_with_matches(config, m, Tcw0, frame, obs_pt):
    """Pose-optimize the frame against its matched points; returns result +
    inlier-filtered obs_pt."""
    sigma2 = jnp.asarray(config.orb.sigma2())
    pts = m.pt_pos[jnp.clip(obs_pt, 0, m.max_pt - 1)]
    valid = (obs_pt >= 0) & frame.valid & m.pt_valid[jnp.clip(obs_pt, 0, m.max_pt - 1)]
    res = pose_optimize(
        config.camera, Tcw0, pts, _observations(frame), sigma2[frame.level], valid,
        ur_weight=config.ur_weight,
    )
    obs_out = jnp.where(res.inliers, obs_pt, NO_POINT)
    return res, obs_out


def track_motion(
    config: SlamConfig,
    m: MapState,
    frame: FrameData,
    Tcw_last: jnp.ndarray,
    velocity: jnp.ndarray,
    last_frame: FrameData,
    last_obs_pt: jnp.ndarray,
    search_radius: jnp.ndarray,
    *,
    last_obs_birth: jnp.ndarray | None = None,
) -> TrackResult:
    """Constant-velocity tracking (reference Tracking::TrackWithMotionModel
    src/Tracking.cc:1353-1440).

    last_obs_birth: pt_birth stamps captured with last_obs_pt — carried ids
    whose slot was culled and reallocated to a DIFFERENT point since capture
    are dropped (CheckReplacedInLastFrame analogue, reference
    src/Tracking.cc:1152; MapPoint::Replace src/MapPoint.cc:244).  None
    skips the guard (profiling tools)."""
    cam = config.camera
    scale_factors = jnp.asarray(config.orb.scale_factors())
    Tcw_pred = velocity @ Tcw_last

    pt_ids = last_obs_pt
    pt_ok = (pt_ids >= 0) & m.pt_valid[jnp.clip(pt_ids, 0, m.max_pt - 1)]
    if last_obs_birth is not None:
        pt_ok &= m.pt_birth[jnp.clip(pt_ids, 0, m.max_pt - 1)] == last_obs_birth
    pts_w = m.pt_pos[jnp.clip(pt_ids, 0, m.max_pt - 1)]
    pc = pts_w @ Tcw_pred[:3, :3].T + Tcw_pred[:3, 3]
    uv, z = project(cam, pc)
    inb = (
        (z > 0)
        & (uv[:, 0] >= 0) & (uv[:, 0] < cam.width)
        & (uv[:, 1] >= 0) & (uv[:, 1] < cam.height)
    )
    pt_ok &= inb & last_frame.valid

    # window radius scaled by the feature's last octave (reference :1395)
    radius = search_radius * scale_factors[last_frame.level]
    wmask = mcore.window_mask(uv, frame.xy, radius)
    lmask = mcore.level_mask(last_frame.level, frame.level, -1, 1)
    # match by the map point's representative descriptor (reference
    # SearchByProjection uses pMP->GetDescriptor(), ORBmatcher.cc:1569+)
    desc_q = m.pt_desc[jnp.clip(pt_ids, 0, m.max_pt - 1)]
    match = mcore.mutual_best_match(
        desc_q, frame.desc, wmask & lmask,
        pt_ok, frame.valid, max_dist=mcore.TH_HIGH, ratio=None,
    )
    keep = mcore.rotation_consistency_mask(last_frame.angle, frame.angle, match)
    match = match._replace(valid=keep, idx=jnp.where(keep, match.idx, -1))

    obs_pt = _scatter_matches(frame.capacity, match, pt_ids)
    n_matches = jnp.sum(obs_pt >= 0).astype(jnp.int32)
    res, obs_out = _optimize_with_matches(config, m, Tcw_pred, frame, obs_pt)
    return TrackResult(res.Tcw, obs_out, n_matches, res.n_inliers)


class TrackResultVO(NamedTuple):
    """track_motion_loc result: TrackResult + the count of inliers bound to
    REAL map points (the reference's nmatchesMap, src/Tracking.cc:1401-1426,
    which drives the mbVO 'map support lost' flag)."""

    Tcw: jnp.ndarray
    obs_pt: jnp.ndarray
    n_matches: jnp.ndarray
    n_inliers: jnp.ndarray
    n_map_inliers: jnp.ndarray


def track_motion_loc(
    config: SlamConfig,
    m: MapState,
    frame: FrameData,
    Tcw_last: jnp.ndarray,
    velocity: jnp.ndarray,
    last_frame: FrameData,
    last_obs_pt: jnp.ndarray,
    search_radius: jnp.ndarray,
    *,
    last_obs_birth: jnp.ndarray | None = None,
) -> TrackResultVO:
    """Localization-mode motion tracking with temporal "visual odometry"
    points (reference Tracking::UpdateLastFrame src/Tracking.cc:1247-1350 +
    TrackWithMotionModel :1353-1430).

    The reference allocates temporary MapPoints from the last frame's close
    stereo/RGB-D depth every frame (all with depth < mThDepth, plus the 100
    closest) and deletes them after tracking (:670-716).  Here the same
    candidates are frame-local arrays — backprojected positions and
    descriptors of the LAST frame that never touch the map — so the
    reference's per-frame temporal-point cleanup is a no-op by construction,
    and pose optimization runs over the union of map matches and VO matches
    in one fixed-shape pass."""
    cam = config.camera
    scale_factors = jnp.asarray(config.orb.scale_factors())
    Tcw_pred = velocity @ Tcw_last

    pt_ids = last_obs_pt
    cl = jnp.clip(pt_ids, 0, m.max_pt - 1)
    map_ok = (pt_ids >= 0) & m.pt_valid[cl]
    if last_obs_birth is not None:  # slot-reuse guard (see track_motion)
        map_ok &= m.pt_birth[cl] == last_obs_birth

    # temporal VO candidates: depth-sorted close features of the LAST frame
    # without a live map point (reference Tracking.cc:1301-1345: every
    # depth < mThDepth point plus up to the 100 closest)
    depth_ok = last_frame.has_depth() & ~map_ok
    order = jnp.argsort(jnp.where(depth_ok, last_frame.depth, jnp.inf))
    rank = jnp.zeros(last_frame.capacity, jnp.int32).at[order].set(
        jnp.arange(last_frame.capacity, dtype=jnp.int32))
    vo_ok = depth_ok & ((last_frame.depth < config.th_depth) | (rank < 100))
    vo_pos = backproject_frame(cam, last_frame, Tcw_last)

    pts_w = jnp.where(map_ok[:, None], m.pt_pos[cl], vo_pos)
    desc_q = jnp.where(map_ok[:, None], m.pt_desc[cl], last_frame.desc)
    q_ok = map_ok | vo_ok

    pc = pts_w @ Tcw_pred[:3, :3].T + Tcw_pred[:3, 3]
    uv, z = project(cam, pc)
    inb = (
        (z > 0)
        & (uv[:, 0] >= 0) & (uv[:, 0] < cam.width)
        & (uv[:, 1] >= 0) & (uv[:, 1] < cam.height)
    )
    q_ok &= inb & last_frame.valid

    radius = search_radius * scale_factors[last_frame.level]
    wmask = mcore.window_mask(uv, frame.xy, radius)
    lmask = mcore.level_mask(last_frame.level, frame.level, -1, 1)
    match = mcore.mutual_best_match(
        desc_q, frame.desc, wmask & lmask,
        q_ok, frame.valid, max_dist=mcore.TH_HIGH, ratio=None,
    )
    keep = mcore.rotation_consistency_mask(last_frame.angle, frame.angle, match)
    match = match._replace(valid=keep, idx=jnp.where(keep, match.idx, -1))

    # scatter the SOURCE feature index so VO positions survive the
    # query->feature inversion (a VO match has no map-point id to scatter)
    src = _scatter_matches(
        frame.capacity, match,
        jnp.arange(last_frame.capacity, dtype=jnp.int32))
    has = src >= 0
    src_c = jnp.clip(src, 0, last_frame.capacity - 1)
    pos_per = pts_w[src_c]
    is_map = has & map_ok[src_c]
    obs_pt_map = jnp.where(is_map, pt_ids[src_c], NO_POINT)
    n_matches = jnp.sum(has).astype(jnp.int32)

    sigma2 = jnp.asarray(config.orb.sigma2())
    sel = has & frame.valid
    res = pose_optimize(
        cam, Tcw_pred, pos_per, _observations(frame), sigma2[frame.level],
        sel, ur_weight=config.ur_weight,
    )
    obs_out = jnp.where(res.inliers & is_map, obs_pt_map, NO_POINT)
    n_map_inl = jnp.sum(res.inliers & is_map).astype(jnp.int32)
    return TrackResultVO(res.Tcw, obs_out, n_matches, res.n_inliers, n_map_inl)


class LocalMapResult(NamedTuple):
    Tcw: jnp.ndarray
    obs_pt: jnp.ndarray
    n_inliers: jnp.ndarray
    local_kf_mask: jnp.ndarray   # [K] keyframes in the local window
    visible_pt: jnp.ndarray      # [C] point ids tested visible (-1 pad)
    found_pt_mask: jnp.ndarray   # [N] features whose point was found
    ref_kf: jnp.ndarray          # scalar int32: most-covisible keyframe
    ref_shared: jnp.ndarray      # scalar int32: #points shared with it now
    ref_total: jnp.ndarray       # scalar int32: its total map points


def track_local_map(
    config: SlamConfig,
    m: MapState,
    frame: FrameData,
    Tcw: jnp.ndarray,
    obs_pt: jnp.ndarray,
) -> LocalMapResult:
    """Local-map tracking (reference Tracking::TrackLocalMap + helpers,
    src/Tracking.cc:1443-2028)."""
    cam = config.camera
    caps = config.caps
    scale_factors = jnp.asarray(config.orb.scale_factors())
    n_levels = config.orb.n_levels

    # --- local keyframe set: sharers of current points, capped (:1895-1964).
    # One matvec against the cached incidence matrix (refreshed per mapping
    # phase) — the gather-based exact pass cost ~1.1ms/frame on v5e.
    counts = ms.covisibility_row_cached(m, obs_pt)
    k = min(caps.local_keyframes, m.max_kf)
    topk, topk_idx = jax.lax.top_k(counts, k)
    local_kf_mask = jnp.zeros(m.max_kf, bool).at[topk_idx].set(topk > 0)

    # --- local points = points of local KFs, minus already-matched (:1857) ---
    local_pt = ms.points_of_keyframes_cached(m, local_kf_mask)
    matched_ind = jnp.zeros(m.max_pt + 2, bool).at[
        jnp.where(obs_pt >= 0, obs_pt, m.max_pt + 1)
    ].set(True, mode="drop")
    local_pt &= ~matched_ind[: m.max_pt]

    C = caps.local_points
    cand = jnp.nonzero(local_pt, size=C, fill_value=m.max_pt)[0]
    cand_ok = cand < m.max_pt
    cand_c = jnp.clip(cand, 0, m.max_pt - 1)
    pos = m.pt_pos[cand_c]
    normal = m.pt_normal[cand_c]
    min_d = m.pt_min_dist[cand_c] * 0.8   # reference band (MapPoint.cc:523-533)
    max_d = m.pt_max_dist[cand_c] * 1.2

    bounds = (0.0, float(cam.width), 0.0, float(cam.height))
    vis, uv, dist, view_cos = in_frustum(
        cam, Tcw, pos, normal, min_d, max_d, bounds, view_cos_limit=0.5
    )
    vis &= cand_ok

    # scale prediction (reference MapPoint::PredictScale src/MapPoint.cc:551)
    ratio = jnp.maximum(max_d / 1.2, 1e-6) / jnp.maximum(dist, 1e-6)
    pred_level = jnp.clip(
        jnp.ceil(jnp.log(ratio) / jnp.log(config.orb.scale_factor)).astype(jnp.int32),
        0, n_levels - 1,
    )
    # radius by viewing angle (reference ORBmatcher.cc:178 RadiusByViewingCos)
    base_r = jnp.where(view_cos > 0.998, 2.5, 4.0)
    radius = base_r * scale_factors[pred_level] * config.tracking.local_search_radius

    unmatched = frame.valid & (obs_pt < 0)
    wmask = mcore.window_mask(uv, frame.xy, radius)
    lmask = mcore.level_mask(pred_level, frame.level, -1, 1)
    match = mcore.masked_best_match(
        m.pt_desc[cand_c], frame.desc, wmask & lmask,
        vis, unmatched, max_dist=mcore.TH_HIGH, ratio=0.8,
    )
    new_obs = _scatter_matches(frame.capacity, match, cand.astype(jnp.int32))
    obs_pt = jnp.where(obs_pt >= 0, obs_pt, new_obs)

    res, obs_out = _optimize_with_matches(config, m, Tcw, frame, obs_pt)

    # Reference-keyframe statistics for the keyframe decision
    # (reference Tracking::NeedNewKeyFrame src/Tracking.cc:1509-1648).
    # The reference picks mpReferenceKF from the PRE-search vote counts
    # (UpdateLocalKeyFrames runs at the top of TrackLocalMap,
    # Tracking.cc:1895-1964), so reuse `counts` instead of a second O(K*N)
    # covisibility pass; only the shared count with that one keyframe is
    # recomputed post-optimization (one [N] indicator gather).
    ref_kf = jnp.argmax(counts).astype(jnp.int32)
    out_ind = jnp.zeros(m.max_pt + 2, bool).at[
        jnp.where(obs_out >= 0, obs_out, m.max_pt + 1)
    ].set(True, mode="drop")
    ref_row = m.kf_obs_pt[ref_kf]
    ref_shared = jnp.sum(
        out_ind[jnp.clip(ref_row, 0, m.max_pt + 1)]
        & (ref_row >= 0) & m.kf_feat_valid[ref_kf]
    ).astype(jnp.int32)
    # nRefMatches: the reference counts the ref KF's points tracked by at
    # least minObs keyframes (KeyFrame::TrackedMapPoints, minObs = 2 while
    # the map is young else 3 — Tracking.cc:1545-1552).
    min_obs = jnp.where(m.n_kf <= 2, 2, 3)
    # cached counts (refreshed by every mapping phase) — saves a full
    # O(K*N) observation scatter per frame
    obs_count = m.pt_obs
    ref_ids = m.kf_obs_pt[ref_kf]
    ref_ok = (ref_ids >= 0) & m.kf_feat_valid[ref_kf]
    ref_total = jnp.sum(
        ref_ok & (obs_count[jnp.clip(ref_ids, 0, m.max_pt - 1)] >= min_obs)
    ).astype(jnp.int32)
    return LocalMapResult(
        Tcw=res.Tcw,
        obs_pt=obs_out,
        n_inliers=res.n_inliers,
        local_kf_mask=local_kf_mask,
        visible_pt=jnp.where(vis, cand, NO_POINT).astype(jnp.int32),
        found_pt_mask=obs_out >= 0,
        ref_kf=ref_kf,
        ref_shared=ref_shared,
        ref_total=ref_total,
    )


def _frame_bow(config: SlamConfig, frame: FrameData):
    """(sparse bow (ids, vals), words, nodes) for keyframe insertion; None
    triple without vocab.  Reference: KeyFrame::ComputeBoW
    (src/KeyFrame.cc:79-95); the sparse pair is our inverted-file entry
    (KeyFrameDatabase::add, src/KeyFrameDatabase.cc:53)."""
    if config.vocab is None:
        return None, None, None
    from ..ops import bow as bow_ops  # local import avoids cycle at module load

    words, nodes = bow_ops.transform(config.vocab, frame.desc, frame.valid)
    ids, vals = bow_ops.sparse_bow(config.vocab, words, config.bow_top)
    return (ids, vals), words, nodes


def initialize_depth(
    config: SlamConfig, m: MapState, frame: FrameData,
    frame_id: jnp.ndarray, timestamp: jnp.ndarray,
) -> tuple[MapState, jnp.ndarray]:
    """First stereo/RGB-D keyframe: map points for every feature with depth
    (reference Tracking::StereoInitialization src/Tracking.cc:788-884)."""
    Tcw = jnp.eye(4, dtype=jnp.float32)
    bow, words, nodes = _frame_bow(config, frame)
    m, kf_id = ms.insert_keyframe(
        m, frame, Tcw, frame_id, timestamp,
        jnp.full(frame.capacity, NO_POINT, jnp.int32),
        bow=bow, words=words, nodes=nodes,
    )
    pts_w = backproject_frame(config.camera, frame, Tcw)
    create = frame.has_depth()
    feat_idx = jnp.arange(frame.capacity, dtype=jnp.int32)
    m, _ = ms.add_points(m, config, kf_id, feat_idx, pts_w, create)
    return m, kf_id


def create_keyframe(
    config: SlamConfig,
    m: MapState,
    frame: FrameData,
    Tcw: jnp.ndarray,
    obs_pt: jnp.ndarray,
    frame_id: jnp.ndarray,
    timestamp: jnp.ndarray,
) -> tuple[MapState, jnp.ndarray]:
    """Insert a keyframe + new close points for unmatched depth features
    (reference Tracking::CreateNewKeyFrame src/Tracking.cc:1649-1758: sort by
    depth, create until 100 or depth > mThDepth)."""
    bow, words, nodes = _frame_bow(config, frame)
    m, kf_id = ms.insert_keyframe(m, frame, Tcw, frame_id, timestamp, obs_pt,
                                  bow=bow, words=words, nodes=nodes)
    candidate = (
        frame.has_depth() & (obs_pt < 0) & (frame.depth < config.th_depth)
    )
    order = jnp.argsort(jnp.where(candidate, frame.depth, jnp.inf))
    rank = jnp.zeros(frame.capacity, jnp.int32).at[order].set(
        jnp.arange(frame.capacity, dtype=jnp.int32)
    )
    create = candidate & (rank < config.tracking.max_new_points_per_kf)
    pts_w = backproject_frame(config.camera, frame, Tcw)
    feat_idx = jnp.arange(frame.capacity, dtype=jnp.int32)
    m, new_ids = ms.add_points(m, config, kf_id, feat_idx, pts_w, create)
    return m, kf_id
