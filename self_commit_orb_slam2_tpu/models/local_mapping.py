"""Local mapping phase: runs after each keyframe insertion.

TPU-native counterpart of the reference LocalMapping thread
(src/LocalMapping.cc:72-167 Run loop).  Implemented stages (reference call
order): observation binding + point refresh (ProcessNewKeyFrame :198),
map-point culling (:261).  Next milestones: epipolar triangulation (:312),
fuse (:628), local bundle adjustment (Optimizer.cc:629), keyframe culling
(:873).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import se3
from . import map_state as ms
from .config import SlamConfig
from .map_state import MapState


MAX_OBS_TABLE = 12  # observation descriptors per point entering the median


def refresh_observed_points(config: SlamConfig, m: MapState, kf_id: jnp.ndarray) -> MapState:
    """Update descriptor / normal / scale band of points observed by a new KF.

    Reference: LocalMapping::ProcessNewKeyFrame (src/LocalMapping.cc:198-259)
    calls MapPoint::ComputeDistinctiveDescriptors and UpdateNormalAndDepth for
    every point the new keyframe observes.  Exact semantics, batched:

      * representative descriptor = the observation whose MEDIAN Hamming
        distance to all other observations is minimal
        (MapPoint::ComputeDistinctiveDescriptors, src/MapPoint.cc:359-439),
        over up to MAX_OBS_TABLE observations gathered through a dense
        per-keyframe slot table (no pointer chasing: each target point is a
        feature row of the new keyframe, so point -> table row is the
        feature index);
      * normal = mean unit viewing ray over ALL observing keyframes
        (MapPoint::UpdateNormalAndDepth, src/MapPoint.cc:477-521), via one
        masked scatter-add over the [K, N] observation table;
      * distance band re-anchored on the new keyframe's observation.
    """
    from ..ops.matching.hamming import hamming_distance

    ids = m.kf_obs_pt[kf_id]
    ok = (ids >= 0) & m.kf_feat_valid[kf_id]
    idx = jnp.where(ok, ids, m.max_pt + 1)
    N = m.feat_cap

    # point id -> target row (= its feature index in the new keyframe)
    lut = jnp.full(m.max_pt + 2, -1, jnp.int32)
    lut = lut.at[jnp.where(ok, ids, m.max_pt + 1)].set(
        jnp.arange(N, dtype=jnp.int32), mode="drop")

    # [K, N] target row of every observation in the map (-1 = not a target)
    obs_ok = (m.kf_obs_pt >= 0) & m.kf_feat_valid & m.kf_valid[:, None]
    tgt = jnp.where(obs_ok, lut[jnp.clip(m.kf_obs_pt, 0, m.max_pt + 1)], -1)
    hit = tgt >= 0

    # ---- exact mean viewing normal over all observations ----
    centers = ms.keyframe_positions(m)                      # [K, 3]
    pos_t = m.pt_pos[jnp.clip(ids, 0, m.max_pt - 1)]        # [N, 3]
    rays = pos_t[tgt.clip(0, N - 1)] - centers[:, None, :]  # [K, N, 3]
    rays = rays / jnp.maximum(
        jnp.linalg.norm(rays, axis=-1, keepdims=True), 1e-9)
    t_flat = jnp.where(hit, tgt, N + 1)
    normal_sum = jnp.zeros((N, 3), jnp.float32).at[t_flat.reshape(-1)].add(
        jnp.where(hit[..., None], rays, 0.0).reshape(-1, 3), mode="drop")
    mean_normal = normal_sum / jnp.maximum(
        jnp.linalg.norm(normal_sum, axis=-1, keepdims=True), 1e-9)

    # ---- distinctive descriptor: min-median-Hamming over observations ----
    # slot of observation (k, target) = number of earlier keyframes (by slot
    # order) observing the same target; capped at MAX_OBS_TABLE
    O = MAX_OBS_TABLE
    ind = hit.astype(jnp.int32)                             # [K, N]
    slots = jnp.cumsum(ind, axis=0) - ind                   # exclusive prefix
    in_table = hit & (slots < O)
    flat_pos = jnp.where(in_table, tgt * O + slots, N * O + 1)
    table = jnp.zeros((N * O, 8), jnp.uint32).at[flat_pos.reshape(-1)].set(
        m.kf_desc.reshape(-1, 8), mode="drop").reshape(N, O, 8)
    filled = jnp.zeros(N * O, bool).at[flat_pos.reshape(-1)].set(
        True, mode="drop").reshape(N, O)
    n_obs = jnp.sum(filled, axis=1)                         # [N]

    dmat = hamming_distance(table[:, :, None, :], table[:, None, :, :])  # [N, O, O]
    big = jnp.int32(1 << 20)
    dmat = jnp.where(filled[:, None, :], dmat, big)
    dsorted = jnp.sort(dmat, axis=-1)                       # valid dists first
    med_idx = jnp.clip((n_obs - 1) // 2, 0, O - 1)          # MapPoint.cc:425
    medians = jnp.take_along_axis(
        dsorted, med_idx[:, None, None].repeat(O, axis=1), axis=-1)[..., 0]
    medians = jnp.where(filled, medians, big)
    best_obs = jnp.argmin(medians, axis=-1)                 # [N]
    best_desc = jnp.take_along_axis(
        table, best_obs[:, None, None].repeat(8, axis=2), axis=1)[:, 0]
    # fall back to the new keyframe's descriptor when the table is empty
    best_desc = jnp.where((n_obs > 0)[:, None], best_desc, m.kf_desc[kf_id])

    # ---- distance band anchored on the new observation ----
    cam_center = centers[kf_id]
    dist = jnp.linalg.norm(pos_t - cam_center, axis=-1)
    scale_factors = jnp.asarray(config.orb.scale_factors())
    level = m.kf_level[kf_id]
    max_dist = dist * scale_factors[level]
    min_dist = max_dist / scale_factors[config.orb.n_levels - 1]

    mode = dict(mode="drop")
    return m._replace(
        pt_desc=m.pt_desc.at[idx].set(best_desc, **mode),
        pt_normal=m.pt_normal.at[idx].set(mean_normal, **mode),
        pt_max_dist=m.pt_max_dist.at[idx].set(max_dist, **mode),
        pt_min_dist=m.pt_min_dist.at[idx].set(min_dist, **mode),
        pt_found=m.pt_found.at[idx].add(1, **mode),
        pt_visible=m.pt_visible.at[idx].add(1, **mode),
    )


def cull_points(config: SlamConfig, m: MapState, kf_id: jnp.ndarray) -> MapState:
    """Remove unreliable recent points (reference LocalMapping::MapPointCulling
    src/LocalMapping.cc:261-310): found-ratio < 0.25, or observed by too few
    keyframes a few keyframes after creation."""
    obs_count = m.pt_obs  # cached; maintained at insertion + phase ends
    found_ratio = m.pt_found.astype(jnp.float32) / jnp.maximum(
        m.pt_visible.astype(jnp.float32), 1.0
    )
    age = m.kf_seq[kf_id] - m.pt_first_kf  # in keyframes (seq numbers)
    bad = m.pt_valid & (
        (found_ratio < 0.25)
        | ((age >= 2) & (obs_count <= 2) & (m.pt_first_kf > 0))
    )
    # (points born with the first keyframe are exempt from the min-obs rule:
    # stereo init creates single-observation points by design)
    # Scrub observations of culled points: their slots are REUSED by the
    # free-list allocator, so a stale id in kf_obs_pt would alias the next
    # point born in that slot.
    bad_ind = jnp.zeros(m.max_pt + 2, bool).at[: m.max_pt].set(bad)
    stale = (m.kf_obs_pt >= 0) & bad_ind[jnp.clip(m.kf_obs_pt, 0, m.max_pt + 1)]
    return m._replace(
        pt_valid=m.pt_valid & ~bad,
        kf_obs_pt=jnp.where(stale, ms.NO_POINT, m.kf_obs_pt),
    )


def fuse_into_keyframe(config: SlamConfig, m: MapState, kf_id: jnp.ndarray,
                       counts: jnp.ndarray | None = None,
                       obs_count: jnp.ndarray | None = None) -> MapState:
    """Project neighbor keyframes' points into the new KF and bind matches.

    Reference: LocalMapping::SearchInNeighbors + ORBmatcher::Fuse
    (src/LocalMapping.cc:628-779, src/ORBmatcher.cc:1020-1177): points of the
    covisible neighborhood are projected into the keyframe; a projection that
    lands on a feature with a close descriptor either merges duplicate points
    or adds a missing observation.  v1 binds free features (the dominant
    effect: densifies the observation graph and stops duplicate creation);
    full duplicate merging (MapPoint::Replace) lands with the replace-
    forwarding pass.
    """
    from ..ops.camera import in_frustum
    from ..ops.matching import core as mcore

    cam = config.camera
    caps = config.caps
    scale_factors = jnp.asarray(config.orb.scale_factors())
    n_levels = config.orb.n_levels

    if counts is None:
        counts = ms.covisibility_row(m, m.kf_obs_pt[kf_id])
    counts = counts.at[kf_id].set(0)
    # nn = 10 stereo / 20 mono first-order + 5 second-order neighbors
    # (reference LocalMapping::SearchInNeighbors src/LocalMapping.cc:628-660)
    nn = min(20 if config.sensor == "mono" else 10, m.max_kf)
    topv1, topi1 = jax.lax.top_k(counts, nn)
    first_mask = jnp.zeros(m.max_kf, bool).at[topi1].set(topv1 > 0)
    # second order: keyframes sharing points with the first-order set
    # (cached incidence matvecs — was two O(K*N) gather passes)
    nb_pts = ms.points_of_keyframes_cached(m, first_mask)
    counts2 = ms.covisibility_of_points_cached(m, nb_pts)
    counts2 = jnp.where(first_mask | (jnp.arange(m.max_kf) == kf_id),
                        0, counts2)
    topv2, topi2 = jax.lax.top_k(counts2, min(5, m.max_kf))
    topv = jnp.concatenate([topv1, topv2])
    topi = jnp.concatenate([topi1, topi2])
    neigh_mask = jnp.zeros(m.max_kf, bool).at[topi].set(topv > 0)

    cand_mask = ms.points_of_keyframes_cached(m, neigh_mask)
    # exclude points the KF already observes
    own = m.kf_obs_pt[kf_id]
    own_ind = jnp.zeros(m.max_pt + 2, bool).at[
        jnp.where(own >= 0, own, m.max_pt + 1)
    ].set(True, mode="drop")
    cand_mask &= ~own_ind[: m.max_pt]

    C = caps.local_points
    cand = jnp.nonzero(cand_mask, size=C, fill_value=m.max_pt)[0]
    cand_ok = cand < m.max_pt
    cand_c = jnp.clip(cand, 0, m.max_pt - 1)

    Tcw = m.kf_Tcw[kf_id]
    bounds = (0.0, float(cam.width), 0.0, float(cam.height))
    vis, uv, dist, _ = in_frustum(
        cam, Tcw, m.pt_pos[cand_c], m.pt_normal[cand_c],
        m.pt_min_dist[cand_c] * 0.8, m.pt_max_dist[cand_c] * 1.2,
        bounds, view_cos_limit=0.5,
    )
    vis &= cand_ok
    ratio = jnp.maximum(m.pt_max_dist[cand_c] / 1.2, 1e-6) / jnp.maximum(dist, 1e-6)
    pred_level = jnp.clip(
        jnp.ceil(jnp.log(ratio) / jnp.log(config.orb.scale_factor)).astype(jnp.int32),
        0, n_levels - 1,
    )
    radius = 3.0 * scale_factors[pred_level]  # reference Fuse th=3 (:1044)

    wmask = mcore.window_mask(uv, m.kf_xy[kf_id], radius)
    lmask = mcore.level_mask(pred_level, m.kf_level[kf_id], -1, 1)
    # match against ALL features: landing on a free feature adds an
    # observation; landing on an occupied one merges the duplicate pair
    # (reference ORBmatcher::Fuse keeps the point with more observations and
    # MapPoint::Replace forwards the other, src/ORBmatcher.cc:1136-1160,
    # src/MapPoint.cc:244).
    match = mcore.mutual_best_match(
        m.pt_desc[cand_c], m.kf_desc[kf_id], wmask & lmask,
        vis, m.kf_feat_valid[kf_id], max_dist=mcore.TH_LOW, ratio=None,
    )
    occupied = m.kf_obs_pt[kf_id, jnp.clip(match.idx, 0, m.feat_cap - 1)]
    hit_free = match.valid & (occupied < 0)
    hit_occ = match.valid & (occupied >= 0)

    # free features: bind the candidate point
    tgt = jnp.where(hit_free, match.idx, m.feat_cap + 1)
    new_row = m.kf_obs_pt[kf_id].at[tgt].set(
        jnp.where(hit_free, cand, -1).astype(jnp.int32), mode="drop"
    )
    m = m._replace(kf_obs_pt=m.kf_obs_pt.at[kf_id].set(new_row))

    # occupied features: merge (loser = fewer observations -> forwarded)
    if obs_count is None:
        obs_count = ms.observation_count(m)
    cand_obs = obs_count[cand_c]
    occ_c = jnp.clip(occupied, 0, m.max_pt - 1)
    occ_obs = obs_count[occ_c]
    cand_wins = cand_obs >= occ_obs
    winner = jnp.where(cand_wins, cand_c, occ_c)
    loser = jnp.where(cand_wins, occ_c, cand_c)
    lut = jnp.arange(m.max_pt, dtype=jnp.int32)
    lut = lut.at[jnp.where(hit_occ, loser, m.max_pt + 1)].set(
        winner.astype(jnp.int32), mode="drop"
    )
    remapped = jnp.where(m.kf_obs_pt >= 0,
                         lut[jnp.clip(m.kf_obs_pt, 0, m.max_pt - 1)],
                         m.kf_obs_pt)
    pt_valid = m.pt_valid.at[jnp.where(hit_occ, loser, m.max_pt + 1)].set(
        False, mode="drop"
    )
    m = m._replace(kf_obs_pt=remapped, pt_valid=pt_valid)

    # --- reverse direction: project the new KF's points into each neighbor
    # (reference projects target-KF points into all first/second-order
    # neighbors, src/LocalMapping.cc:690-720).  This is what gives freshly
    # created depth-seeded points their second observation.
    own_ids = m.kf_obs_pt[kf_id]
    own_ok = (own_ids >= 0) & m.kf_feat_valid[kf_id]
    own_c = jnp.clip(own_ids, 0, m.max_pt - 1)
    pos = m.pt_pos[own_c]
    normal = m.pt_normal[own_c]
    mind = m.pt_min_dist[own_c] * 0.8
    maxd = m.pt_max_dist[own_c] * 1.2
    desc = m.pt_desc[own_c]

    def fuse_one(kf_row_Tcw, kf_xy, kf_level, kf_desc, kf_fvalid, kf_obs_row, is_neigh):
        vis_n, uv_n, dist_n, _ = in_frustum(
            cam, kf_row_Tcw, pos, normal, mind, maxd, bounds, view_cos_limit=0.5
        )
        # exclude points the neighbor already observes
        have = jnp.zeros(m.max_pt + 2, bool).at[
            jnp.where(kf_obs_row >= 0, kf_obs_row, m.max_pt + 1)
        ].set(True, mode="drop")
        vis_n &= own_ok & is_neigh & ~have[own_c]
        ratio_n = jnp.maximum(maxd / 1.2, 1e-6) / jnp.maximum(dist_n, 1e-6)
        lvl_n = jnp.clip(
            jnp.ceil(jnp.log(ratio_n) / jnp.log(config.orb.scale_factor)).astype(jnp.int32),
            0, n_levels - 1,
        )
        rad_n = 3.0 * scale_factors[lvl_n]
        free_n = kf_fvalid & (kf_obs_row < 0)
        mm = mcore.mutual_best_match(
            desc, kf_desc,
            mcore.window_mask(uv_n, kf_xy, rad_n)
            & mcore.level_mask(lvl_n, kf_level, -1, 1),
            vis_n, free_n, max_dist=mcore.TH_LOW, ratio=None,
        )
        t = jnp.where(mm.valid, mm.idx, m.feat_cap + 1)
        return kf_obs_row.at[t].set(
            jnp.where(mm.valid, own_c, -1).astype(jnp.int32), mode="drop"
        )

    # only the top-k neighbor rows participate (gather -> vmap -> scatter)
    new_rows = jax.vmap(fuse_one)(
        m.kf_Tcw[topi], m.kf_xy[topi], m.kf_level[topi], m.kf_desc[topi],
        m.kf_feat_valid[topi], m.kf_obs_pt[topi], topv > 0,
    )
    kf_obs_pt = m.kf_obs_pt.at[jnp.where(topv > 0, topi, m.max_kf + 1)].set(
        new_rows, mode="drop"
    )
    return m._replace(kf_obs_pt=kf_obs_pt)


def create_new_points(config: SlamConfig, m: MapState, kf_id: jnp.ndarray,
                      max_new: int = 128,
                      counts: jnp.ndarray | None = None) -> MapState:
    """Triangulate new map points between the new KF and covisible neighbors.

    Reference: LocalMapping::CreateNewMapPoints (src/LocalMapping.cc:312-626):
    for the top covisible keyframes, match free features under the epipolar
    constraint (ORBmatcher::SearchForTriangulation + CheckDistEpipolarLine),
    triangulate, and gate by parallax / positive depth / reprojection chi2 /
    scale consistency.  TPU form: one [neighbors, N, N] masked Hamming pass,
    best-neighbor selection per feature, batched DLT triangulation, single
    scatter insert binding BOTH observations.
    """
    from ..ops.camera import project
    from ..ops.matching import core as mcore
    from ..ops.triangulate import projection_matrix, triangulate_linear_fast

    cam = config.camera
    # nn = 10 stereo/RGB-D, 20 mono (reference LocalMapping.cc:316-318)
    n_nb = min(20 if config.sensor == "mono" else 10, m.max_kf)
    scale_factors = jnp.asarray(config.orb.scale_factors())
    sigma2 = jnp.asarray(config.orb.sigma2())

    if counts is None:
        counts = ms.covisibility_row(m, m.kf_obs_pt[kf_id])
    counts = counts.at[kf_id].set(0)
    topv, topi = jax.lax.top_k(counts, n_nb)
    nb_ok = topv > 0

    Tcw1 = m.kf_Tcw[kf_id]
    c1 = se3.inverse(Tcw1)[:3, 3]
    free1 = m.kf_feat_valid[kf_id] & (m.kf_obs_pt[kf_id] < 0)
    desc1 = m.kf_desc[kf_id]
    xy1 = m.kf_xy[kf_id]
    K33 = cam.K

    def per_neighbor(nb, ok):
        Tcw2 = m.kf_Tcw[nb]
        c2 = se3.inverse(Tcw2)[:3, 3]
        baseline = jnp.linalg.norm(c1 - c2)
        # baseline gate (reference :366-384): stereo needs baseline > b
        med_depth = 2.0  # conservative scene scale for the mono ratio test
        enough_baseline = jnp.where(
            cam.bf > 0, baseline > cam.baseline, baseline / med_depth > 0.01
        )
        free2 = m.kf_feat_valid[nb] & (m.kf_obs_pt[nb] < 0)
        # fundamental matrix F12 = K^-T [t]x R K^-1 (reference ComputeF12)
        T12 = Tcw1 @ se3.inverse(Tcw2)
        R12 = T12[:3, :3]
        t12 = T12[:3, 3]
        Kinv = jnp.linalg.inv(K33)
        F12 = Kinv.T @ se3.hat(t12) @ R12 @ Kinv
        # epipolar distance of feature2 to line of feature1: l = F12^T x1
        ones = jnp.ones((xy1.shape[0], 1), xy1.dtype)
        x1h = jnp.concatenate([xy1, ones], -1)
        lines = x1h @ F12  # [N, 3] lines in image 2
        xy2 = m.kf_xy[nb]
        num = (
            lines[:, None, 0] * xy2[None, :, 0]
            + lines[:, None, 1] * xy2[None, :, 1]
            + lines[:, None, 2]
        ) ** 2
        den = jnp.maximum(lines[:, None, 0] ** 2 + lines[:, None, 1] ** 2, 1e-12)
        epi_ok = num / den < 3.84 * sigma2[m.kf_level[nb]][None, :]
        match = mcore.mutual_best_match(
            desc1, m.kf_desc[nb], epi_ok, free1 & ok & enough_baseline, free2,
            max_dist=mcore.TH_LOW, ratio=0.9,
        )
        return match.idx, jnp.where(match.valid, match.dist, 10_000)

    nb_idx, nb_dist = jax.vmap(per_neighbor)(topi, nb_ok)  # [n_nb, N]
    best_nb = jnp.argmin(nb_dist, axis=0)  # [N]
    best_dist = jnp.min(nb_dist, axis=0)
    has_match = best_dist < mcore.TH_LOW
    nb_kf = topi[best_nb]                                  # [N]
    nb_feat = jnp.take_along_axis(nb_idx, best_nb[None, :], 0)[0]
    nb_feat = jnp.clip(nb_feat, 0, m.feat_cap - 1)

    # triangulate each (feature1, neighbor feature) pair
    P1 = projection_matrix(K33, Tcw1)
    P2 = projection_matrix(K33, m.kf_Tcw[nb_kf])           # [N, 3, 4]
    uv2 = m.kf_xy[nb_kf, nb_feat]
    pts = triangulate_linear_fast(xy1, uv2, P1, P2)

    # gates (reference :430-560)
    R1, t1 = Tcw1[:3, :3], Tcw1[:3, 3]
    pc1 = pts @ R1.T + t1
    Tcw2g = m.kf_Tcw[nb_kf]
    pc2 = jnp.einsum("nij,nj->ni", Tcw2g[:, :3, :3], pts) + Tcw2g[:, :3, 3]
    uv1_hat, z1 = project(cam, pc1)
    uv2_hat, z2 = project(cam, pc2)
    e1 = jnp.sum((uv1_hat - xy1) ** 2, -1) / sigma2[m.kf_level[kf_id]]
    e2 = jnp.sum((uv2_hat - uv2) ** 2, -1) / sigma2[m.kf_level[nb_kf, nb_feat]]
    ray1 = pts - c1
    c2g = -jnp.einsum("nij,ni->nj", Tcw2g[:, :3, :3], Tcw2g[:, :3, 3])
    ray2 = pts - c2g
    cos_par = jnp.sum(ray1 * ray2, -1) / jnp.maximum(
        jnp.linalg.norm(ray1, axis=-1) * jnp.linalg.norm(ray2, axis=-1), 1e-9
    )
    dist1 = jnp.linalg.norm(ray1, axis=-1)
    dist2 = jnp.linalg.norm(ray2, axis=-1)
    ratio_dist = dist2 / jnp.maximum(dist1, 1e-9)
    ratio_octave = (
        scale_factors[m.kf_level[nb_kf, nb_feat]]
        / scale_factors[m.kf_level[kf_id]]
    )
    scale_ok = (ratio_dist < ratio_octave * 1.5) & (ratio_dist * 1.5 > ratio_octave)

    good = (
        has_match
        & jnp.all(jnp.isfinite(pts), -1)
        & (z1 > 0) & (z2 > 0)
        & (cos_par < 0.9998) & (cos_par > 0)
        & (e1 < 5.991) & (e2 < 5.991)
        & scale_ok
    )
    # cap per keyframe: keep the best-matching max_new
    order = jnp.argsort(jnp.where(good, best_dist, 10_000))
    rank = jnp.zeros(m.feat_cap, jnp.int32).at[order].set(
        jnp.arange(m.feat_cap, dtype=jnp.int32)
    )
    create = good & (rank < max_new)

    feat_idx = jnp.arange(m.feat_cap, dtype=jnp.int32)
    m, new_ids = ms.add_points(m, config, kf_id, feat_idx, pts, create)
    # bind the neighbor-side observation too (2-obs points from birth)
    tgt_kf = jnp.where(create & (new_ids >= 0), nb_kf, m.max_kf + 1)
    m = m._replace(
        kf_obs_pt=m.kf_obs_pt.at[tgt_kf, nb_feat].set(new_ids, mode="drop")
    )
    return m


def local_bundle_adjustment(config: SlamConfig, m: MapState, kf_id: jnp.ndarray,
                            counts: jnp.ndarray | None = None) -> MapState:
    """Local BA over a covisibility-ranked window around the new keyframe.

    Reference: Optimizer::LocalBundleAdjustment (src/Optimizer.cc:629-1014):
    free = current KF + covisible KFs, fixed = other observers of local
    points, then Schur/LM and outlier-observation removal.  Here the window
    is capacity-bounded: top `ba_free_kfs` covisible keyframes are free, top
    `ba_fixed_kfs` second-ring observers are fixed, `ba_points` local points.
    """
    from ..ops.optim.bundle_adjust import bundle_adjust

    caps = config.caps
    n_free = min(caps.ba_free_kfs, m.max_kf)
    n_fixed = min(caps.ba_fixed_kfs, m.max_kf)
    Pl = caps.ba_points

    if counts is None:
        counts = ms.covisibility_row(m, m.kf_obs_pt[kf_id])
    # the new KF always belongs to the window
    counts = counts.at[kf_id].add(10_000)
    free_counts, free_idx = jax.lax.top_k(counts, n_free)
    free_ok = free_counts > 0
    free_mask = jnp.zeros(m.max_kf, bool).at[free_idx].set(free_ok)

    pt_mask = ms.points_of_keyframes(m, free_mask)
    cand = jnp.nonzero(pt_mask, size=Pl, fill_value=m.max_pt)[0]
    cand_ok = cand < m.max_pt
    cand_c = jnp.clip(cand, 0, m.max_pt - 1)

    counts2 = ms.covisibility_row(m, jnp.where(cand_ok, cand, -1).astype(jnp.int32))
    counts2 = jnp.where(free_mask, 0, counts2)
    fixed_counts, fixed_idx = jax.lax.top_k(counts2, n_fixed)
    fixed_ok = fixed_counts > 0

    sel_idx = jnp.concatenate([free_idx, fixed_idx])          # [Kl]
    sel_ok = jnp.concatenate([free_ok, fixed_ok])
    sel_free = jnp.concatenate([free_ok, jnp.zeros(n_fixed, bool)])
    # gauge: keyframe 0 never moves (reference sets pKF->mnId==0 fixed,
    # Optimizer.cc:700)
    sel_free &= sel_idx != 0

    lut = jnp.full(m.max_pt + 2, -1, jnp.int32)
    lut = lut.at[cand_c].set(
        jnp.where(cand_ok, jnp.arange(Pl, dtype=jnp.int32), -1)
    )

    obs_pt_g = m.kf_obs_pt[sel_idx]                            # [Kl, N] global ids
    obs_pt_l = lut[jnp.clip(obs_pt_g, 0, m.max_pt + 1)]
    obs_pt_l = jnp.where(obs_pt_g >= 0, obs_pt_l, -1)
    obs_uvr = jnp.concatenate(
        [m.kf_xy[sel_idx], m.kf_uright[sel_idx][..., None]], axis=-1
    )
    sigma2 = jnp.asarray(config.orb.sigma2())[m.kf_level[sel_idx]]
    obs_valid = m.kf_feat_valid[sel_idx] & sel_ok[:, None]

    res = bundle_adjust(
        config.camera,
        m.kf_Tcw[sel_idx],
        m.pt_pos[cand_c],
        obs_pt_l, obs_uvr, sigma2, obs_valid,
        sel_free, cand_ok,
        n_iters_pre=caps.ba_iters_pre,
        n_iters_post=caps.ba_iters_post,
        ur_weight=config.ur_weight,
    )

    # Scatter back poses (free only) and point positions.  Invalid window
    # slots (top_k fills them with arbitrary zero-count keyframes, which can
    # DUPLICATE valid slots) must be dropped, or their stale rows overwrite
    # the optimized ones.
    scatter_idx = jnp.where(sel_ok, sel_idx, m.max_kf + 1)
    free_scatter = jnp.where(sel_free, sel_idx, m.max_kf + 1)
    kf_Tcw = m.kf_Tcw.at[free_scatter].set(res.kf_Tcw, mode="drop")
    pt_pos = m.pt_pos.at[jnp.where(cand_ok, cand_c, m.max_pt + 1)].set(
        res.pt_pos, mode="drop"
    )
    # erase outlier observations (reference Optimizer.cc:919-960)
    had_obs = (obs_pt_l >= 0) & obs_valid
    outlier = had_obs & ~res.obs_inlier
    new_obs = jnp.where(outlier, -1, m.kf_obs_pt[sel_idx])
    kf_obs_pt = m.kf_obs_pt.at[scatter_idx].set(new_obs, mode="drop")
    return m._replace(kf_Tcw=kf_Tcw, pt_pos=pt_pos, kf_obs_pt=kf_obs_pt)


def cull_keyframes(config: SlamConfig, m: MapState, kf_id: jnp.ndarray,
                   counts: jnp.ndarray | None = None,
                   obs_count: jnp.ndarray | None = None) -> MapState:
    """Retire redundant covisible keyframes.

    Reference: LocalMapping::KeyFrameCulling (src/LocalMapping.cc:873-1030):
    a covisible KF whose map points are >= 90% observed by >= 3 other
    keyframes is marked bad; its pose is preserved relative to a parent
    (KeyFrame::SetBadFlag stores mTcp, src/KeyFrame.cc:571-724) so
    trajectory entries referencing it stay resolvable.
    """
    if obs_count is None:
        obs_count = ms.observation_count(m)
    if counts is None:
        counts = ms.covisibility_row(m, m.kf_obs_pt[kf_id])
    counts = counts.at[kf_id].set(0)
    topv, topi = jax.lax.top_k(counts, min(10, m.max_kf))

    def redundancy(k):
        ids = m.kf_obs_pt[k]
        ok = (ids >= 0) & m.kf_feat_valid[k]
        oc = obs_count[jnp.clip(ids, 0, m.max_pt - 1)]
        redundant = jnp.sum(ok & (oc >= 4))  # >=3 others + itself
        total = jnp.maximum(jnp.sum(ok), 1)
        return redundant.astype(jnp.float32) / total.astype(jnp.float32)

    red = jax.vmap(redundancy)(topi)
    # cull at most ONE keyframe per pass (the most redundant), never KF 0 or
    # the current one — incremental like the reference's per-iteration cull
    red = jnp.where((topv > 0) & (topi != 0) & (topi != kf_id), red, 0.0)
    worst = jnp.argmax(red)
    victim = topi[worst]
    do_cull = red[worst] >= config.tracking.kf_cull_redundancy

    # parent = its most covisible surviving keyframe (cached incidence)
    vcounts = ms.covisibility_row_cached(m, m.kf_obs_pt[victim])
    vcounts = vcounts.at[victim].set(0)
    parent = jnp.argmax(vcounts).astype(jnp.int32)
    Tcp = m.kf_Tcw[victim] @ se3.inverse(m.kf_Tcw[parent])

    victim_s = jnp.where(do_cull, victim, m.max_kf + 1)
    # archive (seq, parent_seq, Tcp) so trajectory entries referencing the
    # victim stay resolvable after its slot is reused (KeyFrame::SetBadFlag
    # keeps mTcp on the bad KF, src/KeyFrame.cc:571-724)
    A = m.cull_seq.shape[0]
    a_slot = jnp.where(do_cull, m.n_culled % A, A + 1)
    # points whose reference keyframe was the victim re-anchor on the parent
    pt_ref = jnp.where(m.pt_valid & (m.pt_ref_kf == victim) & do_cull,
                       parent, m.pt_ref_kf)
    # re-parent the victim's SPANNING-TREE children (reference
    # KeyFrame::SetBadFlag reassigns children to the best covisible candidate
    # parent, src/KeyFrame.cc:571-724).  Each child takes its most covisible
    # OLDER surviving keyframe (seq < child's seq keeps the tree acyclic);
    # with no covisible older KF it falls back to the VICTIM'S OWN tree
    # parent (the reference's mpParent fallback, :703) — which is strictly
    # older than the victim, hence older than every child.  (The victim's
    # most-covisible survivor `parent` above is often one of the children
    # themselves, so it must not be the fallback: a newer-seq or self parent
    # would break the parent-strictly-older tree invariant.)
    victim_seq = m.kf_seq[victim]
    is_child = (m.kf_tree_parent_seq == victim_seq) & m.kf_valid & do_cull
    C_all = ms.covisibility_matrix_cached(m)

    def reparent(c):
        row = C_all[c].at[victim].set(0).at[c].set(0)
        older = m.kf_valid & (m.kf_seq < m.kf_seq[c])
        row = jnp.where(older, row, 0)
        best = jnp.argmax(row).astype(jnp.int32)
        return jnp.where(row[best] > 0, m.kf_seq[best],
                         m.kf_tree_parent_seq[victim])

    new_parents = jax.vmap(reparent)(jnp.arange(m.max_kf, dtype=jnp.int32))
    tree_parent = jnp.where(is_child, new_parents, m.kf_tree_parent_seq)
    return m._replace(
        kf_valid=m.kf_valid.at[victim_s].set(False, mode="drop"),
        kf_parent=m.kf_parent.at[victim_s].set(parent, mode="drop"),
        kf_Tcp=m.kf_Tcp.at[victim_s].set(Tcp, mode="drop"),
        kf_tree_parent_seq=tree_parent,
        cull_seq=m.cull_seq.at[a_slot].set(m.kf_seq[victim], mode="drop"),
        cull_parent_seq=m.cull_parent_seq.at[a_slot].set(
            m.kf_seq[parent], mode="drop"),
        cull_Tcp=m.cull_Tcp.at[a_slot].set(Tcp, mode="drop"),
        n_culled=m.n_culled + do_cull.astype(jnp.int32),
        pt_ref_kf=pt_ref,
    )


class LocalMapper:
    def __init__(self, config: SlamConfig):
        self.config = config
        self._jit_process = jax.jit(
            functools.partial(_process, config), donate_argnums=0
        )

    def process(self, m: MapState, kf_id) -> MapState:
        return self._jit_process(m, kf_id)


def _process(config: SlamConfig, m: MapState, kf_id: jnp.ndarray) -> MapState:
    """One mapping pass (reference LocalMapping::Run body).

    The covisibility row / observation counts are computed ONCE and shared
    across the stages — the reference likewise works from the covisibility
    graph refreshed at ProcessNewKeyFrame and only re-runs UpdateConnections
    at the end of SearchInNeighbors (src/LocalMapping.cc:198,628-779), so
    intra-pass staleness matches its semantics and saves ~4 O(K*N) passes.
    """
    m = cull_points(config, m, kf_id)
    # cached incidence (fresh: row-updated at insertion, rebuilt at the end
    # of the previous phase; in-phase staleness matches the reference's
    # asynchronously-refreshed covisibility graph)
    counts = ms.covisibility_row_cached(m, m.kf_obs_pt[kf_id])
    obs_count = ms.observation_count(m)
    m = create_new_points(config, m, kf_id, counts=counts)
    m = fuse_into_keyframe(config, m, kf_id, counts=counts,
                           obs_count=obs_count)
    m = refresh_observed_points(config, m, kf_id)
    m = local_bundle_adjustment(config, m, kf_id, counts=counts)
    # fresh observation counts for the redundancy rule (fuse just densified
    # the graph; the 90% rule needs the post-fuse counts)
    m = cull_keyframes(config, m, kf_id, counts=counts)
    # refresh the cached observation incidence + per-point counts for the
    # per-frame tracking policy and loop detection (MUST be the last step of
    # the phase: culls and rebinds above all reflect into the cache here)
    return ms.rebuild_incidence(m)
