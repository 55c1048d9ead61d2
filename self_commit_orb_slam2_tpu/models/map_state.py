"""The global map as fixed-capacity struct-of-arrays (a pytree).

TPU-native redesign of the reference's pointer-graph map (Map / KeyFrame /
MapPoint, src/Map.cc, src/KeyFrame.cc, src/MapPoint.cc):

  * KeyFrame*/MapPoint* webs -> integer ids into SoA blocks with validity
    masks.  Deletion (`SetBadFlag`) = clearing a mask bit; `MapPoint::Replace`
    = an index-forwarding array.
  * The covisibility graph is not stored: it is recomputed on demand from the
    observation table `kf_obs_pt` ([K, N] point id per keyframe feature) —
    one gather per row, O(K*N), instead of incremental weight maintenance
    (reference KeyFrame::UpdateConnections src/KeyFrame.cc:386-509).
  * No mutexes: phases exchange whole immutable MapState pytrees; the jit
    donation machinery makes the updates in-place on device.

Observations are stored only on the keyframe side (kf_obs_pt); the point ->
(kf, feat) direction, when needed (normal updates, descriptor refresh, BA), is
derived by masked scans over the keyframe axis — bounded, static shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import se3
from .config import SlamConfig
from .frame import FrameData

NO_POINT = jnp.int32(-1)


class MapState(NamedTuple):
    # --- keyframes ---
    kf_Tcw: jnp.ndarray        # [K, 4, 4]
    kf_valid: jnp.ndarray      # [K] bool
    kf_frame_id: jnp.ndarray   # [K] int32 source frame index
    kf_timestamp: jnp.ndarray  # [K] float64-as-float32 pair not needed; float32 ok
    kf_xy: jnp.ndarray         # [K, N, 2] undistorted coords
    kf_uright: jnp.ndarray     # [K, N]
    kf_depth: jnp.ndarray      # [K, N]
    kf_level: jnp.ndarray      # [K, N] int32
    kf_angle: jnp.ndarray      # [K, N]
    kf_desc: jnp.ndarray       # [K, N, 8] uint32
    kf_feat_valid: jnp.ndarray # [K, N] bool
    kf_obs_pt: jnp.ndarray     # [K, N] int32 point id (-1 = none)
    # Sparse BoW vectors: per keyframe the top-T (word id, weight) pairs,
    # id-sorted, -1/0 padded (ops/bow.py sparse_bow).  O(K*T) memory makes
    # the database independent of vocabulary size — the reference's ORBvoc
    # is ~1M leaves (DBoW2 TemplatedVocabulary.h:1338) and a dense [K, W]
    # table would be ~256MB at that scale.
    kf_bow_ids: jnp.ndarray    # [K, T] int32 word ids (-1 pad; T=1 if no vocab)
    kf_bow_vals: jnp.ndarray   # [K, T] float32 TF-IDF weights
    kf_parent: jnp.ndarray     # [K] int32: parent after culling (-1 = live)
    kf_Tcp: jnp.ndarray        # [K, 4, 4] relative pose to parent at cull time
    # LIVE covisibility spanning tree (reference KeyFrame::ChangeParent /
    # UpdateConnections first-connection, src/KeyFrame.cc:498-556): parent =
    # the most covisible existing keyframe at insertion, re-parented when the
    # parent is culled (SetBadFlag, :571-724).  Stored as SEQ so it survives
    # slot reuse; -1 = root.  The essential graph's backbone
    # (Optimizer::OptimizeEssentialGraph spanning-tree edges,
    # src/Optimizer.cc:1100-1265) — for branching / revisiting trajectories
    # this differs from the temporal chain.
    kf_tree_parent_seq: jnp.ndarray  # [K] int32
    kf_word: jnp.ndarray       # [K, N] int32 BoW word ids (-1 = none)
    kf_node: jnp.ndarray       # [K, N] int32 mid-level node ids (SearchByBoW)
    kf_seq: jnp.ndarray        # [K] int32 insertion sequence number (-1 unused);
                               # slots are REUSED after culling, so temporal
                               # order lives here, not in the slot index
    # --- map points ---
    pt_pos: jnp.ndarray        # [P, 3]
    pt_normal: jnp.ndarray     # [P, 3]
    pt_desc: jnp.ndarray       # [P, 8] uint32
    pt_min_dist: jnp.ndarray   # [P]
    pt_max_dist: jnp.ndarray   # [P]
    pt_valid: jnp.ndarray      # [P] bool
    pt_ref_kf: jnp.ndarray     # [P] int32
    pt_first_kf: jnp.ndarray   # [P] int32 (MapPoint culling rules)
    pt_visible: jnp.ndarray    # [P] int32
    pt_found: jnp.ndarray      # [P] int32
    # Unique creation stamp (the monotone n_pt counter at creation): slots
    # are REUSED after culling, so a carried point id is only trustworthy
    # while the slot's birth stamp matches the one captured with it — the
    # guard tracking applies is our CheckReplacedInLastFrame analogue
    # (reference src/Tracking.cc:1152, MapPoint::Replace MapPoint.cc:244).
    pt_birth: jnp.ndarray      # [P] int32
    # Cached observation counts (#keyframes observing each point), refreshed
    # at the end of every mapping phase.  The per-frame tracking KF policy
    # reads this instead of re-running the O(K*N) observation_count scatter
    # every frame; counts only change when keyframes are inserted/culled or
    # observations rebind — all of which end in a mapping/loop phase that
    # refreshes the cache.
    pt_obs: jnp.ndarray        # [P] int32
    # Dense observation INCIDENCE matrix: kf_pt_inc[k, p] = 1 iff keyframe k
    # observes point p.  This is the MXU-native covisibility representation
    # (SURVEY §7 "covisibility as sparse weight matrix"): the per-frame
    # local-keyframe vote (reference UpdateLocalKeyFrames) becomes one
    # [K, P] x [P] matvec instead of an O(K*N) gather (~20x faster on v5e —
    # TPU gathers cost ~8ns/element), and KF-KF covisibility is inc @ inc.T.
    # Refreshed with pt_obs at the end of every mapping/loop phase; row-
    # updated on keyframe insertion.  int8 keeps it 16MB at default caps.
    kf_pt_inc: jnp.ndarray     # [K, P] int8
    # --- cull archive (trajectory resolution for retired keyframes) ---
    # When a keyframe slot is reclaimed its relative pose to a parent must
    # survive so old trajectory entries referencing it stay resolvable
    # (reference keeps bad KeyFrames alive with mTcp, src/KeyFrame.cc:571-724;
    # here retired KFs append (seq, parent_seq, Tcp) to this ring).
    cull_seq: jnp.ndarray         # [A] int32 seq of the culled keyframe (-1 empty)
    cull_parent_seq: jnp.ndarray  # [A] int32 seq of its parent at cull time
    cull_Tcp: jnp.ndarray         # [A, 4, 4] T_victim<-parent at cull time
    n_culled: jnp.ndarray         # scalar int32 (monotone; ring index)
    # --- persisted loop edges (reference KeyFrame::AddLoopEdge
    # src/KeyFrame.cc:556; every OptimizeEssentialGraph re-includes past loop
    # edges, src/Optimizer.cc:1100-1265).  Endpoints are SEQ numbers so they
    # survive slot reuse; the measurement is the verified Sim3 S_i<-j.
    loop_seq_i: jnp.ndarray       # [L] int32 (-1 empty)
    loop_seq_j: jnp.ndarray       # [L] int32
    loop_meas: jnp.ndarray        # [L, 8] Sim3
    n_loop: jnp.ndarray           # scalar int32 (ring index)
    # --- counters (MONOTONE totals-ever; live counts = mask sums) ---
    n_kf: jnp.ndarray          # scalar int32: keyframes ever inserted (= next seq)
    n_pt: jnp.ndarray          # scalar int32: points ever created

    @property
    def max_kf(self) -> int:
        return self.kf_Tcw.shape[0]

    @property
    def max_pt(self) -> int:
        return self.pt_pos.shape[0]

    @property
    def feat_cap(self) -> int:
        return self.kf_xy.shape[1]


def empty_map(config: SlamConfig) -> MapState:
    K = config.caps.max_keyframes
    P = config.caps.max_points
    N = config.orb.feat_capacity()
    T = config.bow_top if config.vocab is not None else 1
    f32 = jnp.float32
    return MapState(
        kf_Tcw=jnp.tile(jnp.eye(4, dtype=f32), (K, 1, 1)),
        kf_valid=jnp.zeros(K, bool),
        kf_frame_id=jnp.zeros(K, jnp.int32),
        kf_timestamp=jnp.zeros(K, f32),
        kf_xy=jnp.zeros((K, N, 2), f32),
        kf_uright=jnp.full((K, N), -1.0, f32),
        kf_depth=jnp.full((K, N), -1.0, f32),
        kf_level=jnp.zeros((K, N), jnp.int32),
        kf_angle=jnp.zeros((K, N), f32),
        kf_desc=jnp.zeros((K, N, 8), jnp.uint32),
        kf_feat_valid=jnp.zeros((K, N), bool),
        kf_obs_pt=jnp.full((K, N), NO_POINT, jnp.int32),
        kf_bow_ids=jnp.full((K, T), -1, jnp.int32),
        kf_bow_vals=jnp.zeros((K, T), f32),
        kf_parent=jnp.full(K, -1, jnp.int32),
        kf_Tcp=jnp.tile(jnp.eye(4, dtype=f32), (K, 1, 1)),
        kf_tree_parent_seq=jnp.full(K, -1, jnp.int32),
        kf_word=jnp.full((K, N), -1, jnp.int32),
        kf_node=jnp.full((K, N), -1, jnp.int32),
        kf_seq=jnp.full(K, -1, jnp.int32),
        pt_pos=jnp.zeros((P, 3), f32),
        pt_normal=jnp.zeros((P, 3), f32),
        pt_desc=jnp.zeros((P, 8), jnp.uint32),
        pt_min_dist=jnp.zeros(P, f32),
        pt_max_dist=jnp.zeros(P, f32),
        pt_valid=jnp.zeros(P, bool),
        pt_ref_kf=jnp.zeros(P, jnp.int32),
        pt_first_kf=jnp.zeros(P, jnp.int32),
        pt_visible=jnp.zeros(P, jnp.int32),
        pt_found=jnp.zeros(P, jnp.int32),
        pt_birth=jnp.zeros(P, jnp.int32),
        pt_obs=jnp.zeros(P, jnp.int32),
        kf_pt_inc=jnp.zeros((K, P), jnp.int8),
        cull_seq=jnp.full(config.caps.cull_log, -1, jnp.int32),
        cull_parent_seq=jnp.full(config.caps.cull_log, -1, jnp.int32),
        cull_Tcp=jnp.tile(jnp.eye(4, dtype=f32), (config.caps.cull_log, 1, 1)),
        n_culled=jnp.int32(0),
        loop_seq_i=jnp.full(config.caps.loop_log, -1, jnp.int32),
        loop_seq_j=jnp.full(config.caps.loop_log, -1, jnp.int32),
        loop_meas=jnp.tile(
            jnp.asarray([0, 0, 0, 1, 0, 0, 0, 1], f32),
            (config.caps.loop_log, 1)),
        n_loop=jnp.int32(0),
        n_kf=jnp.int32(0),
        n_pt=jnp.int32(0),
    )


def latest_kf(m: MapState) -> jnp.ndarray:
    """Slot of the most recently inserted live keyframe."""
    return jnp.argmax(jnp.where(m.kf_valid, m.kf_seq, -1)).astype(jnp.int32)


def insert_keyframe(
    m: MapState,
    frame: FrameData,
    Tcw: jnp.ndarray,
    frame_id: jnp.ndarray,
    timestamp: jnp.ndarray,
    obs_pt: jnp.ndarray,
    bow: tuple | None = None,   # sparse (ids [T], vals [T]) from ops/bow.sparse_bow
    words: jnp.ndarray | None = None,
    nodes: jnp.ndarray | None = None,
) -> tuple[MapState, jnp.ndarray]:
    """Insert a keyframe into the first FREE slot (reference
    Tracking::CreateNewKeyFrame src/Tracking.cc:1649 + Map::AddKeyFrame).
    Culled slots are reclaimed — long sequences stay bounded like the
    reference's cull-as-you-go map (src/LocalMapping.cc:261,873).  obs_pt:
    [N] matched point ids from tracking (-1 where none).  Returns (map,
    kf_id); if every slot is live the write is dropped."""
    slot = jnp.argmin(m.kf_valid).astype(jnp.int32)  # first invalid slot
    ok = ~m.kf_valid[slot]
    w = lambda arr, val: arr.at[slot].set(jnp.where(ok, val, arr[slot]))
    # spanning-tree parent: the most covisible EXISTING keyframe (reference
    # sets mpParent to the top covisible at the first UpdateConnections,
    # src/KeyFrame.cc:498-556); root (-1) when nothing is shared yet.
    # EXACT covisibility row (gather-based), not the cached-incidence matvec:
    # the cache refreshes only per mapping phase, so a keyframe inserted
    # before the cache reflects recent bindings (two keyframes in one chunk,
    # mono-init's kf2) would get a stale/-1 parent exactly on the revisit
    # trajectories the tree exists for.  One O(K*N) gather per keyframe
    # insertion is off the per-frame hot path.
    tree_counts = covisibility_row(
        m, jnp.where(frame.valid, obs_pt, NO_POINT))
    tp = jnp.argmax(tree_counts).astype(jnp.int32)
    parent_seq = jnp.where(tree_counts[tp] > 0, m.kf_seq[tp], jnp.int32(-1))
    m2 = m._replace(
        kf_Tcw=w(m.kf_Tcw, Tcw),
        kf_valid=m.kf_valid.at[slot].set(ok | m.kf_valid[slot]),
        kf_seq=w(m.kf_seq, m.n_kf),
        kf_parent=w(m.kf_parent, jnp.int32(-1)),
        kf_Tcp=w(m.kf_Tcp, jnp.eye(4, dtype=jnp.float32)),
        kf_tree_parent_seq=w(m.kf_tree_parent_seq, parent_seq),
        kf_frame_id=w(m.kf_frame_id, frame_id.astype(jnp.int32)),
        kf_timestamp=w(m.kf_timestamp, timestamp.astype(jnp.float32)),
        kf_xy=w(m.kf_xy, frame.xy),
        kf_uright=w(m.kf_uright, frame.u_right),
        kf_depth=w(m.kf_depth, frame.depth),
        kf_level=w(m.kf_level, frame.level),
        kf_angle=w(m.kf_angle, frame.angle),
        kf_desc=w(m.kf_desc, frame.desc),
        kf_feat_valid=w(m.kf_feat_valid, frame.valid),
        kf_obs_pt=w(m.kf_obs_pt, jnp.where(frame.valid, obs_pt, NO_POINT)),
        # keep the cached observation counts + incidence row consistent
        pt_obs=m.pt_obs.at[
            jnp.where(ok & frame.valid & (obs_pt >= 0), obs_pt, m.max_pt + 1)
        ].add(1, mode="drop"),
        kf_pt_inc=w(m.kf_pt_inc, _inc_row(m, obs_pt, frame.valid)),
        kf_bow_ids=(w(m.kf_bow_ids, bow[0]) if bow is not None
                    else m.kf_bow_ids),
        kf_bow_vals=(w(m.kf_bow_vals, bow[1]) if bow is not None
                     else m.kf_bow_vals),
        kf_word=w(m.kf_word, words) if words is not None else m.kf_word,
        kf_node=w(m.kf_node, nodes) if nodes is not None else m.kf_node,
        n_kf=m.n_kf + ok.astype(jnp.int32),
    )
    return m2, slot


def add_points(
    m: MapState,
    config: SlamConfig,
    kf_id: jnp.ndarray,
    feat_idx: jnp.ndarray,
    positions: jnp.ndarray,
    create_mask: jnp.ndarray,
) -> tuple[MapState, jnp.ndarray]:
    """Create new map points observed by keyframe `kf_id`.

    feat_idx: [M] feature indices in that keyframe; positions: [M, 3] world;
    create_mask: [M] which rows actually become points.  Returns (map,
    point ids [M], -1 where not created).  Mirrors MapPoint creation during
    keyframe insertion (reference Tracking.cc:1700-1750, LocalMapping
    CreateNewMapPoints write-out) including normal/scale-band initialization
    (MapPoint::UpdateNormalAndDepth src/MapPoint.cc:477-533).
    """
    scale_factors = jnp.asarray(config.orb.scale_factors())
    n_levels = config.orb.n_levels

    # free-list allocation: creations land in the first free (invalid) point
    # slots, so culling (pt_valid &= ...) keeps the map bounded over long
    # sequences instead of the cursor saturating at max_pt
    M = create_mask.shape[0]
    free = jnp.nonzero(~m.pt_valid, size=M, fill_value=m.max_pt + 1)[0]
    rank = jnp.cumsum(create_mask.astype(jnp.int32)) - 1
    ids = free[jnp.clip(rank, 0, M - 1)].astype(jnp.int32)
    create_mask = create_mask & (ids <= m.max_pt)
    ids = jnp.where(create_mask, ids, m.max_pt + 1)  # OOB -> dropped scatter

    cam_center = se3.inverse(m.kf_Tcw[kf_id])[:3, 3]
    rays = positions - cam_center
    dist = jnp.linalg.norm(rays, axis=-1)
    normal = rays / jnp.maximum(dist[:, None], 1e-9)
    level = m.kf_level[kf_id, feat_idx]
    level_scale = scale_factors[level]
    max_dist = dist * level_scale
    min_dist = max_dist / scale_factors[n_levels - 1]
    desc = m.kf_desc[kf_id, feat_idx]

    mode = dict(mode="drop")
    m2 = m._replace(
        pt_pos=m.pt_pos.at[ids].set(positions, **mode),
        pt_normal=m.pt_normal.at[ids].set(normal, **mode),
        pt_desc=m.pt_desc.at[ids].set(desc, **mode),
        pt_min_dist=m.pt_min_dist.at[ids].set(min_dist, **mode),
        pt_max_dist=m.pt_max_dist.at[ids].set(max_dist, **mode),
        pt_valid=m.pt_valid.at[ids].set(True, **mode),
        pt_ref_kf=m.pt_ref_kf.at[ids].set(kf_id, **mode),
        # birth time as a SEQ number (slot ids are reused; seqs are monotone)
        pt_first_kf=m.pt_first_kf.at[ids].set(m.kf_seq[kf_id], **mode),
        pt_visible=m.pt_visible.at[ids].set(1, **mode),
        pt_found=m.pt_found.at[ids].set(1, **mode),
        # unique birth stamp from the monotone creation counter (slot-reuse
        # guard; see the MapState field comment)
        pt_birth=m.pt_birth.at[ids].set(m.n_pt + rank, **mode),
        pt_obs=m.pt_obs.at[ids].set(1, **mode),
        kf_pt_inc=m.kf_pt_inc.at[kf_id, ids].set(1, **mode),
        n_pt=m.n_pt + jnp.sum(create_mask).astype(jnp.int32),
        kf_obs_pt=m.kf_obs_pt.at[kf_id, feat_idx].set(
            jnp.where(create_mask, ids, m.kf_obs_pt[kf_id, feat_idx]).astype(jnp.int32),
            mode="drop",
        ),
    )
    return m2, jnp.where(create_mask, ids, NO_POINT).astype(jnp.int32)


def rebuild_incidence(m: MapState) -> MapState:
    """Recompute kf_pt_inc and pt_obs from the observation table.

    Called at the end of every mapping / loop phase (AFTER culling and
    observation rebinds) so the cached incidence always reflects the final
    state of the phase; per-frame tracking and loop detection read the
    cache."""
    obs_ok = m.kf_valid[:, None] & m.kf_feat_valid & (m.kf_obs_pt >= 0)
    flat_k = jnp.repeat(jnp.arange(m.max_kf, dtype=jnp.int32), m.feat_cap)
    flat_p = jnp.where(obs_ok, m.kf_obs_pt, m.max_pt).reshape(-1)
    inc = jnp.zeros((m.max_kf, m.max_pt + 1), jnp.int8).at[flat_k, flat_p].set(
        1, mode="drop")[:, : m.max_pt]
    return m._replace(kf_pt_inc=inc,
                      pt_obs=jnp.sum(inc.astype(jnp.int32), axis=0))


def _inc_row(m: MapState, obs_pt: jnp.ndarray,
             feat_valid: jnp.ndarray) -> jnp.ndarray:
    """[P] int8 incidence row for one keyframe's observation row."""
    idx = jnp.where(feat_valid & (obs_pt >= 0), obs_pt, m.max_pt)
    return jnp.zeros(m.max_pt + 1, jnp.int8).at[idx].set(
        1, mode="drop")[: m.max_pt]


def covisibility_row_cached(m: MapState, pt_ids: jnp.ndarray) -> jnp.ndarray:
    """[K] shared-observation counts of a point-id set vs every keyframe,
    from the CACHED incidence matrix (one MXU matvec; ~20x cheaper than the
    gather-based covisibility_row).  The cache is refreshed per mapping
    phase — callers on the per-frame/loop-detection path tolerate (and the
    reference's asynchronously-updated covisibility graph has) that
    staleness window."""
    z = jnp.zeros(m.max_pt + 1, jnp.float32).at[
        jnp.where(pt_ids >= 0, pt_ids, m.max_pt)
    ].set(1.0, mode="drop")[: m.max_pt]
    counts = jnp.einsum(
        "kp,p->k", m.kf_pt_inc.astype(jnp.bfloat16), z.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return counts.astype(jnp.int32) * m.kf_valid


def covisibility_of_points_cached(m: MapState, pt_mask: jnp.ndarray) -> jnp.ndarray:
    """[K] count of points from a [P] bool mask observed by each keyframe
    (cached incidence matvec)."""
    counts = jnp.einsum(
        "kp,p->k", m.kf_pt_inc.astype(jnp.bfloat16),
        pt_mask.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return counts.astype(jnp.int32) * m.kf_valid


def covisibility_matrix_cached(m: MapState) -> jnp.ndarray:
    """[K, K] KF-KF shared-observation counts = inc @ inc.T (one MXU
    matmul)."""
    inc = m.kf_pt_inc.astype(jnp.bfloat16)
    C = jnp.einsum("kp,jp->kj", inc, inc,
                   preferred_element_type=jnp.float32).astype(jnp.int32)
    return C * m.kf_valid[:, None] * m.kf_valid[None, :]


def covisibility_row(m: MapState, pt_ids: jnp.ndarray) -> jnp.ndarray:
    """[K] count of shared observations between a point-id set and every KF.

    The on-demand replacement for the reference's stored covisibility weights
    (KeyFrame::GetBestCovisibilityKeyFrames).  pt_ids: [N] (-1 entries ignored).
    """
    indicator = jnp.zeros(m.max_pt + 2, bool)
    indicator = indicator.at[jnp.where(pt_ids >= 0, pt_ids, m.max_pt + 1)].set(
        True, mode="drop"
    )
    hits = indicator[jnp.clip(m.kf_obs_pt, 0, m.max_pt + 1)] & (m.kf_obs_pt >= 0)
    return jnp.sum(hits & m.kf_feat_valid, axis=1).astype(jnp.int32) * m.kf_valid


def points_of_keyframes_cached(m: MapState, kf_mask: jnp.ndarray) -> jnp.ndarray:
    """[P] bool from the cached incidence matrix (one matvec; see
    covisibility_row_cached for the staleness contract)."""
    s = jnp.einsum(
        "k,kp->p", kf_mask.astype(jnp.bfloat16),
        m.kf_pt_inc.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return (s > 0) & m.pt_valid


def points_of_keyframes(m: MapState, kf_mask: jnp.ndarray) -> jnp.ndarray:
    """[P] bool: points observed by any keyframe in kf_mask."""
    obs = jnp.where(kf_mask[:, None] & (m.kf_obs_pt >= 0), m.kf_obs_pt, m.max_pt + 1)
    indicator = jnp.zeros(m.max_pt + 2, bool).at[obs.reshape(-1)].set(True, mode="drop")
    return indicator[: m.max_pt] & m.pt_valid


def observation_count(m: MapState) -> jnp.ndarray:
    """[P] number of keyframes observing each point."""
    obs = jnp.where(
        m.kf_feat_valid & (m.kf_obs_pt >= 0) & m.kf_valid[:, None],
        m.kf_obs_pt, m.max_pt + 1,
    )
    counts = jnp.zeros(m.max_pt + 2, jnp.int32).at[obs.reshape(-1)].add(1, mode="drop")
    return counts[: m.max_pt]


def keyframe_positions(m: MapState) -> jnp.ndarray:
    """[K, 3] camera centers."""
    R = m.kf_Tcw[:, :3, :3]
    t = m.kf_Tcw[:, :3, 3]
    # c = -R^T t; einsum contracts over the row index of R.
    return -jnp.einsum("kij,ki->kj", R, t)
