"""Monocular map initialization.

TPU-native counterpart of Tracking::MonocularInitialization +
CreateInitialMapMonocular (reference src/Tracking.cc:886-1180) and
ORBmatcher::SearchForInitialization (src/ORBmatcher.cc:515):

  * wide windowed mutual matching between the two bootstrap frames,
  * batched H/F RANSAC + motion recovery (ops/solvers/two_view.py),
  * initial map: two keyframes + triangulated points, refined by a short
    full BA and normalized to median scene depth 1 (reference :1081-1116).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import se3
from ..ops.matching import core as mcore
from ..ops.optim.bundle_adjust import bundle_adjust
from ..ops.solvers.two_view import initialize_two_view
from . import map_state as ms
from .config import SlamConfig
from .frame import FrameData
from .map_state import NO_POINT, MapState
from . import pipeline


class MonoInitResult(NamedTuple):
    success: jnp.ndarray
    n_matches: jnp.ndarray
    m: MapState
    carry: pipeline.TrackCarry


def try_initialize(
    config: SlamConfig,
    m: MapState,
    f1: FrameData,
    f2: FrameData,
    timestamp1: jnp.ndarray,
    timestamp2: jnp.ndarray,
    frame_id2: jnp.ndarray,
    key: jnp.ndarray,
) -> MonoInitResult:
    # --- SearchForInitialization: 100px windows, mutual best, ratio 0.9 ---
    radius = jnp.full(f1.capacity, 100.0)
    wmask = mcore.window_mask(f1.xy, f2.xy, radius)
    # the reference restricts init matching to octave 0 (ORBmatcher.cc:540)
    l0 = (f1.level == 0)[:, None] & (f2.level == 0)[None, :]
    match = mcore.mutual_best_match(
        f1.desc, f2.desc, wmask & l0, f1.valid, f2.valid,
        max_dist=mcore.TH_LOW, ratio=0.9,
    )
    keep = mcore.rotation_consistency_mask(f1.angle, f2.angle, match)
    match = match._replace(valid=keep)
    n_matches = jnp.sum(match.valid)

    j = jnp.where(match.valid, match.idx, 0)
    uv1 = f1.xy
    uv2 = f2.xy[j]
    res = initialize_two_view(
        config.camera, uv1, uv2, match.valid, key, n_hypotheses=256,
        min_points=config.tracking.mono_init_min_points,
        min_parallax=config.tracking.mono_init_min_parallax,
    )
    good = res.is_triangulated & match.valid

    # --- median-depth normalization (reference :1087-1116) ---
    z = res.points[:, 2]
    z_sorted = jnp.sort(jnp.where(good, z, jnp.inf))
    n_good = jnp.sum(good)
    med = z_sorted[jnp.clip(n_good // 2, 0, z.shape[0] - 1)]
    inv_med = 1.0 / jnp.maximum(med, 1e-6)
    pts = res.points * inv_med
    Tcw2 = res.Tcw2.at[:3, 3].multiply(inv_med)

    # --- doubled-budget bootstrap downselect -------------------------------
    # The reference extracts 2x nFeatures before the map exists
    # (mpIniORBextractor, src/Tracking.cc:121-124, used at :387-406) so the
    # two-view bootstrap sees a dense candidate set.  System feeds such
    # doubled frames here; matching/RANSAC/triangulation above ran at the
    # full doubled capacity, and the N best features per frame (triangulated
    # ones first, then by response) are kept for the fixed-capacity map rows.
    N = config.orb.feat_capacity()
    if f1.capacity > N:
        key1 = good.astype(jnp.float32) * 1e9 + f1.response
        _, idx1 = jax.lax.top_k(jnp.where(f1.valid, key1, -jnp.inf), N)
        prio2 = jnp.zeros(f2.capacity, bool).at[
            jnp.where(good, j, f2.capacity + 1)].set(True, mode="drop")
        key2 = prio2.astype(jnp.float32) * 1e9 + f2.response
        _, idx2 = jax.lax.top_k(jnp.where(f2.valid, key2, -jnp.inf), N)
        inv2 = jnp.full(f2.capacity, -1, jnp.int32).at[idx2].set(
            jnp.arange(N, dtype=jnp.int32))
        f1 = jax.tree.map(lambda a: a[idx1], f1)
        f2 = jax.tree.map(lambda a: a[idx2], f2)
        pts = pts[idx1]
        j = inv2[j[idx1]]
        good = good[idx1] & (j >= 0)
        j = jnp.clip(j, 0, N - 1)

    # --- build the two-keyframe map ---
    obs_none = jnp.full(f1.capacity, NO_POINT, jnp.int32)
    from .tracking import _frame_bow

    bow1 = _frame_bow(config, f1)
    bow2 = _frame_bow(config, f2)
    m1, kf1 = ms.insert_keyframe(
        m, f1, jnp.eye(4, dtype=jnp.float32), jnp.int32(0), timestamp1,
        obs_none, *bow1,
    )
    m1, kf2 = ms.insert_keyframe(
        m1, f2, Tcw2, frame_id2.astype(jnp.int32), timestamp2, obs_none, *bow2,
    )
    feat_idx = jnp.arange(f1.capacity, dtype=jnp.int32)
    m1, new_ids = ms.add_points(m1, config, kf1, feat_idx, pts, good)
    # bind second-view observations
    tgt = jnp.where(good & (new_ids >= 0), j, m1.feat_cap + 1)
    m1 = m1._replace(
        kf_obs_pt=m1.kf_obs_pt.at[kf2, tgt].set(new_ids, mode="drop")
    )
    m1 = ms.rebuild_incidence(m1)  # direct rebind above: refresh the cache

    # --- short full BA over the 2-KF map (reference runs GBA 20 iters) ---
    sel = jnp.stack([kf1, kf2])
    Pl = min(m1.max_pt, f1.capacity)
    lut = jnp.full(m1.max_pt + 2, -1, jnp.int32)
    cand = jnp.where(new_ids >= 0, new_ids, m1.max_pt + 1)
    lut = lut.at[cand].set(
        jnp.arange(f1.capacity, dtype=jnp.int32), mode="drop"
    )
    obs_pt_l = lut[jnp.clip(m1.kf_obs_pt[sel], 0, m1.max_pt + 1)]
    obs_pt_l = jnp.where(m1.kf_obs_pt[sel] >= 0, obs_pt_l, -1)
    obs_uvr = jnp.concatenate(
        [m1.kf_xy[sel], m1.kf_uright[sel][..., None]], axis=-1
    )
    sigma2 = jnp.asarray(config.orb.sigma2())[m1.kf_level[sel]]
    ba = bundle_adjust(
        config.camera, m1.kf_Tcw[sel],
        m1.pt_pos[jnp.clip(jnp.where(new_ids >= 0, new_ids, 0), 0, m1.max_pt - 1)],
        obs_pt_l, obs_uvr, sigma2, m1.kf_feat_valid[sel],
        jnp.array([False, True]), new_ids >= 0,
        n_iters_pre=5, n_iters_post=10,
    )
    m1 = m1._replace(
        kf_Tcw=m1.kf_Tcw.at[kf2].set(ba.kf_Tcw[1]),
        pt_pos=m1.pt_pos.at[jnp.where(new_ids >= 0, new_ids, m1.max_pt + 1)].set(
            ba.pt_pos, mode="drop"
        ),
    )

    tcfg = config.tracking
    success = (
        res.success
        & (n_matches >= tcfg.mono_init_min_matches)
        & (res.n_good >= tcfg.mono_init_min_points)
    )
    carry = pipeline.init_carry(config, f2)
    obs2 = m1.kf_obs_pt[kf2]
    carry = carry._replace(
        Tcw=ba.kf_Tcw[1],
        last_obs_pt=obs2,
        last_obs_birth=jnp.where(
            obs2 >= 0, m1.pt_birth[jnp.clip(obs2, 0, m1.max_pt - 1)], 0),
        frame_id=frame_id2.astype(jnp.int32) + 1,
        last_kf_frame_id=frame_id2.astype(jnp.int32),
        prev_inliers=res.n_good.astype(jnp.int32),
    )
    # if init failed, hand back the untouched map
    m_out = jax.tree.map(
        lambda a, b: jnp.where(jnp.reshape(success, (1,) * a.ndim), a, b), m1, m
    )
    return MonoInitResult(success=success, n_matches=n_matches, m=m_out, carry=carry)
