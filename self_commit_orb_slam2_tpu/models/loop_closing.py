"""Loop closing: BoW detection, Sim3 verification, essential-graph correction.

TPU-native counterpart of the reference LoopClosing thread
(src/LoopClosing.cc) run as a pipelined phase after keyframe insertion:

  * DetectLoop (:133): dense BoW L1 scores against every keyframe, excluding
    covisible neighbors and the last 10 keyframes (cooldown), threshold =
    min score among covisible KFs (minScore :159-179).
  * ComputeSim3 (:337): node-constrained SearchByBoW between the two
    keyframes' map points -> 3D-3D pairs in camera frames -> batched Horn
    RANSAC over 3-point minimal sets (Sim3Solver.cc:199/309) with scale
    locked for stereo/RGB-D (bFixScale) -> all-inlier refit, accept >= 20.
  * CorrectLoop (:571): Sim3 pose-graph (essential graph) over sequential +
    covisibility + loop edges with the loop keyframe fixed
    (Optimizer::OptimizeEssentialGraph), pose recovery T = [R, t/s], and
    map-point remapping through each point's reference keyframe.
  * Optional synchronous global BA (:880, capacity-gated here).
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
N_HYPOTHESES = 128


class LoopDetection(NamedTuple):
    found: jnp.ndarray       # scalar bool
    cand_kf: jnp.ndarray     # scalar int32
    S_cur_cand: jnp.ndarray  # [8] Sim3 mapping cand-camera coords -> cur-camera
    n_inliers: jnp.ndarray
    cand_group: jnp.ndarray  # [K] bool: candidate's covisibility group (for
                             # consistency chaining, reference :229-305)


def detect_and_verify(
    config: SlamConfig, m: MapState, kf_id: jnp.ndarray, key: jnp.ndarray
) -> LoopDetection:
    cam = config.camera
    fix_scale = config.sensor != "mono"

    # ---- candidate retrieval (DetectLoop) ----
    counts = ms.covisibility_row(m, m.kf_obs_pt[kf_id])
    covis = counts > 0
    scores = bow_ops.l1_score(m.kf_bow[kf_id], m.kf_bow)
    covis_scores = jnp.where(covis & m.kf_valid, scores, jnp.inf)
    min_score = jnp.minimum(jnp.min(covis_scores), 1.0)
    eligible = (
        m.kf_valid
        & ~covis
        & (jnp.arange(m.max_kf) < kf_id - COOLDOWN)
    )
    cand_scores = jnp.where(eligible, scores, -jnp.inf)
    cand = jnp.argmax(cand_scores).astype(jnp.int32)
    has_cand = cand_scores[cand] >= jnp.maximum(min_score, 0.015)

    # ---- 3D-3D correspondences via SearchByBoW (ComputeSim3) ----
    cur_has = (m.kf_obs_pt[kf_id] >= 0) & m.kf_feat_valid[kf_id]
    cand_has = (m.kf_obs_pt[cand] >= 0) & m.kf_feat_valid[cand]
    node_mask = (
        (m.kf_node[kf_id][:, None] == m.kf_node[cand][None, :])
        & (m.kf_node[kf_id] >= 0)[:, None]
    )
    match = mcore.mutual_best_match(
        m.kf_desc[kf_id], m.kf_desc[cand], node_mask,
        cur_has, cand_has, max_dist=mcore.TH_LOW, ratio=0.75,
    )
    n_matches = jnp.sum(match.valid)

    pid_cur = jnp.clip(m.kf_obs_pt[kf_id], 0, m.max_pt - 1)
    j = jnp.where(match.valid, match.idx, 0)
    pid_cand = jnp.clip(m.kf_obs_pt[cand, j], 0, m.max_pt - 1)
    # camera-frame positions of the matched points in each keyframe
    p_cur = se3.transform_points(m.kf_Tcw[kf_id], m.pt_pos[pid_cur])
    p_cand = se3.transform_points(m.kf_Tcw[cand], m.pt_pos[pid_cand])
    w = match.valid.astype(jnp.float32)

    # ---- batched Horn RANSAC over 3-point sets ----
    n_feat = match.valid.shape[0]
    probs = w / jnp.maximum(jnp.sum(w), 1.0)
    sets = jax.random.choice(key, n_feat, shape=(N_HYPOTHESES, 3), replace=True, p=probs)
    s_h, R_h, t_h = horn_align(p_cand[sets], p_cur[sets], with_scale=not fix_scale)
    if fix_scale:
        s_h = jnp.ones_like(s_h)

    # inlier check: mutual reprojection (Sim3Solver::CheckInliers)
    def reproj_err(R, t, s, src, dst):
        pred = s * src @ R.T + t
        z = jnp.where(jnp.abs(pred[:, 2]) < 1e-6, 1e-6, pred[:, 2])
        u = cam.fx * pred[:, 0] / z + cam.cx
        v = cam.fy * pred[:, 1] / z + cam.cy
        zd = jnp.where(jnp.abs(dst[:, 2]) < 1e-6, 1e-6, dst[:, 2])
        ud = cam.fx * dst[:, 0] / zd + cam.cx
        vd = cam.fy * dst[:, 1] / zd + cam.cy
        return (u - ud) ** 2 + (v - vd) ** 2

    def hyp_inliers(s, R, t):
        e1 = reproj_err(R, t, s, p_cand, p_cur)
        Rt = R.T
        e2 = reproj_err(Rt, -Rt @ t / jnp.maximum(s, 1e-9), 1.0 / jnp.maximum(s, 1e-9),
                        p_cur, p_cand)
        return (e1 < 9.21) & (e2 < 9.21) & match.valid  # reference th2 ~ 9.21/10

    inl = jax.vmap(hyp_inliers)(s_h, R_h, t_h)
    n_inl = jnp.sum(inl, axis=1)
    best = jnp.argmax(n_inl)

    # all-inlier refit
    w_best = inl[best].astype(jnp.float32)
    s_f, R_f, t_f = horn_align(p_cand, p_cur, w_best, with_scale=not fix_scale)
    if fix_scale:
        s_f = jnp.ones_like(s_f)
    S = sim3.make(R_f, t_f, s_f)

    # GN polish with paired projection residuals (reference calls
    # Optimizer::OptimizeSim3 after the RANSAC solve, LoopClosing.cc:463)
    from ..ops.optim.sim3_opt import optimize_sim3

    uv_cur = m.kf_xy[kf_id]
    uv_cand = m.kf_xy[cand, jnp.clip(j, 0, m.feat_cap - 1)]
    opt = optimize_sim3(
        cam, S, p_cur, p_cand, uv_cur, uv_cand,
        match.valid & inl[best], fix_scale=fix_scale,
    )
    S = opt.S12
    final_inl = jnp.sum(hyp_inliers(sim3.scale(S), sim3.rotation(S), sim3.translation(S)))

    found = has_cand & (n_matches >= 20) & (final_inl >= MIN_SIM3_INLIERS)
    cand_counts = ms.covisibility_row(m, m.kf_obs_pt[cand])
    cand_group = (cand_counts > 0) | (jnp.arange(m.max_kf) == cand)
    return LoopDetection(
        found=found, cand_kf=cand, S_cur_cand=S,
        n_inliers=final_inl.astype(jnp.int32),
        cand_group=cand_group & m.kf_valid,
    )


def correct_loop(
    config: SlamConfig, m: MapState, kf_id: jnp.ndarray, det: LoopDetection
) -> MapState:
    """Essential-graph correction + map-point remapping (CorrectLoop)."""
    K = m.max_kf
    S_old = jax.vmap(sim3.from_se3)(m.kf_Tcw)

    # corrected pose of the current keyframe: Scw_corrected = S_cur_cand . Scand_w
    S_corr_cur = sim3.compose(det.S_cur_cand, S_old[det.cand_kf])
    S_init = S_old.at[kf_id].set(S_corr_cur)

    # ---- edges ----
    # sequential chain over valid keyframes (spanning-tree analogue)
    idx = jnp.arange(K, dtype=jnp.int32)
    seq_i = idx[1:]
    seq_j = idx[:-1]
    seq_valid = m.kf_valid[1:] & m.kf_valid[:-1]
    seq_meas = jax.vmap(
        lambda i, j: sim3.compose(S_old[i], sim3.inverse(S_old[j]))
    )(seq_i, seq_j)

    # strong covisibility edges (reference adds covisibility edges with
    # weight >= minFeat=100, Optimizer.cc:1183-1230): top-3 covisible
    # partners per keyframe above a shared-observation threshold
    def covis_edges(k):
        counts = ms.covisibility_row(m, m.kf_obs_pt[k])
        counts = counts.at[k].set(0)
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

    # loop edge: measured relative S_cur_cand
    loop_i = kf_id[None]
    loop_j = det.cand_kf[None]
    loop_meas = det.S_cur_cand[None]
    loop_valid = jnp.array([True])

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

    # ---- fuse loop-side points into the current keyframe now that poses
    # agree (reference SearchAndFuse, LoopClosing.cc:809)
    from .local_mapping import fuse_into_keyframe

    m = fuse_into_keyframe(config, m, kf_id)

    # ---- global bundle adjustment (reference RunGlobalBundleAdjustment,
    # LoopClosing.cc:880: 10 iterations after every loop closure).  The dense
    # Schur assembly scales with max_kf * max_pt; gate it so huge maps skip
    # (the sharded BA in parallel/ is the path for those).
    if config.tracking.enable_loop_gba and m.max_kf * m.max_pt <= 4 * 1024 * 1024:
        from ..ops.optim.bundle_adjust import bundle_adjust

        obs_uvr = jnp.concatenate([m.kf_xy, m.kf_uright[..., None]], axis=-1)
        sigma2 = jnp.asarray(config.orb.sigma2())[m.kf_level]
        kf_free = m.kf_valid & (jnp.arange(m.max_kf) != det.cand_kf) & (
            jnp.arange(m.max_kf) != 0
        )
        ba = bundle_adjust(
            config.camera, m.kf_Tcw, m.pt_pos, m.kf_obs_pt, obs_uvr, sigma2,
            m.kf_feat_valid & m.kf_valid[:, None], kf_free, m.pt_valid,
            n_iters_pre=4, n_iters_post=6, ur_weight=config.ur_weight,
        )
        m = m._replace(kf_Tcw=ba.kf_Tcw, pt_pos=ba.pt_pos)

    return m


class LoopCloser:
    def __init__(self, config: SlamConfig):
        self.config = config
        self.enabled = config.vocab is not None
        self.last_loop_kf = -999
        self.n_big_changes = 0   # reference Map::InformNewBigChange (Map.cc:111)
        # covisibility-consistency chaining state: list of (group mask,
        # chain length) from the previous keyframe's detection (reference
        # mvConsistentGroups, LoopClosing.cc:229-305)
        self._consistent_groups: list = []
        self._key = jax.random.PRNGKey(7)
        if self.enabled:
            self._jit_detect = jax.jit(functools.partial(detect_and_verify, config))
            self._jit_correct = jax.jit(
                functools.partial(correct_loop, config), donate_argnums=0
            )

    def process(self, m: MapState, kf_id) -> MapState:
        if not self.enabled:
            return m
        kf_id = jnp.asarray(kf_id, jnp.int32)
        if int(kf_id) - self.last_loop_kf < COOLDOWN:
            return m
        self._key, sub = jax.random.split(self._key)
        det = self._jit_detect(m, kf_id, sub)
        if bool(det.found):
            import numpy as np

            group = np.asarray(det.cand_group)
            chain = 1 + max(
                (n for g, n in self._consistent_groups if bool((g & group).any())),
                default=0,
            )
            self._consistent_groups = [(group, chain)]
            if chain >= self.config.tracking.loop_consistency_th:
                m = self._jit_correct(m, kf_id, det)
                self.last_loop_kf = int(kf_id)
                self.n_big_changes += 1
                self._consistent_groups = []
        else:
            self._consistent_groups = []
        return m
