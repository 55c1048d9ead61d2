"""Asynchronous global BA: snapshot dispatch, merge-back, abort semantics.

The reference runs post-loop GBA in a detached 5th thread and folds the
result back under the map mutex when it finishes — keyframes created while
GBA ran are corrected through the spanning tree, newer map points through
their reference keyframes (reference src/LoopClosing.cc:797,880-1010); a
newer loop aborts a stale in-flight GBA (mbStopGBA, :586-593).  Our
analogue: LoopCloser._dispatch_gba on a map snapshot + merge_gba
(models/loop_closing.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from self_commit_orb_slam2_tpu.models import map_state as ms
from self_commit_orb_slam2_tpu.models.loop_closing import merge_gba
from self_commit_orb_slam2_tpu.models.system import System
from self_commit_orb_slam2_tpu.ops import se3
from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence
from tests.test_slam_rgbd import make_config


def _system_after(seq, n):
    slam = System(make_config())
    for i in range(n):
        slam.track_rgbd(seq.images[i], seq.depths[i], float(i) / 30.0)
    return slam


@pytest.mark.slow
def test_merge_gba_applies_result_and_corrects_new_keyframes():
    seq = generate_sequence(n_frames=30, width=320, height=240, seed=5)
    slam = _system_after(seq, 16)

    # snapshot at "GBA launch"
    snap_seq = jnp.copy(slam.map.kf_seq)
    snap_birth = jnp.copy(slam.map.pt_birth)
    snap_valid = np.asarray(slam.map.kf_valid).copy()
    n_kf_snap = slam.n_keyframes()

    # simulated GBA result: every snapshot pose/point moved by a known rigid
    # delta D (as if GBA had bent the whole map)
    D = np.asarray(se3.se3_exp(jnp.asarray(
        [0.05, -0.02, 0.03, 0.0, 0.04, 0.0], jnp.float32)))
    Dj = jnp.asarray(D)
    Dinv = jnp.asarray(np.linalg.inv(D).astype(np.float32))
    gba_T = slam.map.kf_Tcw @ Dinv          # Tcw' = Tcw D^-1: world moves by D
    gba_p = slam.map.pt_pos @ Dj[:3, :3].T + Dj[:3, 3]

    # keep tracking: new keyframes + points are created WHILE "GBA runs"
    for i in range(16, 30):
        slam.track_rgbd(seq.images[i], seq.depths[i], float(i) / 30.0)
    assert slam.n_keyframes() > n_kf_snap, "no new keyframes during GBA"

    m_before = slam.map
    m = merge_gba(m_before, snap_seq, snap_birth, gba_T, gba_p)

    kf_seq = np.asarray(m.kf_seq)
    kf_valid = np.asarray(m.kf_valid)
    in_snap = np.isin(kf_seq, np.asarray(snap_seq)[snap_valid]) & kf_valid
    # (a) snapshot keyframes took the GBA poses exactly
    np.testing.assert_allclose(
        np.asarray(m.kf_Tcw)[in_snap], np.asarray(gba_T)[in_snap], atol=1e-5)
    # (b) keyframes created during GBA moved consistently: their relative
    # pose to the tree parent is preserved while the parent moved by D
    new_kf = kf_valid & ~in_snap
    assert new_kf.sum() > 0
    T_old = np.asarray(m_before.kf_Tcw)
    T_new = np.asarray(m.kf_Tcw)
    parents = np.asarray(m.kf_tree_parent_seq)
    for i in np.nonzero(new_kf)[0]:
        ps = parents[i]
        pl = np.nonzero((kf_seq == ps) & kf_valid)[0]
        if len(pl) == 0:
            continue
        p = pl[0]
        rel_old = T_old[i] @ np.linalg.inv(T_old[p])
        rel_new = T_new[i] @ np.linalg.inv(T_new[p])
        np.testing.assert_allclose(rel_new, rel_old, atol=1e-4)
    # (c) points: snapshot points took GBA positions; all LIVE points ended
    # in the moved world (new points were remapped via their reference KF)
    pt_valid = np.asarray(m.pt_valid)
    pt_in_snap = (np.asarray(snap_birth) == np.asarray(m.pt_birth)) & pt_valid
    np.testing.assert_allclose(
        np.asarray(m.pt_pos)[pt_in_snap], np.asarray(gba_p)[pt_in_snap],
        atol=1e-5)


@pytest.mark.slow
def test_async_gba_fires_in_stream_and_merges():
    """End-to-end: a loop fires mid-STREAM (batched mode), the correction
    lands without a blocking GBA, and the GBA result is merged by a later
    drain (or the final forced one).  Mirrors the reference behavior where
    Tracking never waits for the GBA thread."""
    from tests.test_loop_closing import (
        _displace_old_map, make_config as loop_config,
    )
    from self_commit_orb_slam2_tpu.ops.bow import train_vocabulary
    from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig, extract
    from self_commit_orb_slam2_tpu.utils.synthetic import spin_trajectory

    n = 100
    traj = spin_trajectory(n, frames_per_rev=72)
    seq = generate_sequence(n_frames=n, width=320, height=240, seed=9,
                            trajectory=traj)
    cfgv = OrbConfig(n_features=300)
    descs = []
    for i in range(0, 72, 6):
        f = extract(jnp.asarray(seq.images[i]), cfgv)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    vocab = train_vocabulary(np.concatenate(descs), k=8, L=3, seed=3)

    cfg = loop_config(vocab)
    cfg = cfg._replace(tracking=cfg.tracking._replace(enable_loop_gba=True))
    slam = System(cfg)
    mid = 72 - 12
    for i in range(mid):
        slam.track_rgbd(seq.images[i], seq.depths[i],
                        float(seq.timestamps[i]))
    D = np.eye(4, dtype=np.float64)
    D[:3, 3] = [0.12, 0.0, -0.08]
    _displace_old_map(slam, slam.n_keyframes() - 2, D)
    slam.track_batch_rgbd(seq.images[mid:], seq.depths[mid:],
                          seq.timestamps[mid:])
    assert slam._loop_closer.last_loop_kf > 0, "no loop closure in stream"
    # the async GBA completed and was merged (info recorded at merge time)
    assert slam._loop_closer.last_gba_info.get("gba_path") == "dense"
    assert slam._loop_closer._pending_gba is None
    assert slam.state == 1


@pytest.mark.slow
def test_sliced_gba_converges_like_one_shot():
    """The sliced path (one GN iteration per dispatch, per-slice chi2
    re-gating) must reduce map error comparably to the one-shot 4+6
    program it replaces."""
    from self_commit_orb_slam2_tpu.models.loop_closing import (
        GBA_SLICES, global_bundle_adjust, global_bundle_adjust_slice,
    )

    seq = generate_sequence(n_frames=16, width=320, height=240, seed=5)
    slam = _system_after(seq, 16)
    m = slam.map
    cfg = slam.config

    # perturb poses+points so GBA has real work
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    m_noisy = m._replace(
        kf_Tcw=m.kf_Tcw.at[:, :3, 3].add(
            0.01 * jax.random.normal(k1, m.kf_Tcw[:, :3, 3].shape)),
        pt_pos=m.pt_pos + 0.01 * jax.random.normal(k2, m.pt_pos.shape),
    )

    def mean_reproj(mm, T, p):
        from self_commit_orb_slam2_tpu.ops.camera import project
        ok = mm.kf_valid[:, None] & mm.kf_feat_valid & (mm.kf_obs_pt >= 0)
        pid = jnp.clip(mm.kf_obs_pt, 0, mm.max_pt - 1)
        pw = p[pid]
        pc = jnp.einsum("kij,knj->kni", T[:, :3, :3], pw) + T[:, None, :3, 3]
        uv, z = jax.vmap(lambda x: project(cfg.camera, x))(pc)
        err = jnp.linalg.norm(uv - mm.kf_xy, axis=-1)
        sel = ok & (z > 0)
        return float(jnp.sum(jnp.where(sel, err, 0)) / jnp.maximum(
            jnp.sum(sel), 1))

    e0 = mean_reproj(m_noisy, m_noisy.kf_Tcw, m_noisy.pt_pos)
    T1, p1 = global_bundle_adjust(cfg, m_noisy, jnp.int32(0))
    e_one = mean_reproj(m_noisy, T1, p1)

    T, p = jnp.copy(m_noisy.kf_Tcw), jnp.copy(m_noisy.pt_pos)
    for huber in GBA_SLICES:
        T, p = global_bundle_adjust_slice(cfg, m_noisy, T, p, jnp.int32(0),
                                          huber=huber)
    e_sliced = mean_reproj(m_noisy, T, p)
    print(f"reproj err: init={e0:.3f} one-shot={e_one:.3f} "
          f"sliced={e_sliced:.3f}")
    assert e_sliced < 0.5 * e0, "sliced GBA failed to reduce map error"
    assert e_sliced < e_one * 1.5 + 0.05, (
        "sliced GBA converges much worse than the one-shot program")
