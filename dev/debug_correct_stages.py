#!/usr/bin/env python
"""Stage-by-stage dissection of correct_loop on the gradual-drift scenario."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from self_commit_orb_slam2_tpu.models import loop_closing as lc
from self_commit_orb_slam2_tpu.models import map_state as ms
from self_commit_orb_slam2_tpu.models.config import Capacities, SlamConfig, TrackingConfig
from self_commit_orb_slam2_tpu.models.system import System
from self_commit_orb_slam2_tpu.ops import se3 as se3_ops, sim3
from self_commit_orb_slam2_tpu.ops.bow import train_vocabulary
from self_commit_orb_slam2_tpu.ops.camera import CameraParams
from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig, extract
from self_commit_orb_slam2_tpu.utils.evaluation import ate_rmse
from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence, spin_trajectory

n = 100
traj = spin_trajectory(n, frames_per_rev=72)
seq = generate_sequence(n_frames=n, width=320, height=240, seed=9,
                        trajectory=traj)
cfg_orb = OrbConfig(n_features=300)
descs = []
for i in range(0, 72, 6):
    f = extract(jnp.asarray(seq.images[i]), cfg_orb)
    descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
vocab = train_vocabulary(np.concatenate(descs), k=8, L=3, seed=3)

cam = CameraParams.create(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                          bf=26.0, width=320, height=240)
cfg = SlamConfig(
    camera=cam, orb=OrbConfig(n_features=500),
    caps=Capacities(max_keyframes=48, max_points=16384, local_points=1024),
    tracking=TrackingConfig(max_frames_between_kf=6, enable_loop_gba=True),
    sensor="rgbd", vocab=vocab,
)
# no loop closing during the run: we dissect the first correction manually
slam = System(cfg, enable_loop_closing=False)

dD = np.asarray(se3_ops.se3_exp(jnp.asarray(
    [0.0012, 0.0003, -0.0006, 0.0, 0.001, 0.0], jnp.float32)), np.float64)


def displace(keep_recent=6):
    m = slam.map
    kf_seq = np.asarray(m.kf_seq)
    cutoff = kf_seq.max() - keep_recent
    kf_sel = (kf_seq >= 0) & (kf_seq <= cutoff) & np.asarray(m.kf_valid)
    pt_sel = (np.asarray(m.pt_first_kf) <= cutoff) & np.asarray(m.pt_valid)
    Dinv = jnp.asarray(np.linalg.inv(dD).astype(np.float32))
    R = jnp.asarray(dD[:3, :3].astype(np.float32))
    t = jnp.asarray(dD[:3, 3].astype(np.float32))
    slam.map = m._replace(
        kf_Tcw=jnp.where(jnp.asarray(kf_sel)[:, None, None],
                         m.kf_Tcw @ Dinv, m.kf_Tcw),
        pt_pos=jnp.where(jnp.asarray(pt_sel)[:, None],
                         m.pt_pos @ R.T + t, m.pt_pos),
        pt_normal=jnp.where(jnp.asarray(pt_sel)[:, None],
                            m.pt_normal @ R.T, m.pt_normal),
    )


STOP = 92
for i in range(STOP):
    slam.track_rgbd(seq.images[i], seq.depths[i], float(seq.timestamps[i]))
    if 10 <= i < 90:
        displace()

m = slam.map
kf_id = ms.latest_kf(m)
print("kfs", slam.n_keyframes(), "latest slot", int(kf_id))


def kf_ate(m):
    kfv = np.asarray(m.kf_valid)
    kfp = np.asarray(m.kf_Tcw)[kfv]
    kfid = np.asarray(m.kf_frame_id)[kfv]
    return ate_rmse(kfp, seq.poses_gt[np.clip(kfid, 0, n - 1)])


print("kf ate BEFORE:", round(kf_ate(m), 4))

key = jax.random.PRNGKey(3)
det = lc.detect_and_verify(cfg, m, kf_id, key)
print("det found", bool(det.found), "inliers", int(det.n_inliers),
      "n_proj", int(det.n_proj), "cand", int(det.cand_kf))
# true relative Sim3 between current KF and candidate (from GT):
fi_cur = int(m.kf_frame_id[kf_id]); fi_cand = int(m.kf_frame_id[det.cand_kf])
S_true = np.asarray(seq.poses_gt[fi_cur] @ np.linalg.inv(seq.poses_gt[fi_cand]))
S_meas = np.asarray(sim3.to_se3(jnp.asarray(det.S_cur_cand)))
err = S_meas @ np.linalg.inv(S_true)
ang = np.degrees(np.arccos(np.clip((np.trace(err[:3, :3]) - 1) / 2, -1, 1)))
print("loop edge error: |t|", round(float(np.linalg.norm(err[:3, 3])), 4),
      "rot deg", round(float(ang), 3))

if bool(det.found):
    # --- stage 1: pose graph only ---
    import self_commit_orb_slam2_tpu.models.loop_closing as L

    # replicate correct_loop but stop before fuse/GBA
    cfg_nogba = cfg._replace(tracking=cfg.tracking._replace(enable_loop_gba=False))

    # monkeypatch _search_and_fuse_loop off to isolate the graph
    orig_fuse = L._search_and_fuse_loop
    L._search_and_fuse_loop = lambda c, mm, k, d: mm
    m1 = lc.correct_loop(cfg_nogba, m, kf_id, det)
    print("kf ate after POSE GRAPH:", round(kf_ate(m1), 4))

    # --- stage 2: + fuse ---
    L._search_and_fuse_loop = orig_fuse
    m2 = lc.correct_loop(cfg_nogba, m, kf_id, det)
    print("kf ate after GRAPH+FUSE:", round(kf_ate(m2), 4))
    # count cross bindings
    def cross_bindings(mm):
        seqs = np.asarray(mm.kf_seq)
        obs = np.asarray(mm.kf_obs_pt)
        first = np.asarray(mm.pt_first_kf)
        tot = 0
        for k in range(mm.max_kf):
            if not np.asarray(mm.kf_valid)[k] or seqs[k] < 10:
                continue
            ids = obs[k]
            ok = ids >= 0
            tot += int(np.sum(first[np.clip(ids, 0, mm.max_pt - 1)][ok] < 4))
        return tot
    print("cross-sector bindings before:", cross_bindings(m),
          "after fuse:", cross_bindings(m2))

    # --- stage 3: + GBA ---
    m3 = lc.correct_loop(cfg, m, kf_id, det)
    print("kf ate after GRAPH+FUSE+GBA:", round(kf_ate(m3), 4))
