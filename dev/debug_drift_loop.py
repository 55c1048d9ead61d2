#!/usr/bin/env python
"""Instrumented gradual-drift loop run (CPU)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from self_commit_orb_slam2_tpu.models.config import Capacities, SlamConfig, TrackingConfig
from self_commit_orb_slam2_tpu.models.system import System
from self_commit_orb_slam2_tpu.ops import se3 as se3_ops
from self_commit_orb_slam2_tpu.ops.bow import train_vocabulary
from self_commit_orb_slam2_tpu.ops.camera import CameraParams
from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig, extract
from self_commit_orb_slam2_tpu.utils.evaluation import ate_rmse
from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence, spin_trajectory

n = 150
traj = spin_trajectory(n, frames_per_rev=108)
seq = generate_sequence(n_frames=n, width=320, height=240, seed=9,
                        trajectory=traj)
cfg_orb = OrbConfig(n_features=300)
descs = []
for i in range(0, 108, 6):
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
slam = System(cfg)

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


big = 0
errs = []
for i in range(n):
    slam.track_rgbd(seq.images[i], seq.depths[i], float(seq.timestamps[i]))
    if 10 <= i < 95:
        displace()
    if slam._loop_closer.n_big_changes != big:
        big = slam._loop_closer.n_big_changes
        print(f"frame {i}: LOOP FIRED (#{big}) at kf_counter="
              f"{slam._loop_closer._kf_counter}")
    # live error vs gt
    est = np.asarray(slam.Tcw)
    c_est = -est[:3, :3].T @ est[:3, 3]
    g = seq.poses_gt[i]
    c_gt = -g[:3, :3].T @ g[:3, 3]
    errs.append(np.linalg.norm(c_est - c_gt))

print("live |err| every 10:",
      [round(float(e), 3) for e in errs[::10]])
_, corrected = slam.get_trajectory()
raw = np.stack([p for _, p in slam.trajectory])
print("kf", slam.n_keyframes(), "loops", big)
print("raw ate", round(ate_rmse(raw, seq.poses_gt), 4))
print("corr ate", round(ate_rmse(corrected, seq.poses_gt), 4))
# per-frame corrected error after alignment
from self_commit_orb_slam2_tpu.utils.evaluation import umeyama_alignment
def centers(poses):
    R = poses[:, :3, :3]; t = poses[:, :3, 3]
    return -np.einsum("nij,ni->nj", R, t)
ce = centers(np.asarray(corrected, np.float64)); cg = centers(np.asarray(seq.poses_gt, np.float64))
s, R, t = umeyama_alignment(ce, cg)
al = (R @ ce.T).T + t
e = np.linalg.norm(al - cg, axis=1)
print("corr |err| every 10:", [round(float(x), 3) for x in e[::10]])
# keyframe-level ATE: are the keyframe poses themselves corrected?
m = slam.map
kfv = np.asarray(m.kf_valid)
kfp = np.asarray(m.kf_Tcw)[kfv]
kfid = np.asarray(m.kf_frame_id)[kfv]
gtp = seq.poses_gt[np.clip(kfid, 0, n - 1)]
print("kf ate", round(ate_rmse(kfp, gtp), 4), "n_kf_live", int(kfv.sum()))
ck = centers(np.asarray(kfp, np.float64)); cgk = centers(np.asarray(gtp, np.float64))
s2, R2, t2 = umeyama_alignment(ck, cgk)
alk = (R2 @ ck.T).T + t2
ek = np.linalg.norm(alk - cgk, axis=1)
order = np.argsort(kfid)
print("kf err by time:", [round(float(x),3) for x in ek[order]])
