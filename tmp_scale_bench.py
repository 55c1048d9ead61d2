import time, numpy as np, jax
from self_commit_orb_slam2_tpu.models.config import Capacities, SlamConfig, TrackingConfig
from self_commit_orb_slam2_tpu.models.system import System
from self_commit_orb_slam2_tpu.ops.camera import CameraParams
from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig
from self_commit_orb_slam2_tpu.utils.evaluation import ate_rmse
from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence

W, H, FX = 640, 480, 520.0
n_frames = 161
seq = generate_sequence(n_frames=n_frames, width=W, height=H, fx=FX, seed=5)
cam = CameraParams.create(fx=FX, fy=FX, cx=W/2, cy=H/2, bf=FX*0.1, width=W, height=H)
cfg = SlamConfig(camera=cam, orb=OrbConfig(n_features=1000),
                 caps=Capacities(max_keyframes=64, max_points=16384, local_points=1024),
                 tracking=TrackingConfig(max_frames_between_kf=10), sensor="rgbd")
slam = System(cfg)
nw = 8
B = (n_frames - 1) // nw
slam.track_batch_rgbd(seq.images[:1+B], seq.depths[:1+B], seq.timestamps[:1+B])
samples = []
print("compile window done", flush=True)
for w in range(1, nw):
    s = 1 + w * B
    t0 = time.perf_counter()
    slam.track_batch_rgbd(seq.images[s:s+B], seq.depths[s:s+B], seq.timestamps[s:s+B])
    samples.append(B / (time.perf_counter() - t0))
_, est = slam.get_trajectory()
ate = ate_rmse(est, seq.poses_gt[:len(est)])
print(f"640x480/1000feat: fps={max(samples):.1f} samples={[round(s,1) for s in samples]} ate={float(ate)*100:.2f}cm kf={slam.n_keyframes()}")
