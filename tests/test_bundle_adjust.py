import jax
import jax.numpy as jnp
import numpy as np

from self_commit_orb_slam2_tpu.ops import se3
from self_commit_orb_slam2_tpu.ops.camera import CameraParams, project
from self_commit_orb_slam2_tpu.ops.optim.bundle_adjust import bundle_adjust

CAM = CameraParams.create(fx=400.0, fy=400.0, cx=320.0, cy=240.0, bf=40.0)


def make_ba_problem(rng, K=6, P=300, N=None, noise_px=0.3, stereo=True):
    """K cameras in an arc looking at a point cloud; every camera sees every
    point (dense obs grid)."""
    N = N or P
    pts = rng.uniform(-2, 2, (P, 3)).astype(np.float32)
    pts[:, 2] += 6.0
    poses = []
    for k in range(K):
        xi = np.array([0.4 * k, 0.02 * k, 0.05 * k, 0.01 * k, -0.04 * k, 0.01 * k], np.float32)
        poses.append(np.asarray(se3.se3_exp(jnp.asarray(xi * 0.3))))
    poses = np.stack(poses)

    obs_pt = np.tile(np.arange(P, dtype=np.int32), (K, 1))
    obs_uvr = np.zeros((K, P, 3), np.float32)
    for k in range(K):
        pc = pts @ poses[k][:3, :3].T + poses[k][:3, 3]
        uv, z = project(CAM, jnp.asarray(pc))
        uv = np.asarray(uv) + rng.normal(0, noise_px, (P, 2)).astype(np.float32)
        if stereo:
            ur = uv[:, 0] - np.asarray(CAM.bf) / pc[:, 2]
        else:
            ur = np.full(P, -1.0, np.float32)
        obs_uvr[k] = np.concatenate([uv, ur[:, None]], -1)
    return poses, pts, obs_pt, obs_uvr


def test_ba_recovers_perturbation(rng):
    K, P = 6, 300
    poses, pts, obs_pt, obs_uvr = make_ba_problem(rng, K, P, noise_px=0.0)
    # perturb everything except camera 0
    poses_n = poses.copy()
    for k in range(1, K):
        xi = rng.normal(0, 0.01, 6).astype(np.float32)
        poses_n[k] = np.asarray(se3.se3_exp(jnp.asarray(xi))) @ poses_n[k]
    pts_n = pts + rng.normal(0, 0.02, pts.shape).astype(np.float32)

    kf_free = jnp.asarray(np.arange(K) > 0)
    res = bundle_adjust(
        CAM, jnp.asarray(poses_n), jnp.asarray(pts_n),
        jnp.asarray(obs_pt), jnp.asarray(obs_uvr),
        jnp.ones((K, P), jnp.float32), jnp.ones((K, P), bool),
        kf_free, jnp.ones(P, bool),
    )
    for k in range(K):
        err = np.asarray(se3.se3_log(jnp.asarray(np.asarray(res.kf_Tcw)[k] @ np.linalg.inv(poses[k]))))
        assert np.linalg.norm(err) < 1e-3, f"cam {k} err {np.linalg.norm(err)}"
    assert np.abs(np.asarray(res.pt_pos) - pts).max() < 5e-3
    assert np.asarray(res.obs_inlier).mean() > 0.99


def test_ba_fixed_cameras_stay_fixed(rng):
    K, P = 4, 150
    poses, pts, obs_pt, obs_uvr = make_ba_problem(rng, K, P, noise_px=0.3)
    pts_n = pts + rng.normal(0, 0.02, pts.shape).astype(np.float32)
    kf_free = jnp.asarray(np.array([False, False, True, True]))
    res = bundle_adjust(
        CAM, jnp.asarray(poses), jnp.asarray(pts_n),
        jnp.asarray(obs_pt), jnp.asarray(obs_uvr),
        jnp.ones((K, P), jnp.float32), jnp.ones((K, P), bool),
        kf_free, jnp.ones(P, bool),
    )
    np.testing.assert_array_equal(np.asarray(res.kf_Tcw)[0], poses[0])
    np.testing.assert_array_equal(np.asarray(res.kf_Tcw)[1], poses[1])


def test_ba_rejects_outlier_observations(rng):
    K, P = 4, 200
    poses, pts, obs_pt, obs_uvr = make_ba_problem(rng, K, P, noise_px=0.3)
    # corrupt 5% of observations
    obs_uvr = obs_uvr.copy()
    bad = rng.random((K, P)) < 0.05
    obs_uvr[bad] += 50.0
    kf_free = jnp.asarray(np.arange(K) > 0)
    res = bundle_adjust(
        CAM, jnp.asarray(poses), jnp.asarray(pts),
        jnp.asarray(obs_pt), jnp.asarray(obs_uvr),
        jnp.ones((K, P), jnp.float32), jnp.ones((K, P), bool),
        kf_free, jnp.ones(P, bool),
    )
    inl = np.asarray(res.obs_inlier)
    assert inl[bad].mean() < 0.05, "outlier obs survived"
    assert inl[~bad].mean() > 0.95
    for k in range(K):
        err = np.asarray(se3.se3_log(jnp.asarray(np.asarray(res.kf_Tcw)[k] @ np.linalg.inv(poses[k]))))
        assert np.linalg.norm(err) < 5e-3


def test_ba_mono_observations(rng):
    K, P = 5, 250
    poses, pts, obs_pt, obs_uvr = make_ba_problem(rng, K, P, noise_px=0.2, stereo=False)
    poses_n = poses.copy()
    for k in range(1, K):
        xi = rng.normal(0, 0.005, 6).astype(np.float32)
        poses_n[k] = np.asarray(se3.se3_exp(jnp.asarray(xi))) @ poses_n[k]
    kf_free = jnp.asarray(np.arange(K) > 0)
    res = bundle_adjust(
        CAM, jnp.asarray(poses_n), jnp.asarray(pts),
        jnp.asarray(obs_pt), jnp.asarray(obs_uvr),
        jnp.ones((K, P), jnp.float32), jnp.ones((K, P), bool),
        kf_free, jnp.ones(P, bool),
    )
    # mono BA has gauge freedom in scale; check reprojection quality instead
    assert float(res.mean_chi2) < 0.5
    assert np.asarray(res.obs_inlier).mean() > 0.98


def test_ba_handles_missing_observations(rng):
    K, P = 4, 100
    poses, pts, obs_pt, obs_uvr = make_ba_problem(rng, K, P, noise_px=0.2)
    obs_pt = obs_pt.copy()
    drop = rng.random((K, P)) < 0.5
    obs_pt[drop] = -1
    kf_free = jnp.asarray(np.arange(K) > 0)
    res = bundle_adjust(
        CAM, jnp.asarray(poses), jnp.asarray(pts),
        jnp.asarray(obs_pt), jnp.asarray(obs_uvr),
        jnp.ones((K, P), jnp.float32), jnp.ones((K, P), bool),
        kf_free, jnp.ones(P, bool),
    )
    assert np.all(np.isfinite(np.asarray(res.kf_Tcw)))
    assert np.all(np.isfinite(np.asarray(res.pt_pos)))
    assert float(res.mean_chi2) < 1.0


def test_ba_budget_converges_at_kitti_geometry(rng):
    """The shipped local-BA iteration budget (3 pre + 5 post outlier-gate
    GN iterations, config.Capacities.ba_iters_*) must reach the same
    solution as the reference's 5+10 (g2o, Optimizer.cc:863-917) at KITTI
    geometry and feature density — round-3 review flagged that the halved
    budget was only ever validated on the small benchmark."""
    kitti_cam = CameraParams.create(fx=718.9, fy=718.9, cx=620.5, cy=188.0,
                                    bf=71.9, width=1241, height=376)
    K, P = 12, 2048  # a local-BA window at 2000-feature density
    pts = rng.uniform(-8, 8, (P, 3)).astype(np.float32)
    pts[:, 2] += 25.0  # KITTI-like depths
    poses = []
    for k in range(K):
        # forward motion ~1 m/keyframe with slight yaw (KITTI-like)
        xi = np.array([0.02 * k, 0.0, 1.0 * k, 0.0, 0.015 * k, 0.0],
                      np.float32)
        poses.append(np.asarray(se3.se3_exp(jnp.asarray(xi * 0.3))))
    poses = np.stack(poses)
    obs_pt = np.tile(np.arange(P, dtype=np.int32), (K, 1))
    obs_uvr = np.zeros((K, P, 3), np.float32)
    vis = np.zeros((K, P), bool)
    for k in range(K):
        pc = pts @ poses[k][:3, :3].T + poses[k][:3, 3]
        uv, z = project(kitti_cam, jnp.asarray(pc))
        uv = np.asarray(uv) + rng.normal(0, 0.5, (P, 2)).astype(np.float32)
        ur = uv[:, 0] - np.asarray(kitti_cam.bf) / np.maximum(pc[:, 2], 1e-3)
        obs_uvr[k] = np.concatenate([uv, ur[:, None]], -1)
        vis[k] = ((pc[:, 2] > 1.0) & (uv[:, 0] >= 0) & (uv[:, 0] < 1241)
                  & (uv[:, 1] >= 0) & (uv[:, 1] < 376))
    # drift-like perturbation: grows with k (what local BA actually faces)
    poses_n = poses.copy()
    for k in range(1, K):
        xi = rng.normal(0, 0.003 * k, 6).astype(np.float32)
        poses_n[k] = np.asarray(se3.se3_exp(jnp.asarray(xi))) @ poses_n[k]
    pts_n = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
    kf_free = jnp.asarray(np.arange(K) > 0)

    def run(pre, post):
        return bundle_adjust(
            kitti_cam, jnp.asarray(poses_n), jnp.asarray(pts_n),
            jnp.asarray(obs_pt), jnp.asarray(obs_uvr),
            jnp.ones((K, P), jnp.float32), jnp.asarray(vis),
            kf_free, jnp.ones(P, bool),
            n_iters_pre=pre, n_iters_post=post,
        )

    ours = run(3, 5)       # shipped budget (Capacities.ba_iters_pre/post)
    ref = run(5, 10)       # reference budget
    # both must recover ground truth; the cheap budget within 20% of the
    # reference budget's pose error (both should be sub-centimeter here)
    def pose_err(res):
        errs = []
        for k in range(1, K):
            d = np.asarray(res.kf_Tcw)[k] @ np.linalg.inv(poses[k])
            errs.append(np.linalg.norm(np.asarray(se3.se3_log(jnp.asarray(d)))))
        return float(np.max(errs))

    e_ours, e_ref = pose_err(ours), pose_err(ref)
    # ~8 mm worst-case over an 11 m window at 0.5 px observation noise and
    # 25 m depths: observation-noise-limited, not iteration-limited
    assert e_ref < 2e-2, f"reference budget failed to converge: {e_ref}"
    assert e_ours < max(1.2 * e_ref, 5e-3), (
        f"shipped 3+5 budget under-converges at KITTI geometry: "
        f"{e_ours:.5f} vs reference-budget {e_ref:.5f}")
    assert float(ours.mean_chi2) < 1.2 * float(ref.mean_chi2) + 1e-3
