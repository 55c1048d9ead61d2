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
