import jax
import jax.numpy as jnp
import numpy as np

from self_commit_orb_slam2_tpu.ops import se3
from self_commit_orb_slam2_tpu.ops.camera import CameraParams, project
from self_commit_orb_slam2_tpu.ops.solvers.two_view import initialize_two_view

CAM = CameraParams.create(fx=400.0, fy=400.0, cx=320.0, cy=240.0)


def project_pair(pts_w, T2, noise, rng):
    uv1, z1 = project(CAM, jnp.asarray(pts_w))
    pc2 = pts_w @ np.asarray(T2)[:3, :3].T + np.asarray(T2)[:3, 3]
    uv2, z2 = project(CAM, jnp.asarray(pc2))
    uv1 = np.asarray(uv1) + rng.normal(0, noise, (len(pts_w), 2))
    uv2 = np.asarray(uv2) + rng.normal(0, noise, (len(pts_w), 2))
    return uv1.astype(np.float32), uv2.astype(np.float32)


def check_pose(T_est, T_true, tol_rot=0.01, tol_dir=0.05):
    # translation is up to scale in mono: compare direction + rotation
    R_err = np.asarray(se3.so3_log(jnp.asarray(
        np.asarray(T_est)[:3, :3] @ np.asarray(T_true)[:3, :3].T)))
    t_est = np.asarray(T_est)[:3, 3]
    t_true = np.asarray(T_true)[:3, 3]
    cos = abs(t_est @ t_true) / max(np.linalg.norm(t_est) * np.linalg.norm(t_true), 1e-12)
    assert np.linalg.norm(R_err) < tol_rot, f"rotation err {np.linalg.norm(R_err)}"
    assert cos > 1.0 - tol_dir, f"translation direction cos {cos}"


def test_general_scene_selects_fundamental(rng):
    pts = rng.uniform(-2, 2, (300, 3)).astype(np.float32)
    pts[:, 2] += 5.0 + rng.uniform(0, 3, 300).astype(np.float32)
    T2 = np.asarray(se3.se3_exp(jnp.asarray([0.5, 0.05, 0.1, 0.02, -0.04, 0.01])))
    uv1, uv2 = project_pair(pts, T2, 0.3, rng)
    res = initialize_two_view(CAM, jnp.asarray(uv1), jnp.asarray(uv2),
                              jnp.ones(300, bool), jax.random.PRNGKey(0))
    assert bool(res.success)
    assert not bool(res.used_homography)
    check_pose(res.Tcw2, T2)
    good = np.asarray(res.is_triangulated)
    assert good.sum() > 200
    # reconstructed points should match ground truth up to the scale factor
    est = np.asarray(res.points)[good]
    scale = np.median(np.linalg.norm(est, axis=1) / np.linalg.norm(pts[good], axis=1))
    np.testing.assert_allclose(est / scale, pts[good], rtol=0.06, atol=0.1)


def test_planar_scene_selects_homography(rng):
    # points on a plane z = 4 + 0.1x + 0.05y
    xy = rng.uniform(-2, 2, (300, 2)).astype(np.float32)
    z = 4.0 + 0.1 * xy[:, 0] + 0.05 * xy[:, 1]
    pts = np.concatenate([xy, z[:, None]], -1).astype(np.float32)
    T2 = np.asarray(se3.se3_exp(jnp.asarray([0.4, 0.0, 0.05, 0.01, -0.05, 0.02])))
    uv1, uv2 = project_pair(pts, T2, 0.3, rng)
    res = initialize_two_view(CAM, jnp.asarray(uv1), jnp.asarray(uv2),
                              jnp.ones(300, bool), jax.random.PRNGKey(1))
    assert bool(res.used_homography)
    assert bool(res.success)
    check_pose(res.Tcw2, T2, tol_rot=0.02)


def test_rejects_pure_rotation(rng):
    """No parallax -> reconstruction must not claim success."""
    pts = rng.uniform(-2, 2, (300, 3)).astype(np.float32)
    pts[:, 2] += 5.0
    T2 = np.asarray(se3.se3_exp(jnp.asarray([0.0, 0.0, 0.0, 0.02, -0.06, 0.01])))
    uv1, uv2 = project_pair(pts, T2, 0.3, rng)
    res = initialize_two_view(CAM, jnp.asarray(uv1), jnp.asarray(uv2),
                              jnp.ones(300, bool), jax.random.PRNGKey(2))
    assert not bool(res.success)


def test_robust_to_outliers(rng):
    pts = rng.uniform(-2, 2, (300, 3)).astype(np.float32)
    pts[:, 2] += 5.0 + rng.uniform(0, 3, 300).astype(np.float32)
    T2 = np.asarray(se3.se3_exp(jnp.asarray([0.5, 0.05, 0.1, 0.02, -0.04, 0.01])))
    uv1, uv2 = project_pair(pts, T2, 0.3, rng)
    bad = rng.choice(300, 60, replace=False)
    uv2[bad] = rng.uniform(0, 640, (60, 2)).astype(np.float32)
    res = initialize_two_view(CAM, jnp.asarray(uv1), jnp.asarray(uv2),
                              jnp.ones(300, bool), jax.random.PRNGKey(3))
    assert bool(res.success)
    check_pose(res.Tcw2, T2)
    good = np.asarray(res.is_triangulated)
    assert good[bad].sum() <= 3, "outliers marked triangulated"
