import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from self_commit_orb_slam2_tpu.ops import se3
from self_commit_orb_slam2_tpu.ops.camera import CameraParams, project
from self_commit_orb_slam2_tpu.ops.solvers.epnp import pnp_ransac
from self_commit_orb_slam2_tpu.ops.solvers.horn import horn_align

CAM = CameraParams.create(fx=450.0, fy=450.0, cx=320.0, cy=240.0)


def test_horn_rigid(rng):
    src = rng.normal(size=(4, 50, 3)).astype(np.float32)
    R_true = Rotation.random(4, random_state=3).as_matrix().astype(np.float32)
    t_true = rng.normal(size=(4, 3)).astype(np.float32)
    dst = np.einsum("bij,bnj->bni", R_true, src) + t_true[:, None]
    s, R, t = horn_align(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-5)


def test_horn_with_scale(rng):
    src = rng.normal(size=(50, 3)).astype(np.float32)
    R_true = Rotation.random(1, random_state=4).as_matrix()[0].astype(np.float32)
    dst = 2.5 * src @ R_true.T + np.array([1.0, -0.5, 2.0], np.float32)
    s, R, t = horn_align(jnp.asarray(src), jnp.asarray(dst), with_scale=True)
    np.testing.assert_allclose(float(s), 2.5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-4)


def test_horn_weighted_ignores_outliers(rng):
    src = rng.normal(size=(60, 3)).astype(np.float32)
    R_true = Rotation.random(1, random_state=5).as_matrix()[0].astype(np.float32)
    dst = src @ R_true.T + 0.5
    dst[:10] += rng.normal(0, 5.0, (10, 3))  # corrupted
    w = np.ones(60, np.float32)
    w[:10] = 0.0
    s, R, t = horn_align(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-4)


def make_pnp_problem(rng, n=150, noise=0.5, outlier_frac=0.0):
    pts_w = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    pts_w[:, 2] += 8.0
    T = np.asarray(se3.se3_exp(jnp.asarray([0.4, -0.2, 0.6, 0.15, -0.1, 0.2])))
    pc = pts_w @ T[:3, :3].T + T[:3, 3]
    uv, _ = project(CAM, jnp.asarray(pc))
    uv = np.asarray(uv) + rng.normal(0, noise, (n, 2)).astype(np.float32)
    n_out = int(n * outlier_frac)
    bad = rng.choice(n, n_out, replace=False)
    uv[bad] = rng.uniform(0, 640, (n_out, 2))
    return T, jnp.asarray(pts_w), jnp.asarray(uv.astype(np.float32)), bad


def test_pnp_clean(rng):
    T_true, pts, uv, _ = make_pnp_problem(rng, noise=0.3)
    res = pnp_ransac(CAM, pts, uv, jnp.ones(150, bool), jnp.ones(150),
                     jax.random.PRNGKey(0))
    assert bool(res.success)
    err = np.asarray(se3.se3_log(jnp.asarray(np.asarray(res.Tcw) @ np.linalg.inv(T_true))))
    assert np.linalg.norm(err) < 0.05, np.linalg.norm(err)
    assert int(res.n_inliers) > 130


def test_pnp_with_outliers(rng):
    T_true, pts, uv, bad = make_pnp_problem(rng, noise=0.3, outlier_frac=0.4)
    res = pnp_ransac(CAM, pts, uv, jnp.ones(150, bool), jnp.ones(150),
                     jax.random.PRNGKey(1))
    assert bool(res.success)
    err = np.asarray(se3.se3_log(jnp.asarray(np.asarray(res.Tcw) @ np.linalg.inv(T_true))))
    assert np.linalg.norm(err) < 0.08, np.linalg.norm(err)
    inl = np.asarray(res.inliers)
    assert inl[bad].mean() < 0.1


def test_pnp_fails_gracefully(rng):
    """Pure garbage correspondences must not report success."""
    pts = jnp.asarray(rng.uniform(-3, 3, (100, 3)).astype(np.float32) + [0, 0, 8])
    uv = jnp.asarray(rng.uniform(0, 640, (100, 2)).astype(np.float32))
    res = pnp_ransac(CAM, pts, uv, jnp.ones(100, bool), jnp.ones(100),
                     jax.random.PRNGKey(2), min_inliers=20)
    assert not bool(res.success)
