import jax
import jax.numpy as jnp
import numpy as np

from self_commit_orb_slam2_tpu.ops import se3
from self_commit_orb_slam2_tpu.ops.camera import CameraParams, project
from self_commit_orb_slam2_tpu.ops.optim.pose_opt import pose_optimize

CAM = CameraParams.create(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=50.0)


def make_problem(rng, n=200, noise=0.5, outlier_frac=0.0, stereo=True):
    pts_w = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    pts_w[:, 2] += 5.0
    T_true = np.asarray(
        se3.se3_exp(jnp.asarray([0.1, -0.05, 0.2, 0.03, -0.02, 0.05], dtype=jnp.float32))
    )
    pc = pts_w @ T_true[:3, :3].T + T_true[:3, 3]
    uv, z = project(CAM, jnp.asarray(pc))
    uv = np.asarray(uv) + rng.normal(0, noise, (n, 2)).astype(np.float32)
    if stereo:
        ur = uv[:, 0] - np.asarray(CAM.bf) / pc[:, 2] + rng.normal(0, noise, n).astype(np.float32)
    else:
        ur = np.full(n, -1.0, np.float32)
    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, n_out, replace=False)
    uv[out_idx] += rng.uniform(20, 80, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    obs = np.concatenate([uv, ur[:, None]], axis=-1).astype(np.float32)
    return T_true, jnp.asarray(pts_w), jnp.asarray(obs), out_idx


def pose_err(T1, T2):
    d = np.asarray(se3.se3_log(jnp.asarray(T1) @ jnp.linalg.inv(T2)))
    return np.linalg.norm(d)


def test_pose_opt_converges_stereo(rng):
    T_true, pts, obs, _ = make_problem(rng, noise=0.3)
    T0 = se3.se3_exp(jnp.asarray([0.15, 0.0, 0.1, 0.05, 0.0, 0.0])) @ jnp.asarray(T_true)
    res = pose_optimize(CAM, T0, pts, obs, jnp.ones(200), jnp.ones(200, bool))
    assert pose_err(np.asarray(res.Tcw), T_true) < 0.01
    assert int(res.n_inliers) > 190


def test_pose_opt_converges_mono(rng):
    T_true, pts, obs, _ = make_problem(rng, noise=0.3, stereo=False)
    T0 = se3.se3_exp(jnp.asarray([0.1, -0.05, 0.05, 0.02, 0.03, -0.01])) @ jnp.asarray(T_true)
    res = pose_optimize(CAM, T0, pts, obs, jnp.ones(200), jnp.ones(200, bool))
    assert pose_err(np.asarray(res.Tcw), T_true) < 0.01
    assert int(res.n_inliers) > 190


def test_pose_opt_rejects_outliers(rng):
    T_true, pts, obs, out_idx = make_problem(rng, noise=0.3, outlier_frac=0.25)
    T0 = se3.se3_exp(jnp.asarray([0.05, 0.02, -0.05, 0.01, -0.02, 0.02])) @ jnp.asarray(T_true)
    res = pose_optimize(CAM, T0, pts, obs, jnp.ones(200), jnp.ones(200, bool))
    assert pose_err(np.asarray(res.Tcw), T_true) < 0.02
    inl = np.asarray(res.inliers)
    assert not inl[out_idx].any(), "outliers classified as inliers"
    assert inl.sum() > 130


def test_pose_opt_perfect_data_exact(rng):
    T_true, pts, obs, _ = make_problem(rng, noise=0.0)
    T0 = se3.se3_exp(jnp.asarray([0.2, -0.1, 0.15, 0.08, 0.05, -0.06])) @ jnp.asarray(T_true)
    res = pose_optimize(CAM, T0, pts, obs, jnp.ones(200), jnp.ones(200, bool))
    assert pose_err(np.asarray(res.Tcw), T_true) < 1e-4
    assert int(res.n_inliers) == 200


def test_pose_opt_respects_valid_mask(rng):
    T_true, pts, obs, _ = make_problem(rng, noise=0.3)
    valid = jnp.asarray(np.arange(200) < 100)
    # corrupt the invalid half wildly — must not affect the solution
    obs_np = np.array(obs)
    obs_np[100:] += 500.0
    res = pose_optimize(CAM, jnp.asarray(T_true), pts, jnp.asarray(obs_np), jnp.ones(200), valid)
    assert pose_err(np.asarray(res.Tcw), T_true) < 0.01
    assert int(res.n_inliers) <= 100


def test_pose_opt_jit_compiles(rng):
    T_true, pts, obs, _ = make_problem(rng)
    f = jax.jit(lambda T0: pose_optimize(CAM, T0, pts, obs, jnp.ones(200), jnp.ones(200, bool)))
    r1 = f(jnp.asarray(T_true))
    r2 = f(jnp.asarray(T_true))
    np.testing.assert_allclose(np.asarray(r1.Tcw), np.asarray(r2.Tcw))
