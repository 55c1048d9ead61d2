import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from self_commit_orb_slam2_tpu.ops import se3, sim3, triangulate
from self_commit_orb_slam2_tpu.ops.camera import CameraParams, backproject, project, undistort_points


def _rand_sim3(rng, n):
    R = Rotation.random(n, random_state=np.random.RandomState(1)).as_matrix().astype(np.float32)
    t = rng.normal(size=(n, 3)).astype(np.float32)
    s = np.exp(rng.normal(size=(n,)).astype(np.float32) * 0.3)
    return sim3.make(jnp.asarray(R), jnp.asarray(t), jnp.asarray(s))


def test_sim3_compose_inverse(rng):
    S = _rand_sim3(rng, 16)
    I = sim3.compose(S, sim3.inverse(S))
    np.testing.assert_allclose(np.asarray(sim3.scale(I)), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sim3.translation(I)), 0.0, atol=1e-4)
    R = np.asarray(sim3.rotation(I))
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-4)


def test_sim3_apply_matches_matrix(rng):
    S = _rand_sim3(rng, 8)
    pts = jnp.asarray(rng.normal(size=(8, 5, 3)).astype(np.float32))
    out = np.asarray(sim3.apply(S, pts))
    M = np.asarray(sim3.to_matrix(S))
    ref = np.einsum("bij,bnj->bni", M[:, :3, :3], np.asarray(pts)) + M[:, None, :3, 3]
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_sim3_exp_log_roundtrip(rng):
    xi = (rng.normal(size=(32, 7)) * 0.5).astype(np.float32)
    S = sim3.exp(jnp.asarray(xi))
    xi2 = np.asarray(sim3.log(S))
    np.testing.assert_allclose(xi, xi2, atol=2e-4)


def test_sim3_exp_zero_is_identity():
    S = sim3.exp(jnp.zeros((7,)))
    np.testing.assert_allclose(np.asarray(S), np.asarray(sim3.identity()), atol=1e-6)


def test_sim3_exp_reduces_to_se3():
    rng = np.random.default_rng(3)
    xi7 = (rng.normal(size=(16, 7)) * 0.5).astype(np.float32)
    xi7[:, 6] = 0.0  # zero log-scale
    S = sim3.exp(jnp.asarray(xi7))
    T = se3.se3_exp(jnp.asarray(xi7[:, :6]))
    np.testing.assert_allclose(np.asarray(sim3.to_matrix(S)), np.asarray(T), atol=1e-4)


CAM = CameraParams.create(fx=517.3, fy=516.5, cx=318.6, cy=255.3,
                          k1=0.2624, k2=-0.9531, p1=-0.0054, p2=0.0026, k3=1.1633,
                          bf=40.0, width=640, height=480)


def test_project_backproject_roundtrip(rng):
    depth = jnp.asarray(rng.uniform(0.5, 5.0, size=(100,)).astype(np.float32))
    uv = jnp.asarray(
        np.stack([rng.uniform(0, 640, 100), rng.uniform(0, 480, 100)], -1).astype(np.float32)
    )
    pts = backproject(CAM, uv, depth)
    uv2, z = project(CAM, pts)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-3)
    np.testing.assert_allclose(np.asarray(z), np.asarray(depth), atol=1e-5)


def test_undistort_inverts_distort(rng):
    from self_commit_orb_slam2_tpu.ops.camera import distort_normalized

    xn = jnp.asarray((rng.uniform(-0.3, 0.3, size=(50, 2))).astype(np.float32))
    xd = distort_normalized(CAM, xn)
    uv_dist = jnp.stack([CAM.fx * xd[:, 0] + CAM.cx, CAM.fy * xd[:, 1] + CAM.cy], -1)
    uv_und = undistort_points(CAM, uv_dist, iters=20)
    uv_true = np.stack(
        [np.asarray(CAM.fx) * np.asarray(xn[:, 0]) + np.asarray(CAM.cx),
         np.asarray(CAM.fy) * np.asarray(xn[:, 1]) + np.asarray(CAM.cy)], -1)
    np.testing.assert_allclose(np.asarray(uv_und), uv_true, atol=0.05)


def test_triangulate_exact(rng):
    cam = CameraParams.create(fx=500.0, fy=500.0, cx=320.0, cy=240.0)
    pts_w = rng.uniform(-1, 1, size=(200, 3)).astype(np.float32)
    pts_w[:, 2] += 4.0
    T1 = np.eye(4, dtype=np.float32)
    T2 = np.asarray(se3.se3_exp(jnp.asarray([0.3, 0.02, 0.01, 0.01, -0.05, 0.02], dtype=jnp.float32)))
    P1 = triangulate.projection_matrix(cam.K, jnp.asarray(T1))
    P2 = triangulate.projection_matrix(cam.K, jnp.asarray(T2))
    uv1, z1 = project(cam, jnp.asarray(pts_w))
    pc2 = np.asarray(pts_w) @ T2[:3, :3].T + T2[:3, 3]
    uv2, z2 = project(cam, jnp.asarray(pc2))
    est = triangulate.triangulate_linear(uv1, uv2, P1, P2)
    np.testing.assert_allclose(np.asarray(est), pts_w, atol=5e-2)
    gates = triangulate.triangulation_gates(
        cam, est, jnp.asarray(T1), jnp.asarray(T2), uv1, uv2,
        jnp.ones(200), jnp.ones(200), min_parallax_cos=0.99999,
    )
    assert np.asarray(gates).mean() > 0.95
