import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from self_commit_orb_slam2_tpu.ops import se3


def random_rotations(rng, n):
    return Rotation.random(n, random_state=np.random.RandomState(0)).as_matrix().astype(np.float32)


def test_so3_exp_matches_scipy(rng):
    phi = rng.normal(size=(32, 3)).astype(np.float32)
    R = np.asarray(se3.so3_exp(jnp.asarray(phi)))
    R_ref = Rotation.from_rotvec(phi).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_so3_log_roundtrip(rng):
    R = random_rotations(rng, 64)
    phi = np.asarray(se3.so3_log(jnp.asarray(R)))
    R2 = np.asarray(se3.so3_exp(jnp.asarray(phi)))
    np.testing.assert_allclose(R, R2, atol=2e-5)


def test_so3_log_near_pi():
    # Rotation by ~pi around a skew axis: the hard branch.
    axis = np.array([1.0, 2.0, -0.5])
    axis /= np.linalg.norm(axis)
    for angle in [np.pi - 1e-3, np.pi - 1e-5]:
        R = Rotation.from_rotvec(axis * angle).as_matrix().astype(np.float32)
        phi = np.asarray(se3.so3_log(jnp.asarray(R)))
        R2 = Rotation.from_rotvec(phi).as_matrix()
        np.testing.assert_allclose(R, R2, atol=1e-4)


def test_so3_exp_small_angle():
    phi = jnp.array([[1e-9, 0, 0], [0.0, 0.0, 0.0]])
    R = np.asarray(se3.so3_exp(phi))
    np.testing.assert_allclose(R[1], np.eye(3), atol=1e-7)
    assert np.all(np.isfinite(R))


def test_se3_exp_log_roundtrip(rng):
    xi = (rng.normal(size=(32, 6)) * 0.8).astype(np.float32)
    T = se3.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(se3.se3_log(T))
    np.testing.assert_allclose(xi, xi2, atol=1e-4)


def test_inverse_compose(rng):
    xi = rng.normal(size=(8, 6)).astype(np.float32) * 0.5
    T = se3.se3_exp(jnp.asarray(xi))
    I = np.asarray(se3.compose(T, se3.inverse(T)))
    np.testing.assert_allclose(I, np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-5)


def test_transform_points(rng):
    xi = rng.normal(size=(6,)).astype(np.float32) * 0.3
    T = se3.se3_exp(jnp.asarray(xi))
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    out = np.asarray(se3.transform_points(T, jnp.asarray(pts)))
    Tn = np.asarray(T)
    ref = pts @ Tn[:3, :3].T + Tn[:3, 3]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_quat_roundtrip(rng):
    R = random_rotations(rng, 64)
    q = np.asarray(se3.rot_to_quat(jnp.asarray(R)))
    # scipy uses xyzw too
    R2 = Rotation.from_quat(q).as_matrix()
    np.testing.assert_allclose(R, R2, atol=1e-5)
    # unit norm, positive w
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)
    assert np.all(q[:, 3] >= 0)


def test_quat_to_rot_matches_scipy(rng):
    q = rng.normal(size=(32, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R = np.asarray(se3.quat_to_rot(jnp.asarray(q)))
    R_ref = Rotation.from_quat(q).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_normalize_rotation(rng):
    xi = rng.normal(size=(4, 6)).astype(np.float32) * 0.5
    T = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    T_noisy = T.copy()
    T_noisy[..., :3, :3] += rng.normal(size=(4, 3, 3)).astype(np.float32) * 1e-3
    Tn = np.asarray(se3.normalize_rotation(jnp.asarray(T_noisy)))
    R = Tn[..., :3, :3]
    np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
