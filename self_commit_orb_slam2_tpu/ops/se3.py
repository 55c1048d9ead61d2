"""SE(3) / SO(3) Lie-group operations, batched and jit-friendly.

TPU-native replacement for the reference's pose algebra, which is spread over
cv::Mat arithmetic (reference src/Converter.cc:40-213, src/Frame.cc:518-560)
and g2o's SE3Quat (reference Thirdparty/g2o/g2o/types/se3quat.h).  Poses are
stored as [..., 4, 4] float32 homogeneous matrices (camera-from-world, `Tcw`,
matching the reference convention); tangent vectors are [..., 6] with layout
(rho, phi) = (translation, rotation), matching g2o's se3quat exp/log so the
optimizer update rules carry over.

All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(phi: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of [..., 3] vectors -> [..., 3, 3]."""
    x, y, z = phi[..., 0], phi[..., 1], phi[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(M: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: [..., 3, 3] -> [..., 3]."""
    return jnp.stack([M[..., 2, 1], M[..., 0, 2], M[..., 1, 0]], axis=-1)


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: [..., 3] axis-angle -> [..., 3, 3] rotation.

    Taylor expansions near theta=0 keep both values AND gradients finite
    (the non-taken sqrt/div branches are computed on `where`-sanitized
    inputs so reverse/forward AD never sees 0/0 or d(sqrt)/dx at 0 —
    required by the AD-based pose-graph Jacobians).
    """
    theta2 = jnp.sum(phi * phi, axis=-1)
    small = theta2 < 1e-8
    safe_t2 = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(safe_t2)
    K = hat(phi)
    KK = K @ K
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe_t2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * KK


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] rotation -> [..., 3] axis-angle (AD-safe at 0 and pi)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sin(theta) * axis
    sin2 = jnp.sum(w * w, axis=-1)              # = sin^2(theta)
    small = sin2 < 1e-10
    safe_sin = jnp.sqrt(jnp.where(small, 1.0, sin2))
    theta = jnp.arctan2(safe_sin, cos_t)
    # theta/sin(theta); series in sin2 for the small branch (theta ~ |w|)
    scale = jnp.where(small, 1.0 + sin2 / 6.0, theta / safe_sin)
    generic = w * scale[..., None]

    # Near theta = pi, w vanishes; recover axis from diagonal of R + I.
    near_pi = cos_t < -0.98
    theta = jnp.where(small & (cos_t < 0), jnp.pi, theta)  # sin~0, cos~-1
    B = (R + jnp.swapaxes(R, -1, -2)) * 0.5  # symmetric part
    diag = jnp.stack([B[..., 0, 0], B[..., 1, 1], B[..., 2, 2]], axis=-1)
    axis_sq = jnp.maximum((diag - cos_t[..., None]) / jnp.maximum(1.0 - cos_t[..., None], _EPS), 0.0)
    axis = jnp.sqrt(jnp.where(near_pi[..., None], jnp.maximum(axis_sq, _EPS), 1.0))
    # Fix signs using the off-diagonal skew part (w gives the sign of each component).
    sign = jnp.where(w >= 0.0, 1.0, -1.0)
    axis = axis * sign
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), _EPS)
    pi_branch = axis * theta[..., None]
    return jnp.where(near_pi[..., None], pi_branch, generic)


def _left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian J_l(phi), used by se3 exp (V matrix). AD-safe."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    small = theta2 < 1e-8
    safe_t2 = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(safe_t2)
    K = hat(phi)
    KK = K @ K
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe_t2)
    c = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / (safe_t2 * theta),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + b[..., None, None] * K + c[..., None, None] * KK


def _left_jacobian_inv(phi: jnp.ndarray) -> jnp.ndarray:
    theta2 = jnp.sum(phi * phi, axis=-1)
    small = theta2 < 1e-8
    safe_t2 = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(safe_t2)
    K = hat(phi)
    KK = K @ K
    half_theta = 0.5 * theta
    sin_half = jnp.sin(half_theta)
    cot = jnp.cos(half_theta) / jnp.where(small, 1.0, sin_half)
    coef = jnp.where(
        small, 1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half_theta * cot) / safe_t2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye - 0.5 * K + coef[..., None, None] * KK


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] (rho, phi) -> [..., 4, 4] homogeneous transform."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    t = jnp.einsum("...ij,...j->...i", _left_jacobian(phi), rho)
    return rt_to_mat(R, t)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """[..., 4, 4] -> [..., 6] (rho, phi)."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    phi = so3_log(R)
    rho = jnp.einsum("...ij,...j->...i", _left_jacobian_inv(phi), t)
    return jnp.concatenate([rho, phi], axis=-1)


def rt_to_mat(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3], [..., 3] -> [..., 4, 4]."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Inverse of [..., 4, 4] rigid transform (exploits orthogonality)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return rt_to_mat(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """A @ B for [..., 4, 4] transforms."""
    return A @ B


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply [..., 4, 4] to [..., N, 3] (or [N,3] with batched T) points."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def transform_point(T: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply [..., 4, 4] to a single [..., 3] point."""
    return jnp.einsum("...ij,...j->...i", T[..., :3, :3], p) + T[..., :3, 3]


def update_left(T: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Left-multiplicative update exp(xi) @ T (g2o vertex update convention)."""
    return se3_exp(xi) @ T


def normalize_rotation(T: jnp.ndarray) -> jnp.ndarray:
    """Re-orthonormalize the rotation block via SVD (drift control)."""
    R = T[..., :3, :3]
    U, _, Vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None], det[..., None]],
        axis=-1,
    )
    Rn = U @ (D[..., :, None] * Vt)
    return rt_to_mat(Rn, T[..., :3, 3])


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [..., 4] (x, y, z, w) -> rotation matrix [..., 3, 3]."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> unit quaternion [..., 4] (x, y, z, w).

    Branch-free Shepperd's method: compute all four candidate quaternions and
    select the best-conditioned one (matches TUM trajectory export needs,
    reference src/System.cc:414-550 uses Converter::toQuaternion).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates in (w, x, y, z), one per dominant component.
    c0 = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    c1 = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    c2 = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    c3 = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)  # [..., 4, 4] in (w,x,y,z)
    mags = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(mags, axis=-1)
    q_wxyz = jnp.take_along_axis(cands, best[..., None, None].repeat(4, axis=-1), axis=-2)[
        ..., 0, :
    ]
    q_wxyz = q_wxyz / jnp.maximum(jnp.linalg.norm(q_wxyz, axis=-1, keepdims=True), _EPS)
    # Convention: w >= 0.
    sign = jnp.where(q_wxyz[..., 0:1] < 0, -1.0, 1.0)
    q_wxyz = q_wxyz * sign
    return jnp.stack(
        [q_wxyz[..., 1], q_wxyz[..., 2], q_wxyz[..., 3], q_wxyz[..., 0]], axis=-1
    )
