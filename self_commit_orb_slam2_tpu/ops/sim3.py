"""Sim(3) similarity-transform algebra for loop closing.

TPU-native replacement for g2o::Sim3 (reference Thirdparty/g2o/g2o/types/sim3.h)
used by Sim3Solver / OptimizeSim3 / OptimizeEssentialGraph.  A Sim3 is stored
as a [..., 8] vector: (q_xyzw[4], t[3], s[1]); helpers convert to/from a 4x4
matrix with scaled rotation, matching the reference's `Scw` convention
(src/LoopClosing.cc:337-569).

Tangent space is [..., 7]: (rho[3], phi[3], sigma[1]) with exp following
Strasdat's "Scale Drift-Aware Large Scale Monocular SLAM" (the g2o sim3
implementation the reference links against).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import se3

_EPS = 1e-8


def make(R: jnp.ndarray, t: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Pack rotation [...,3,3], translation [...,3], scale [...] -> [...,8]."""
    q = se3.rot_to_quat(R)
    s = jnp.asarray(s, R.dtype)
    return jnp.concatenate([q, t, s[..., None]], axis=-1)


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([0, 0, 0, 1, 0, 0, 0, 1], dtype=dtype)


def rotation(S: jnp.ndarray) -> jnp.ndarray:
    return se3.quat_to_rot(S[..., :4])


def translation(S: jnp.ndarray) -> jnp.ndarray:
    return S[..., 4:7]


def scale(S: jnp.ndarray) -> jnp.ndarray:
    return S[..., 7]


def to_matrix(S: jnp.ndarray) -> jnp.ndarray:
    """[..., 8] -> [..., 4, 4] with top-left block s*R (reference Scw form)."""
    R = rotation(S)
    return se3.rt_to_mat(scale(S)[..., None, None] * R, translation(S))


def from_se3(T: jnp.ndarray, s=1.0) -> jnp.ndarray:
    return make(T[..., :3, :3], T[..., :3, 3], jnp.broadcast_to(jnp.asarray(s, T.dtype), T.shape[:-2]))


def to_se3(S: jnp.ndarray) -> jnp.ndarray:
    """Drop the scale: [R, t/s] as in the reference's pose recovery after
    essential-graph optimization (src/Optimizer.cc:1297-1320 region)."""
    R = rotation(S)
    t = translation(S) / jnp.maximum(scale(S)[..., None], _EPS)
    return se3.rt_to_mat(R, t)


def apply(S: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply [..., 8] to [..., N, 3] points: s R p + t."""
    R = rotation(S)
    return scale(S)[..., None, None] * jnp.einsum(
        "...ij,...nj->...ni", R, pts
    ) + translation(S)[..., None, :]


def apply_point(S: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    R = rotation(S)
    return scale(S)[..., None] * jnp.einsum("...ij,...j->...i", R, p) + translation(S)


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Group product A*B: (sA RA, tA) . (sB RB, tB) = (sA sB RA RB, sA RA tB + tA)."""
    RA, RB = rotation(A), rotation(B)
    sA, sB = scale(A), scale(B)
    R = RA @ RB
    t = sA[..., None] * jnp.einsum("...ij,...j->...i", RA, translation(B)) + translation(A)
    return make(R, t, sA * sB)


def inverse(S: jnp.ndarray) -> jnp.ndarray:
    R = rotation(S)
    s = scale(S)
    Rt = jnp.swapaxes(R, -1, -2)
    t = -jnp.einsum("...ij,...j->...i", Rt, translation(S)) / jnp.maximum(s[..., None], _EPS)
    return make(Rt, t, 1.0 / jnp.maximum(s, _EPS))


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Tangent [..., 7] (rho, phi, sigma) -> Sim3 [..., 8].

    W-matrix closed form (Strasdat thesis / g2o sim3.h): t = W rho,
    W = a I + b Omega + c Omega^2 with sigma/theta-dependent coefficients.
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = se3.so3_exp(phi)
    theta2 = jnp.sum(phi * phi, axis=-1)
    Om = se3.hat(phi)
    Om2 = Om @ Om

    eps = 1e-5
    sigma_small = jnp.abs(sigma) < eps
    theta_small = theta2 < eps * eps
    # AD-safe: sqrt and divisions only ever see sanitized inputs
    safe_theta = jnp.sqrt(jnp.where(theta_small, 1.0, theta2))
    theta = jnp.where(theta_small, 0.0, safe_theta)
    safe_sigma = jnp.where(sigma_small, 1.0, sigma)
    safe_t2s2 = safe_theta * safe_theta + safe_sigma * safe_sigma

    # Coefficients per the four (sigma, theta) small/large cases.
    # Case A: sigma ~ 0, theta ~ 0
    A_a, A_b, A_c = jnp.ones_like(sigma), 0.5 * jnp.ones_like(sigma), jnp.full_like(sigma, 1.0 / 6.0)
    # Case B: sigma ~ 0, theta large
    B_a = jnp.ones_like(sigma)
    B_b = (1.0 - jnp.cos(safe_theta)) / (safe_theta * safe_theta)
    B_c = (safe_theta - jnp.sin(safe_theta)) / (safe_theta * safe_theta * safe_theta)
    # Case C: sigma large, theta ~ 0
    C_a = (s - 1.0) / safe_sigma
    C_b = ((s - 1.0) - safe_sigma) / (safe_sigma * safe_sigma) + 0.5 * jnp.zeros_like(sigma)
    # Proper expansion: b -> (sigma - 1 + (1+... )) use limit theta->0 of general formula:
    # b = (a - cos(theta)*s_term...) ; use series: b = s*(sigma-1)+1 over sigma^2? Keep g2o form:
    C_b = ((safe_sigma - 1.0) * s + 1.0) / (safe_sigma * safe_sigma)
    C_c = ((0.5 * safe_sigma * safe_sigma - safe_sigma + 1.0) * s - 1.0) / (
        safe_sigma * safe_sigma * safe_sigma
    )
    # Case D: both large (general closed form)
    sin_t, cos_t = jnp.sin(safe_theta), jnp.cos(safe_theta)
    D_a = (s - 1.0) / safe_sigma
    D_b = (
        (safe_sigma * (s * sin_t) + (1.0 - s * cos_t) * safe_theta)
        / (safe_theta * safe_t2s2)
    )
    D_c = (
        D_a
        - ((s * cos_t - 1.0) * safe_sigma + s * sin_t * safe_theta) / safe_t2s2
    ) / (safe_theta * safe_theta)

    a = jnp.where(sigma_small, jnp.where(theta_small, A_a, B_a), jnp.where(theta_small, C_a, D_a))
    b = jnp.where(sigma_small, jnp.where(theta_small, A_b, B_b), jnp.where(theta_small, C_b, D_b))
    c = jnp.where(sigma_small, jnp.where(theta_small, A_c, B_c), jnp.where(theta_small, C_c, D_c))

    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), Om.shape)
    W = a[..., None, None] * eye + b[..., None, None] * Om + c[..., None, None] * Om2
    t = jnp.einsum("...ij,...j->...i", W, rho)
    return make(R, t, s)


def log(S: jnp.ndarray) -> jnp.ndarray:
    """Sim3 [..., 8] -> tangent [..., 7]. Inverse of exp via solving W rho = t."""
    R = rotation(S)
    s = scale(S)
    sigma = jnp.log(jnp.maximum(s, _EPS))
    phi = se3.so3_log(R)
    # Rebuild W with the same coefficients as exp and solve the 3x3 system.
    xi_rot = jnp.concatenate(
        [jnp.zeros_like(phi), phi, sigma[..., None]], axis=-1
    )
    # Reuse exp's W by computing it on a dummy rho basis: W = [exp applied to e_i].
    W_cols = []
    for i in range(3):
        e = jnp.zeros_like(phi).at[..., i].set(1.0)
        xi_i = jnp.concatenate([e, phi, sigma[..., None]], axis=-1)
        W_cols.append(translation(exp(xi_i)))
    W = jnp.stack(W_cols, axis=-1)  # [..., 3, 3]
    rho = jnp.linalg.solve(W, translation(S)[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)
