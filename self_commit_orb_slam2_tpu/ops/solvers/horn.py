"""Horn 1987 closed-form absolute orientation (3D-3D alignment), batched.

TPU-native core of the reference Sim3Solver (src/Sim3Solver.cc:309-448
ComputeSim3: quaternion from the 4x4 N-matrix eigenvector, optional scale)
and the control-point alignment step of EPnP.  Batched over leading dims so
hundreds of RANSAC hypotheses solve in one eigh call.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import se3


def horn_align(
    src: jnp.ndarray, dst: jnp.ndarray, weights: jnp.ndarray | None = None,
    with_scale: bool = False,
):
    """Least-squares (s, R, t) with dst ~= s R src + t.

    src/dst: [..., N, 3]; weights: [..., N] optional.
    Returns (s [...], R [..., 3, 3], t [..., 3]).
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], src.dtype)
    w = weights[..., None]
    n = jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True)[..., None], 1e-9)
    mu_s = jnp.sum(src * w, axis=-2, keepdims=True) / n
    mu_d = jnp.sum(dst * w, axis=-2, keepdims=True) / n
    xs = (src - mu_s) * w
    xd = dst - mu_d

    # cross-covariance M = sum xs_i xd_i^T  (src -> dst)
    M = jnp.einsum("...ni,...nj->...ij", xs, xd)
    Sxx, Sxy, Sxz = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    Syx, Syy, Syz = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    Szx, Szy, Szz = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]

    # Horn's 4x4 N matrix (quaternion w, x, y, z)
    N = jnp.stack(
        [
            jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
            jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
            jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
            jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
        ],
        axis=-2,
    )
    vals, vecs = jnp.linalg.eigh(N)
    q_wxyz = vecs[..., :, -1]  # largest eigenvalue
    q_xyzw = jnp.stack(
        [q_wxyz[..., 1], q_wxyz[..., 2], q_wxyz[..., 3], q_wxyz[..., 0]], -1
    )
    R = se3.quat_to_rot(q_xyzw)

    if with_scale:
        # symmetric scale (reference Sim3Solver.cc:430 uses Horn's ratio)
        num = jnp.einsum("...ni,...ni->...", xd * weights[..., None], jnp.einsum(
            "...ij,...nj->...ni", R, src - mu_s))
        den = jnp.sum(jnp.sum((src - mu_s) ** 2, -1) * weights, -1)
        s = num / jnp.maximum(den, 1e-12)
    else:
        s = jnp.ones(M.shape[:-2], src.dtype)

    t = mu_d[..., 0, :] - s[..., None] * jnp.einsum(
        "...ij,...j->...i", R, mu_s[..., 0, :]
    )
    return s, R, t
