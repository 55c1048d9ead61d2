"""Pinhole camera model: projection, distortion, stereo, frustum checks.

TPU-native replacement for the reference's camera math scattered across
Frame (reference src/Frame.cc:608-706 isInFrustum, :899-965 UndistortKeyPoints
via cv::undistortPoints, :1464 UnprojectStereo) and the projection code inside
ORBmatcher/Optimizer.  Everything here is batched over points and jit-safe.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CameraParams(NamedTuple):
    """Static camera intrinsics as plain Python floats.

    Mirrors the settings-YAML block the reference parses in
    src/Tracking.cc:93-218: fx fy cx cy, radial/tangential distortion
    k1 k2 p1 p2 k3, stereo baseline*fx (`bf`), and image size.

    Kept as Python scalars (not device arrays) on purpose: jit closes over
    them as compile-time constants, so chi2 thresholds, depth cutoffs etc.
    derived from them stay static (JAX >= 0.9 turns closure-captured arrays
    into tracers, which would poison host-side float() uses).
    """

    fx: float
    fy: float
    cx: float
    cy: float
    k1: float
    k2: float
    p1: float
    p2: float
    k3: float
    bf: float  # baseline * fx  (0 for monocular)
    width: int
    height: int

    @staticmethod
    def create(fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0, bf=0.0,
               width=640, height=480) -> "CameraParams":
        return CameraParams(float(fx), float(fy), float(cx), float(cy),
                            float(k1), float(k2), float(p1), float(p2),
                            float(k3), float(bf), int(width), int(height))

    @property
    def baseline(self) -> float:
        return self.bf / self.fx

    @property
    def K(self) -> jnp.ndarray:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )

    @property
    def has_distortion(self) -> bool:
        return abs(self.k1) + abs(self.k2) + abs(self.p1) + abs(self.p2) + abs(self.k3) > 0


def project(cam: CameraParams, pts_cam: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project camera-frame points [..., 3] to pixels [..., 2]; also return depth.

    No distortion is applied: like the reference, matching/optimization operate
    in the undistorted pixel domain (keypoints are undistorted once at
    extraction, reference src/Frame.cc:899).
    """
    z = pts_cam[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * pts_cam[..., 0] * inv_z + cam.cx
    v = cam.fy * pts_cam[..., 1] * inv_z + cam.cy
    return jnp.stack([u, v], axis=-1), z


def project_stereo(cam: CameraParams, pts_cam: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project to (u, v, u_right) triples: u_right = u - bf/z.

    Matches the stereo observation model of reference
    g2o EdgeStereoSE3ProjectXYZ (Thirdparty/g2o/g2o/types/types_six_dof_expmap.h).
    """
    uv, z = project(cam, pts_cam)
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    ur = uv[..., 0] - cam.bf * inv_z
    return jnp.concatenate([uv, ur[..., None]], axis=-1), z


def backproject(cam: CameraParams, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Pixels [..., 2] + depth [...] -> camera-frame points [..., 3].

    Reference: Frame::UnprojectStereo (src/Frame.cc:1464).
    """
    x = (uv[..., 0] - cam.cx) / cam.fx * depth
    y = (uv[..., 1] - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def distort_normalized(cam: CameraParams, xn: jnp.ndarray) -> jnp.ndarray:
    """Apply radial-tangential distortion to normalized coords [..., 2]."""
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + cam.k1 * r2 + cam.k2 * r2 * r2 + cam.k3 * r2 * r2 * r2
    xd = x * radial + 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(cam: CameraParams, uv: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Undistort pixel coords [..., 2] by fixed-point iteration.

    Equivalent of cv::undistortPoints as used by Frame::UndistortKeyPoints
    (reference src/Frame.cc:899-936).  Fixed iteration count keeps it jit-
    compilable; 8 iterations matches OpenCV's default termination behavior
    for moderate distortion.
    """
    xd = jnp.stack([(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1)

    def body(_, xn):
        x, y = xn[..., 0], xn[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + cam.k1 * r2 + cam.k2 * r2 * r2 + cam.k3 * r2 * r2 * r2
        dx = 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
        dy = cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
        inv_r = 1.0 / jnp.maximum(radial, 1e-6)
        return jnp.stack([(xd[..., 0] - dx) * inv_r, (xd[..., 1] - dy) * inv_r], axis=-1)

    xn = jax.lax.fori_loop(0, iters, body, xd)
    u = cam.fx * xn[..., 0] + cam.cx
    v = cam.fy * xn[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


def compute_image_bounds(cam: CameraParams) -> tuple[float, float, float, float]:
    """Undistorted image bounds (min_x, max_x, min_y, max_y).

    Reference: Frame::ComputeImageBounds (src/Frame.cc:967-1023) undistorts
    the four corners.  Host-side helper (returns Python floats via device get).
    """
    corners = jnp.array(
        [[0.0, 0.0], [cam.width, 0.0], [0.0, cam.height], [cam.width, cam.height]],
        dtype=jnp.float32,
    )
    und = undistort_points(cam, corners)
    min_x = float(jnp.minimum(und[0, 0], und[2, 0]))
    max_x = float(jnp.maximum(und[1, 0], und[3, 0]))
    min_y = float(jnp.minimum(und[0, 1], und[1, 1]))
    max_y = float(jnp.maximum(und[2, 1], und[3, 1]))
    return min_x, max_x, min_y, max_y


def in_frustum(
    cam: CameraParams,
    Tcw: jnp.ndarray,
    pts_w: jnp.ndarray,
    normals_w: jnp.ndarray,
    min_dist: jnp.ndarray,
    max_dist: jnp.ndarray,
    bounds: tuple[float, float, float, float],
    view_cos_limit: float = 0.5,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched frustum + viewing-angle + distance-band check for map points.

    Returns (visible_mask [N], uv [N,2], dist [N], view_cos [N]).
    Reference: Frame::isInFrustum (src/Frame.cc:608-706): positive depth,
    inside undistorted image bounds, distance within the point's scale-
    invariance band [0.8 dmin, 1.2 dmax], and viewing cos > 0.5.
    """
    R = Tcw[:3, :3]
    t = Tcw[:3, 3]
    pc = pts_w @ R.T + t
    uv, z = project(cam, pc)
    min_x, max_x, min_y, max_y = bounds
    cam_center = -R.T @ t
    po = pts_w - cam_center
    dist = jnp.linalg.norm(po, axis=-1)
    view_cos = jnp.sum(po * normals_w, axis=-1) / jnp.maximum(dist, 1e-9)
    ok = (
        (z > 0.0)
        & (uv[..., 0] >= min_x)
        & (uv[..., 0] <= max_x)
        & (uv[..., 1] >= min_y)
        & (uv[..., 1] <= max_y)
        & (dist >= min_dist)
        & (dist <= max_dist)
        & (view_cos > view_cos_limit)
    )
    return ok, uv, dist, view_cos
