"""Per-frame data object: features + stereo depth + pose, as a pytree.

TPU-native counterpart of the reference Frame (src/Frame.cc): construction
runs ORB extraction, keypoint undistortion and stereo/RGB-D depth association
in one jit-compiled call.  No feature grid is kept — windowed searches use
dense masked tables (ops/matching/core.py) instead of the 64x48 bucket grid
(reference src/Frame.h:55-60).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.camera import CameraParams, backproject, undistort_points
from ..ops.orb.pyramid import level_shapes
from ..ops.matching import stereo as stereo_ops
from ..ops.orb import extractor as orb_extractor
from .config import SlamConfig


class FrameData(NamedTuple):
    """All static-shape, capacity = config.orb feature budget."""

    xy: jnp.ndarray        # [N, 2] undistorted level-0 pixel coords
    xy_raw: jnp.ndarray    # [N, 2] distorted coords (for descriptor/grid ops)
    response: jnp.ndarray  # [N]
    angle: jnp.ndarray     # [N] radians
    level: jnp.ndarray     # [N] int32
    desc: jnp.ndarray      # [N, 8] uint32
    valid: jnp.ndarray     # [N] bool
    u_right: jnp.ndarray   # [N] float32 (-1 = mono/no depth)
    depth: jnp.ndarray     # [N] float32 (-1 = none)

    @property
    def capacity(self) -> int:
        return self.xy.shape[0]

    def has_depth(self) -> jnp.ndarray:
        return self.valid & (self.depth > 0.0)


def backproject_frame(cam: CameraParams, frame: FrameData, Tcw: jnp.ndarray) -> jnp.ndarray:
    """World positions [N, 3] of all frame features with depth (garbage rows
    where depth invalid — mask with frame.has_depth())."""
    pc = backproject(cam, frame.xy, jnp.maximum(frame.depth, 1e-3))
    R = Tcw[:3, :3]
    t = Tcw[:3, 3]
    return (pc - t) @ R  # R^T (pc - t)


def make_frame_rgbd(
    config: SlamConfig, image: jnp.ndarray, depth_map: jnp.ndarray
) -> FrameData:
    """RGB-D frame: extract ORB, undistort, read depths (reference
    Frame RGB-D ctor src/Frame.cc:238-349)."""
    feats = orb_extractor.extract(image, config.orb)
    cam = config.camera
    xy_und = undistort_points(cam, feats.xy) if cam.has_distortion else feats.xy
    sm = stereo_ops.stereo_from_depth(
        feats.xy, feats.valid, depth_map, cam.bf, config.depth_map_factor
    )
    return FrameData(
        xy=xy_und, xy_raw=feats.xy, response=feats.response, angle=feats.angle,
        level=feats.level, desc=feats.desc, valid=feats.valid,
        u_right=sm.u_right, depth=sm.depth,
    )


def _rectify_pair(config: SlamConfig, image_l: jnp.ndarray,
                  image_r: jnp.ndarray):
    """Apply the configured undistort-rectify maps to both eyes on device
    (reference EuRoC path: cv::remap per eye before tracking,
    Examples/Stereo/stereo_euroc.cc:45-80 region).  No-op when unset."""
    if config.rect_maps is None:
        return image_l, image_r
    from ..utils.rectify import remap_bilinear_jnp

    mxl, myl, mxr, myr = (jnp.asarray(a, jnp.float32)
                          for a in config.rect_maps)
    return (remap_bilinear_jnp(image_l, mxl, myl),
            remap_bilinear_jnp(image_r, mxr, myr))


def make_frame_stereo(
    config: SlamConfig, image_l: jnp.ndarray, image_r: jnp.ndarray
) -> FrameData:
    """Stereo frame: extract both eyes, row-band match for depth (reference
    Frame stereo ctor src/Frame.cc:108-237)."""
    cam = config.camera
    image_l, image_r = _rectify_pair(config, image_l, image_r)
    # both eyes through ONE extraction kernel chain (double level-batch); the
    # padded pyramid slabs feed the SAD matcher without a pyramid rebuild
    # (reference builds each eye's pyramid once too, Frame ctor)
    feats_l, feats_r, slab_l, slab_r = orb_extractor.extract_pair(
        image_l, image_r, config.orb)
    dims = level_shapes(int(image_l.shape[0]), int(image_l.shape[1]),
                        config.orb.n_levels, config.orb.scale_factor)
    sm = stereo_ops.match_stereo(
        feats_l.xy, feats_l.level, feats_l.desc, feats_l.valid,
        feats_r.xy, feats_r.level, feats_r.desc, feats_r.valid,
        slab_l, slab_r, cam.bf, cam.baseline,  # minZ = b (reference Frame.cc:1033)
        jnp.asarray(config.orb.scale_factors()), level_dims=dims,
    )
    xy_und = undistort_points(cam, feats_l.xy) if cam.has_distortion else feats_l.xy
    return FrameData(
        xy=xy_und, xy_raw=feats_l.xy, response=feats_l.response,
        angle=feats_l.angle, level=feats_l.level, desc=feats_l.desc,
        valid=feats_l.valid, u_right=sm.u_right, depth=sm.depth,
    )


def make_frames_rgbd_batch(
    config: SlamConfig, images: jnp.ndarray, depth_maps: jnp.ndarray
) -> FrameData:
    """RGB-D frames for a whole chunk: [B, H, W] images/depths -> FrameData
    with leading batch dim [B, N, ...].

    Frame construction has no frame-to-frame dependency, so the chunked
    streaming pipeline builds ALL frames of a chunk through ONE batched
    extraction chain (ops/orb/extractor.extract_batch) before the sequential
    tracking scan — the reference necessarily interleaves construction with
    tracking because each CPU frame is serial (src/Frame.cc:238-349)."""
    feats, _ = orb_extractor.extract_batch(images, config.orb)
    cam = config.camera
    xy_und = (jax.vmap(lambda xy: undistort_points(cam, xy))(feats.xy)
              if cam.has_distortion else feats.xy)
    sm = jax.vmap(
        lambda xy, v, d: stereo_ops.stereo_from_depth(
            xy, v, d, cam.bf, config.depth_map_factor)
    )(feats.xy, feats.valid, depth_maps)
    return FrameData(
        xy=xy_und, xy_raw=feats.xy, response=feats.response, angle=feats.angle,
        level=feats.level, desc=feats.desc, valid=feats.valid,
        u_right=sm.u_right, depth=sm.depth,
    )


def make_frames_stereo_batch(
    config: SlamConfig, images_l: jnp.ndarray, images_r: jnp.ndarray
) -> FrameData:
    """Stereo frames for a whole chunk: both eyes of every frame through ONE
    extraction chain (2B-fold level batch), then a vmapped row-band SAD
    matcher.  See make_frames_rgbd_batch."""
    cam = config.camera
    B, H, W = images_l.shape
    if config.rect_maps is not None:
        images_l, images_r = jax.vmap(
            lambda il, ir: _rectify_pair(config, il, ir))(images_l, images_r)
    # contiguous [left-block; right-block] layout: the per-eye splits below
    # are free slices — the interleaved layout's stride-2 gathers on the
    # [2B, slab] pyramid cost ~5 ms/frame at KITTI width (round-4 profile)
    both = jnp.concatenate([images_l, images_r], axis=0)
    feats, slabs = orb_extractor.extract_batch(both, config.orb)
    feats_l = jax.tree.map(lambda x: x[:B], feats)
    feats_r = jax.tree.map(lambda x: x[B:], feats)
    slab_l, slab_r = slabs[:B], slabs[B:]
    dims = level_shapes(H, W, config.orb.n_levels, config.orb.scale_factor)
    scale_factors = jnp.asarray(config.orb.scale_factors())
    sm = jax.vmap(
        lambda xl, ll, dl, vl, xr, lr, dr, vr, sl, sr: stereo_ops.match_stereo(
            xl, ll, dl, vl, xr, lr, dr, vr, sl, sr,
            cam.bf, cam.baseline, scale_factors, level_dims=dims)
    )(feats_l.xy, feats_l.level, feats_l.desc, feats_l.valid,
      feats_r.xy, feats_r.level, feats_r.desc, feats_r.valid,
      slab_l, slab_r)
    xy_und = (jax.vmap(lambda xy: undistort_points(cam, xy))(feats_l.xy)
              if cam.has_distortion else feats_l.xy)
    return FrameData(
        xy=xy_und, xy_raw=feats_l.xy, response=feats_l.response,
        angle=feats_l.angle, level=feats_l.level, desc=feats_l.desc,
        valid=feats_l.valid, u_right=sm.u_right, depth=sm.depth,
    )


def make_frame_mono(config: SlamConfig, image: jnp.ndarray) -> FrameData:
    feats = orb_extractor.extract(image, config.orb)
    cam = config.camera
    xy_und = undistort_points(cam, feats.xy) if cam.has_distortion else feats.xy
    n = feats.xy.shape[0]
    return FrameData(
        xy=xy_und, xy_raw=feats.xy, response=feats.response, angle=feats.angle,
        level=feats.level, desc=feats.desc, valid=feats.valid,
        u_right=jnp.full(n, -1.0), depth=jnp.full(n, -1.0),
    )


def make_frames_mono_batch(config: SlamConfig, images: jnp.ndarray) -> FrameData:
    """Mono frames for a whole chunk ([B, H, W] -> FrameData with leading
    batch dim); see make_frames_rgbd_batch."""
    feats, _ = orb_extractor.extract_batch(images, config.orb)
    cam = config.camera
    xy_und = (jax.vmap(lambda xy: undistort_points(cam, xy))(feats.xy)
              if cam.has_distortion else feats.xy)
    B, n = feats.xy.shape[:2]
    return FrameData(
        xy=xy_und, xy_raw=feats.xy, response=feats.response, angle=feats.angle,
        level=feats.level, desc=feats.desc, valid=feats.valid,
        u_right=jnp.full((B, n), -1.0), depth=jnp.full((B, n), -1.0),
    )
