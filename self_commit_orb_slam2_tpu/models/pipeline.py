"""Fully-fused per-frame SLAM step: one jit call per frame.

This is the TPU-native pipelined design SURVEY §2.3 calls for: the entire
frame path — ORB extraction, stereo/RGB-D depth, dual-hypothesis motion
tracking, local-map tracking, the keyframe decision, and (under lax.cond)
keyframe insertion + the local-mapping phase — compiles into a single XLA
program.  The host sees one device call and one small scalar fetch per frame,
instead of the reference's mutex choreography (or a chatty multi-call loop,
which on a remote-attached TPU costs a round trip per call).

Control flow that the reference spreads over three threads becomes in-graph
`lax.cond` branches; the map pytree is donated through the step so updates
stay on device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import se3
from . import frame as frame_mod
from . import local_mapping
from . import map_state as ms
from . import tracking
from .config import SlamConfig
from .frame import FrameData
from .map_state import NO_POINT, MapState


class TrackCarry(NamedTuple):
    """Device-resident tracking state threaded between frames."""

    Tcw: jnp.ndarray            # [4, 4]
    velocity: jnp.ndarray       # [4, 4]
    last_frame: FrameData
    last_obs_pt: jnp.ndarray    # [N]
    frame_id: jnp.ndarray       # scalar int32
    last_kf_frame_id: jnp.ndarray
    prev_inliers: jnp.ndarray   # scalar int32
    state_ok: jnp.ndarray       # scalar bool (False = lost)


class StepInfo(NamedTuple):
    """Small host-fetchable summary of one step."""

    Tcw: jnp.ndarray
    n_inliers: jnp.ndarray
    created_kf: jnp.ndarray   # bool
    state_ok: jnp.ndarray     # bool
    n_keyframes: jnp.ndarray
    n_points: jnp.ndarray
    ref_kf: jnp.ndarray       # latest keyframe id (trajectory reference)
    ref_kf_Tcw: jnp.ndarray   # its pose at track time (for T_cr bookkeeping)


def init_carry(config: SlamConfig, frame: FrameData) -> TrackCarry:
    n = frame.capacity
    return TrackCarry(
        Tcw=jnp.eye(4, dtype=jnp.float32),
        velocity=jnp.eye(4, dtype=jnp.float32),
        last_frame=frame,
        last_obs_pt=jnp.full(n, NO_POINT, jnp.int32),
        frame_id=jnp.int32(0),
        last_kf_frame_id=jnp.int32(0),
        prev_inliers=jnp.int32(0),
        state_ok=jnp.array(True),
    )


def _need_keyframe(config: SlamConfig, m: MapState, carry: TrackCarry,
                   frame: FrameData, lres, localization_only: bool):
    """In-graph keyframe policy (see System._need_keyframe for provenance)."""
    cfg = config.tracking
    frames_since = carry.frame_id - carry.last_kf_frame_id
    n_inl = lres.n_inliers
    overlap = lres.ref_shared.astype(jnp.float32) / jnp.maximum(n_inl, 1).astype(jnp.float32)
    close = frame.has_depth() & (frame.depth < config.th_depth)
    n_close_tracked = jnp.sum(close & (lres.obs_pt >= 0))
    n_close_new = jnp.sum(close & (lres.obs_pt < 0))
    c1 = frames_since >= cfg.max_frames_between_kf
    c2 = overlap < cfg.kf_ref_ratio_stereo
    c3 = (n_close_tracked < cfg.kf_min_close_points) & (n_close_new > cfg.kf_min_new_close)
    attrition = (cfg.kf_attrition_ratio_mono if config.sensor == "mono"
                 else cfg.kf_attrition_ratio)
    c4 = n_inl < (attrition * carry.prev_inliers.astype(jnp.float32))
    capacity_ok = m.n_kf < m.max_kf
    need = (c1 | c2 | c3 | c4) & (n_inl >= 15) & capacity_ok
    return need & (not localization_only) & (frames_since >= cfg.min_frames_between_kf)


def track_step(
    config: SlamConfig,
    m: MapState,
    carry: TrackCarry,
    frame: FrameData,
    timestamp: jnp.ndarray,
    localization_only: bool = False,
    run_mapping: bool = True,
) -> tuple[MapState, TrackCarry, StepInfo]:
    """One fused tracking step (frame already constructed)."""
    cfg = config.tracking

    # dual-hypothesis motion tracking (see System docstring)
    res_vel = tracking.track_motion(
        config, m, frame, carry.Tcw, carry.velocity, carry.last_frame,
        carry.last_obs_pt, jnp.float32(cfg.motion_search_radius),
    )
    res_static = tracking.track_motion(
        config, m, frame, carry.Tcw, jnp.eye(4, dtype=jnp.float32),
        carry.last_frame, carry.last_obs_pt,
        jnp.float32(cfg.motion_search_radius_wide),
    )
    take_static = res_static.n_inliers.astype(jnp.float32) >= 0.9 * res_vel.n_inliers.astype(jnp.float32)
    res = jax.tree.map(
        lambda a, b: jnp.where(take_static, a, b), res_static, res_vel
    )

    lres = tracking.track_local_map(config, m, frame, res.Tcw, res.obs_pt)
    ok = lres.n_inliers >= cfg.min_inliers_local

    new_Tcw = jnp.where(ok, lres.Tcw, carry.velocity @ carry.Tcw)  # dead-reckon if lost
    new_velocity = jnp.where(ok, new_Tcw @ se3.inverse(carry.Tcw), carry.velocity)
    obs_pt = jnp.where(ok, lres.obs_pt, jnp.full_like(lres.obs_pt, NO_POINT))

    need_kf = _need_keyframe(config, m, carry, frame, lres, localization_only) & ok

    def with_kf(m):
        m, kf_id = tracking.create_keyframe(
            config, m, frame, new_Tcw, lres.obs_pt,
            carry.frame_id, timestamp,
        )
        if run_mapping:
            m = local_mapping._process(config, m, kf_id)
        return m, m.kf_obs_pt[kf_id]

    def without_kf(m):
        return m, obs_pt

    m, obs_after = jax.lax.cond(need_kf, with_kf, without_kf, m)

    carry_out = TrackCarry(
        Tcw=new_Tcw,
        velocity=new_velocity,
        last_frame=frame,
        last_obs_pt=obs_after,
        frame_id=carry.frame_id + 1,
        last_kf_frame_id=jnp.where(need_kf, carry.frame_id, carry.last_kf_frame_id),
        prev_inliers=jnp.where(ok, lres.n_inliers, carry.prev_inliers),
        state_ok=ok,
    )
    ref_kf = jnp.maximum(m.n_kf - 1, 0)
    info = StepInfo(
        Tcw=new_Tcw,
        n_inliers=lres.n_inliers,
        created_kf=need_kf,
        state_ok=ok,
        n_keyframes=m.n_kf,
        n_points=jnp.sum(m.pt_valid).astype(jnp.int32),
        ref_kf=ref_kf,
        ref_kf_Tcw=m.kf_Tcw[ref_kf],
    )
    return m, carry_out, info


def step_rgbd(config: SlamConfig, m: MapState, carry: TrackCarry,
              image: jnp.ndarray, depth: jnp.ndarray, timestamp: jnp.ndarray,
              localization_only: bool = False, run_mapping: bool = True):
    # uint8 images are fine (4x cheaper host->device transfer); cast on device
    frame = frame_mod.make_frame_rgbd(config, image.astype(jnp.float32),
                                      depth.astype(jnp.float32))
    return track_step(config, m, carry, frame, timestamp, localization_only,
                      run_mapping)


def step_stereo(config: SlamConfig, m: MapState, carry: TrackCarry,
                image_l: jnp.ndarray, image_r: jnp.ndarray, timestamp: jnp.ndarray,
                localization_only: bool = False, run_mapping: bool = True):
    frame = frame_mod.make_frame_stereo(config, image_l.astype(jnp.float32),
                                        image_r.astype(jnp.float32))
    return track_step(config, m, carry, frame, timestamp, localization_only,
                      run_mapping)


def batch_steps_rgbd(config: SlamConfig, m: MapState, carry: TrackCarry,
                     images: jnp.ndarray, depths: jnp.ndarray,
                     timestamps: jnp.ndarray,
                     localization_only: bool = False, run_mapping: bool = True):
    """Process a whole batch of frames in ONE device call (lax.scan).

    The throughput mode: on a remote-attached TPU each call costs ~100-150ms
    of transfer/sync overhead; scanning B frames inside the graph amortizes
    it to O(1/B) per frame.  images/depths: [B, H, W]; returns stacked
    StepInfo [B, ...].
    """

    def body(state, inputs):
        m, carry = state
        img, dep, ts = inputs
        m, carry, info = step_rgbd(config, m, carry, img, dep, ts,
                                   localization_only, run_mapping)
        return (m, carry), info

    (m, carry), infos = jax.lax.scan(body, (m, carry), (images, depths, timestamps))
    return m, carry, infos


def batch_steps_stereo(config: SlamConfig, m: MapState, carry: TrackCarry,
                       images_l: jnp.ndarray, images_r: jnp.ndarray,
                       timestamps: jnp.ndarray,
                       localization_only: bool = False, run_mapping: bool = True):
    def body(state, inputs):
        m, carry = state
        il, ir, ts = inputs
        m, carry, info = step_stereo(config, m, carry, il, ir, ts,
                                     localization_only, run_mapping)
        return (m, carry), info

    (m, carry), infos = jax.lax.scan(body, (m, carry), (images_l, images_r, timestamps))
    return m, carry, infos


def step_mono(config: SlamConfig, m: MapState, carry: TrackCarry,
              image: jnp.ndarray, timestamp: jnp.ndarray,
              localization_only: bool = False, run_mapping: bool = True):
    frame = frame_mod.make_frame_mono(config, image.astype(jnp.float32))
    return track_step(config, m, carry, frame, timestamp, localization_only,
                      run_mapping)


def init_rgbd(config: SlamConfig, m: MapState, image: jnp.ndarray,
              depth: jnp.ndarray, timestamp: jnp.ndarray):
    """First-frame initialization (separate call: runs once)."""
    frame = frame_mod.make_frame_rgbd(config, image, depth)
    m, kf_id = tracking.initialize_depth(config, m, frame, jnp.int32(0), timestamp)
    carry = init_carry(config, frame)
    carry = carry._replace(
        last_obs_pt=m.kf_obs_pt[kf_id],
        frame_id=jnp.int32(1),
        prev_inliers=jnp.sum(frame.has_depth()).astype(jnp.int32),
    )
    n_depth = jnp.sum(frame.has_depth())
    return m, carry, n_depth


def init_stereo(config: SlamConfig, m: MapState, image_l: jnp.ndarray,
                image_r: jnp.ndarray, timestamp: jnp.ndarray):
    frame = frame_mod.make_frame_stereo(config, image_l, image_r)
    m, kf_id = tracking.initialize_depth(config, m, frame, jnp.int32(0), timestamp)
    carry = init_carry(config, frame)
    carry = carry._replace(
        last_obs_pt=m.kf_obs_pt[kf_id],
        frame_id=jnp.int32(1),
        prev_inliers=jnp.sum(frame.has_depth()).astype(jnp.int32),
    )
    n_depth = jnp.sum(frame.has_depth())
    return m, carry, n_depth
