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
    last_obs_birth: jnp.ndarray # [N] pt_birth stamp captured with last_obs_pt:
                                # a carried id is only valid while its slot's
                                # stamp still matches (cull + free-list reuse
                                # can rebind the slot to a different 3D point
                                # between frames — the CheckReplacedInLastFrame
                                # analogue, reference src/Tracking.cc:1152)
    frame_id: jnp.ndarray       # scalar int32
    last_kf_frame_id: jnp.ndarray
    prev_inliers: jnp.ndarray   # scalar int32
    state_ok: jnp.ndarray       # scalar bool (False = lost)
    key: jnp.ndarray            # PRNG key for in-graph relocalization RANSAC
    vo: jnp.ndarray             # scalar bool: localization-mode "map support
                                # lost, tracking on VO points" (the reference's
                                # mbVO flag, src/Tracking.cc:538-541,1425)


class StepInfo(NamedTuple):
    """Small host-fetchable summary of one step."""

    Tcw: jnp.ndarray
    n_inliers: jnp.ndarray
    created_kf: jnp.ndarray   # bool
    state_ok: jnp.ndarray     # bool
    n_keyframes: jnp.ndarray
    n_points: jnp.ndarray
    ref_kf: jnp.ndarray       # latest keyframe SLOT (for in-map operations)
    ref_kf_Tcw: jnp.ndarray   # its pose at track time (for T_cr bookkeeping)
    ref_kf_seq: jnp.ndarray   # its SEQ number (stable trajectory reference —
                              # slots are reused after culling)
    vo: jnp.ndarray           # bool: localization-mode VO flag (mbVO)


def init_carry(config: SlamConfig, frame: FrameData) -> TrackCarry:
    n = frame.capacity
    return TrackCarry(
        Tcw=jnp.eye(4, dtype=jnp.float32),
        velocity=jnp.eye(4, dtype=jnp.float32),
        last_frame=frame,
        last_obs_pt=jnp.full(n, NO_POINT, jnp.int32),
        last_obs_birth=jnp.zeros(n, jnp.int32),
        frame_id=jnp.int32(0),
        last_kf_frame_id=jnp.int32(0),
        prev_inliers=jnp.int32(0),
        state_ok=jnp.array(True),
        key=jax.random.PRNGKey(23),
        vo=jnp.array(False),
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
    # a free (invalid) slot exists — culling reclaims slots, so long
    # sequences never starve keyframe creation (VERDICT r1 item 2)
    capacity_ok = ~jnp.all(m.kf_valid)
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

    # dual-hypothesis motion tracking (see System docstring), both hypotheses
    # batched through one vmap so the matching tables and GN loops run once
    # at batch 2 instead of twice sequentially.  (A cond-gated single-
    # hypothesis fast path was tried in round 3 and REGRESSED ATE 0.02 ->
    # 0.06 on the look-at benchmark: the wide-window static hypothesis wins
    # often enough at steady state to be load-bearing for accuracy.)
    hyp_vel = jnp.stack([jnp.eye(4, dtype=jnp.float32), carry.velocity])
    hyp_rad = jnp.asarray(
        [cfg.motion_search_radius_wide, cfg.motion_search_radius], jnp.float32)

    def _select_hypothesis(res2):
        res_static = jax.tree.map(lambda x: x[0], res2)
        res_vel = jax.tree.map(lambda x: x[1], res2)
        take_static = (res_static.n_inliers.astype(jnp.float32)
                       >= 0.9 * res_vel.n_inliers.astype(jnp.float32))
        return jax.tree.map(
            lambda a, b: jnp.where(take_static, a, b), res_static, res_vel)

    if localization_only:
        # ---- Localization Mode (reference Tracking.cc:523-656): motion
        # tracking is augmented with temporal "visual odometry" points from
        # the last frame's depth (UpdateLastFrame, :1247-1350); carry.vo is
        # the reference's mbVO "map support lost" flag; local-map tracking
        # is skipped while map support is lost (:648-655), and
        # relocalization runs alongside the VO motion model with its
        # solution preferred (:568-624).
        res = _select_hypothesis(jax.vmap(
            lambda vel, rad: tracking.track_motion_loc(
                config, m, frame, carry.Tcw, vel, carry.last_frame,
                carry.last_obs_pt, rad,
                last_obs_birth=carry.last_obs_birth,
            )
        )(hyp_vel, hyp_rad))
        ok_mm = res.n_inliers > 20           # loc-mode MM return (:1427)
        vo_now = res.n_map_inliers < 10      # mbVO update (:1425-1426)
        run_lm = ok_mm & ~vo_now

        def do_lm(m, frame):
            return tracking.track_local_map(
                config, m, frame, res.Tcw, res.obs_pt)

        def echo_lm(m, frame):
            # VO / failed-MM branch: no local map retrievable — echo the
            # motion result in LocalMapResult shape (reference skips
            # TrackLocalMap entirely when mbVO, Tracking.cc:648-655)
            return tracking.LocalMapResult(
                Tcw=res.Tcw, obs_pt=res.obs_pt, n_inliers=res.n_inliers,
                local_kf_mask=jnp.zeros(m.max_kf, bool),
                visible_pt=jnp.full(config.caps.local_points, NO_POINT,
                                    jnp.int32),
                found_pt_mask=res.obs_pt >= 0,
                ref_kf=ms.latest_kf(m),
                ref_shared=jnp.int32(0),
                ref_total=jnp.int32(1),
            )

        lres = jax.lax.cond(run_lm, do_lm, echo_lm, m, frame)
        ok = jnp.where(run_lm, lres.n_inliers >= cfg.min_inliers_local, ok_mm)
        want_reloc = ~ok | carry.vo | ~carry.state_ok
    else:
        res = _select_hypothesis(jax.vmap(
            lambda vel, rad: tracking.track_motion(
                config, m, frame, carry.Tcw, vel, carry.last_frame,
                carry.last_obs_pt, rad,
                last_obs_birth=carry.last_obs_birth,
            )
        )(hyp_vel, hyp_rad))
        vo_now = jnp.array(False)
        lres = tracking.track_local_map(config, m, frame, res.Tcw, res.obs_pt)
        ok = lres.n_inliers >= cfg.min_inliers_local
        want_reloc = ~ok

    # ---- in-graph relocalization on the LOST branch (reference Tracking
    # falls back to Relocalization() whenever LOST, src/Tracking.cc:523-629,
    # :2030) — the batched/throughput mode recovers mid-scan instead of
    # dead-reckoning to the end of the batch.  lax.cond: the EPnP-RANSAC
    # branch only executes on frames that actually lost tracking (or, in
    # localization mode, that run on VO support).
    key_next, sub = jax.random.split(carry.key)
    if config.vocab is not None:
        from . import relocalization

        def do_reloc(m, frame):
            r = relocalization.relocalize(config, m, frame, sub)
            return r.success, r.Tcw, r.obs_pt, r.n_inliers

        def no_reloc(m, frame):
            return (jnp.array(False), lres.Tcw, lres.obs_pt,
                    jnp.int32(0))

        r_ok, r_Tcw, r_obs, r_inl = jax.lax.cond(
            want_reloc, do_reloc, no_reloc, m, frame)
    else:
        r_ok = jnp.array(False)
        r_Tcw, r_obs, r_inl = lres.Tcw, lres.obs_pt, jnp.int32(0)

    relocated = want_reloc & r_ok
    ok = ok | r_ok
    lres = lres._replace(
        Tcw=jnp.where(relocated, r_Tcw, lres.Tcw),
        obs_pt=jnp.where(relocated, r_obs, lres.obs_pt),
        n_inliers=jnp.where(relocated, r_inl, lres.n_inliers),
    )

    new_Tcw = jnp.where(ok, lres.Tcw, carry.velocity @ carry.Tcw)  # dead-reckon if lost
    new_velocity = jnp.where(
        relocated, jnp.eye(4, dtype=jnp.float32),
        jnp.where(ok, new_Tcw @ se3.inverse(carry.Tcw), carry.velocity))
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

    # capture the birth stamps alongside the carried ids (from the POST-step
    # map, so stamps are consistent with whatever the mapping phase did)
    birth_after = jnp.where(
        obs_after >= 0,
        m.pt_birth[jnp.clip(obs_after, 0, m.max_pt - 1)], 0)
    carry_out = TrackCarry(
        Tcw=new_Tcw,
        velocity=new_velocity,
        last_frame=frame,
        last_obs_pt=obs_after,
        last_obs_birth=birth_after,
        frame_id=carry.frame_id + 1,
        last_kf_frame_id=jnp.where(need_kf, carry.frame_id, carry.last_kf_frame_id),
        prev_inliers=jnp.where(ok, lres.n_inliers, carry.prev_inliers),
        state_ok=ok,
        key=key_next,
        # mbVO clears on relocalization success (reference Tracking.cc:623)
        vo=jnp.where(relocated, False, vo_now),
    )
    ref_kf = ms.latest_kf(m)
    info = StepInfo(
        Tcw=new_Tcw,
        n_inliers=lres.n_inliers,
        created_kf=need_kf,
        state_ok=ok,
        n_keyframes=m.n_kf,
        n_points=jnp.sum(m.pt_valid).astype(jnp.int32),
        ref_kf=ref_kf,
        ref_kf_Tcw=m.kf_Tcw[ref_kf],
        ref_kf_seq=m.kf_seq[ref_kf],
        vo=carry_out.vo,
    )
    return m, carry_out, info


def pack_infos(infos: StepInfo) -> jnp.ndarray:
    """Flatten a (stacked) StepInfo into ONE [B, 40] f32 array.

    A remote-attached TPU pays a full round trip per fetched BUFFER, not per
    byte; packing the per-frame summary into a single array makes the host
    sync one transfer instead of eight.
    """
    to2d = lambda x: x.reshape(x.shape[0], -1).astype(jnp.float32)
    return jnp.concatenate([
        to2d(infos.Tcw),           # 0:16
        to2d(infos.ref_kf_Tcw),    # 16:32
        to2d(infos.n_inliers),     # 32
        to2d(infos.created_kf),    # 33
        to2d(infos.state_ok),      # 34
        to2d(infos.n_keyframes),   # 35
        to2d(infos.n_points),      # 36
        to2d(infos.ref_kf),        # 37
        to2d(infos.ref_kf_seq),    # 38
        to2d(infos.vo),            # 39
    ], axis=1)


def unpack_infos(arr) -> StepInfo:
    """Host-side inverse of pack_infos (numpy in, numpy out)."""
    import numpy as np

    B = arr.shape[0]
    return StepInfo(
        Tcw=arr[:, 0:16].reshape(B, 4, 4),
        n_inliers=arr[:, 32].astype(np.int32),
        created_kf=arr[:, 33] > 0.5,
        state_ok=arr[:, 34] > 0.5,
        n_keyframes=arr[:, 35].astype(np.int32),
        n_points=arr[:, 36].astype(np.int32),
        ref_kf=arr[:, 37].astype(np.int32),
        ref_kf_Tcw=arr[:, 16:32].reshape(B, 4, 4),
        ref_kf_seq=arr[:, 38].astype(np.int32),
        vo=arr[:, 39] > 0.5,
    )


def step_rgbd(config: SlamConfig, m: MapState, carry: TrackCarry,
              image: jnp.ndarray, depth: jnp.ndarray, timestamp: jnp.ndarray,
              localization_only: bool = False, run_mapping: bool = True):
    # uint8 images / uint16-millimeter depth halve host->device transfer on
    # the remote tunnel; cast on device (dtype is static at trace time)
    depth_f = depth.astype(jnp.float32)
    if depth.dtype == jnp.uint16:
        depth_f = depth_f * jnp.float32(1e-3)
    frame = frame_mod.make_frame_rgbd(config, image.astype(jnp.float32),
                                      depth_f)
    return track_step(config, m, carry, frame, timestamp, localization_only,
                      run_mapping)


def step_stereo(config: SlamConfig, m: MapState, carry: TrackCarry,
                image_l: jnp.ndarray, image_r: jnp.ndarray, timestamp: jnp.ndarray,
                localization_only: bool = False, run_mapping: bool = True):
    frame = frame_mod.make_frame_stereo(config, image_l.astype(jnp.float32),
                                        image_r.astype(jnp.float32))
    return track_step(config, m, carry, frame, timestamp, localization_only,
                      run_mapping)


def _skip_info(m: MapState, carry: TrackCarry) -> StepInfo:
    """StepInfo for a padded (invalid) frame: carry state echoed, no KF."""
    ref_kf = ms.latest_kf(m)
    return StepInfo(
        Tcw=carry.Tcw,
        n_inliers=jnp.int32(0),
        created_kf=jnp.array(False),
        state_ok=carry.state_ok,
        n_keyframes=m.n_kf,
        n_points=jnp.sum(m.pt_valid).astype(jnp.int32),
        ref_kf=ref_kf,
        ref_kf_Tcw=m.kf_Tcw[ref_kf],
        ref_kf_seq=m.kf_seq[ref_kf],
        vo=carry.vo,
    )


def batch_steps_rgbd(config: SlamConfig, m: MapState, carry: TrackCarry,
                     images: jnp.ndarray, depths: jnp.ndarray,
                     timestamps: jnp.ndarray, valid: jnp.ndarray,
                     localization_only: bool = False, run_mapping: bool = True):
    """Process a whole batch of frames in ONE device call (lax.scan).

    The throughput mode: on a remote-attached TPU each call costs ~100-150ms
    of transfer/sync overhead; scanning B frames inside the graph amortizes
    it to O(1/B) per frame.  images/depths: [B, H, W]; valid: [B] bool —
    padded (invalid) frames pass the carry through untouched, which lets the
    host stream fixed-size chunks (one compiled program) over the transfer
    pipeline and pad only the final chunk.  Returns stacked StepInfo [B, ...].

    NOTE: this single-graph variant constructs each frame inside the scan
    body.  The faster path — batched frame construction for the whole chunk,
    then a tracking-only scan — must run as TWO jit calls (frames_*_packed +
    batch_steps_frames, as System wires them): fusing construction and scan
    into one graph miscompiles on the axon TPU backend (the scan's xs get
    rematerialized per-iteration with different numerics; verified round 4).
    """

    def body(state, inputs):
        m, carry = state
        img, dep, ts, ok = inputs

        def live(m, carry):
            return step_rgbd(config, m, carry, img, dep, ts,
                             localization_only, run_mapping)

        def skip(m, carry):
            return m, carry, _skip_info(m, carry)

        m, carry, info = jax.lax.cond(ok, live, skip, m, carry)
        return (m, carry), info

    (m, carry), infos = jax.lax.scan(
        body, (m, carry), (images, depths, timestamps, valid))
    return m, carry, pack_infos(infos)


def batch_steps_rgbd_packed(config: SlamConfig, m: MapState, carry: TrackCarry,
                            buf: jnp.ndarray,
                            localization_only: bool = False,
                            run_mapping: bool = True):
    """batch_steps_rgbd on ONE packed uint8 buffer [B, bytes_per_frame].

    The remote tunnel pays ~2.7ms latency per TRANSFER; packing image (u8),
    depth (u16 mm), timestamp (f32) and the valid flag into a single buffer
    per chunk makes each chunk one transfer instead of four.  Layout per
    frame: [H*W image u8][H*W*2 depth u16 LE][4 ts f32][4 valid u8].
    """
    cam = config.camera
    H, W = int(cam.height), int(cam.width)
    B = buf.shape[0]
    images = buf[:, : H * W].reshape(B, H, W)
    depths = jax.lax.bitcast_convert_type(
        buf[:, H * W : 3 * H * W].reshape(B, H, W, 2), jnp.uint16
    )
    ts = jax.lax.bitcast_convert_type(
        buf[:, 3 * H * W : 3 * H * W + 4], jnp.float32
    )
    valid = buf[:, 3 * H * W + 4] > 0
    return batch_steps_rgbd(config, m, carry, images, depths, ts, valid,
                            localization_only, run_mapping)


def pack_rgbd_chunk(images_u8, depths_mm_u16, ts_f32, valid_b):
    """Host-side packer matching batch_steps_rgbd_packed's layout (numpy)."""
    import numpy as np

    B, H, W = images_u8.shape
    parts = [
        images_u8.reshape(B, -1),
        depths_mm_u16.astype("<u2").view(np.uint8).reshape(B, -1),
        np.asarray(ts_f32, "<f4").view(np.uint8).reshape(B, 4),
        np.repeat(valid_b.astype(np.uint8)[:, None], 4, axis=1),
    ]
    return np.concatenate(parts, axis=1)


def batch_steps_stereo_packed(config: SlamConfig, m: MapState, carry: TrackCarry,
                              buf: jnp.ndarray,
                              localization_only: bool = False,
                              run_mapping: bool = True):
    """Stereo variant of batch_steps_rgbd_packed.  Layout per frame:
    [H*W left u8][H*W right u8][4 ts f32][4 valid u8]."""
    cam = config.camera
    H, W = int(cam.height), int(cam.width)
    B = buf.shape[0]
    il = buf[:, : H * W].reshape(B, H, W)
    ir = buf[:, H * W : 2 * H * W].reshape(B, H, W)
    ts = jax.lax.bitcast_convert_type(
        buf[:, 2 * H * W : 2 * H * W + 4], jnp.float32
    )
    valid = buf[:, 2 * H * W + 4] > 0
    return batch_steps_stereo(config, m, carry, il, ir, ts, valid,
                              localization_only, run_mapping)


def pack_stereo_chunk(il_u8, ir_u8, ts_f32, valid_b):
    import numpy as np

    B = il_u8.shape[0]
    parts = [
        il_u8.reshape(B, -1),
        ir_u8.reshape(B, -1),
        np.asarray(ts_f32, "<f4").view(np.uint8).reshape(B, 4),
        np.repeat(valid_b.astype(np.uint8)[:, None], 4, axis=1),
    ]
    return np.concatenate(parts, axis=1)


def batch_steps_stereo(config: SlamConfig, m: MapState, carry: TrackCarry,
                       images_l: jnp.ndarray, images_r: jnp.ndarray,
                       timestamps: jnp.ndarray, valid: jnp.ndarray,
                       localization_only: bool = False, run_mapping: bool = True):
    """Single-graph stereo batch (see batch_steps_rgbd's NOTE)."""
    def body(state, inputs):
        m, carry = state
        il, ir, ts, ok = inputs

        def live(m, carry):
            return step_stereo(config, m, carry, il, ir, ts,
                               localization_only, run_mapping)

        def skip(m, carry):
            return m, carry, _skip_info(m, carry)

        m, carry, info = jax.lax.cond(ok, live, skip, m, carry)
        return (m, carry), info

    (m, carry), infos = jax.lax.scan(
        body, (m, carry), (images_l, images_r, timestamps, valid))
    return m, carry, pack_infos(infos)


# --- two-dispatch chunk pipeline: batched frame phase + tracking scan -------
# Frame construction has no frame-to-frame dependency, so the streaming path
# builds ALL frames of a chunk through one batched kernel chain
# (ops/orb/extractor.extract_batch) and scans only the tracking steps.  The
# two stages MUST be separate jit calls on the axon TPU backend (see
# batch_steps_rgbd's NOTE); System dispatches frames_*_packed then
# batch_steps_frames back-to-back (both async, so the split costs no wall
# time — and the frame phase of chunk k+1 can overlap the scan of chunk k).

def frames_rgbd_packed(config: SlamConfig, buf: jnp.ndarray):
    """Packed uint8 chunk buffer -> (FrameData [B,...], ts [B], valid [B]).

    Layout per frame (matches pack_rgbd_chunk):
    [H*W image u8][H*W*2 depth u16 LE][4 ts f32][4 valid u8]."""
    cam = config.camera
    H, W = int(cam.height), int(cam.width)
    B = buf.shape[0]
    images = buf[:, : H * W].reshape(B, H, W)
    depths = jax.lax.bitcast_convert_type(
        buf[:, H * W : 3 * H * W].reshape(B, H, W, 2), jnp.uint16
    )
    ts = jax.lax.bitcast_convert_type(
        buf[:, 3 * H * W : 3 * H * W + 4], jnp.float32
    )
    valid = buf[:, 3 * H * W + 4] > 0
    frames = frame_mod.make_frames_rgbd_batch(
        config, images.astype(jnp.float32),
        depths.astype(jnp.float32) * jnp.float32(1e-3))
    return frames, ts, valid


def frames_stereo_packed(config: SlamConfig, buf: jnp.ndarray):
    """Stereo variant of frames_rgbd_packed (layout of pack_stereo_chunk)."""
    cam = config.camera
    H, W = int(cam.height), int(cam.width)
    B = buf.shape[0]
    il = buf[:, : H * W].reshape(B, H, W)
    ir = buf[:, H * W : 2 * H * W].reshape(B, H, W)
    ts = jax.lax.bitcast_convert_type(
        buf[:, 2 * H * W : 2 * H * W + 4], jnp.float32
    )
    valid = buf[:, 2 * H * W + 4] > 0
    frames = frame_mod.make_frames_stereo_batch(
        config, il.astype(jnp.float32), ir.astype(jnp.float32))
    return frames, ts, valid


def frames_mono_packed(config: SlamConfig, buf: jnp.ndarray):
    """Mono variant of frames_rgbd_packed.  Layout per frame (matches
    pack_mono_chunk): [H*W image u8][4 ts f32][4 valid u8]."""
    cam = config.camera
    H, W = int(cam.height), int(cam.width)
    B = buf.shape[0]
    images = buf[:, : H * W].reshape(B, H, W)
    ts = jax.lax.bitcast_convert_type(
        buf[:, H * W : H * W + 4], jnp.float32
    )
    valid = buf[:, H * W + 4] > 0
    frames = frame_mod.make_frames_mono_batch(
        config, images.astype(jnp.float32))
    return frames, ts, valid


def pack_mono_chunk(images_u8, ts_f32, valid_b):
    """Host-side packer matching frames_mono_packed's layout (numpy)."""
    import numpy as np

    B = images_u8.shape[0]
    parts = [
        images_u8.reshape(B, -1),
        np.asarray(ts_f32, "<f4").view(np.uint8).reshape(B, 4),
        np.repeat(valid_b.astype(np.uint8)[:, None], 4, axis=1),
    ]
    return np.concatenate(parts, axis=1)


def batch_steps_frames(config: SlamConfig, m: MapState, carry: TrackCarry,
                       frames: FrameData, timestamps: jnp.ndarray,
                       valid: jnp.ndarray,
                       localization_only: bool = False,
                       run_mapping: bool = True):
    """Tracking-only scan over pre-constructed frames (leading dim B)."""
    def body(state, inputs):
        m, carry = state
        frame, ts, ok = inputs

        def live(m, carry):
            return track_step(config, m, carry, frame, ts,
                              localization_only, run_mapping)

        def skip(m, carry):
            return m, carry, _skip_info(m, carry)

        m, carry, info = jax.lax.cond(ok, live, skip, m, carry)
        return (m, carry), info

    (m, carry), infos = jax.lax.scan(
        body, (m, carry), (frames, timestamps, valid))
    return m, carry, pack_infos(infos)


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
    obs0 = m.kf_obs_pt[kf_id]
    carry = carry._replace(
        last_obs_pt=obs0,
        last_obs_birth=jnp.where(
            obs0 >= 0, m.pt_birth[jnp.clip(obs0, 0, m.max_pt - 1)], 0),
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
    obs0 = m.kf_obs_pt[kf_id]
    carry = carry._replace(
        last_obs_pt=obs0,
        last_obs_birth=jnp.where(
            obs0 >= 0, m.pt_birth[jnp.clip(obs0, 0, m.max_pt - 1)], 0),
        frame_id=jnp.int32(1),
        prev_inliers=jnp.sum(frame.has_depth()).astype(jnp.int32),
    )
    n_depth = jnp.sum(frame.has_depth())
    return m, carry, n_depth
