"""Public API facade + host-side state machine.

TPU-native counterpart of the reference System (src/System.cc) and the
control-flow parts of Tracking (the NOT_INITIALIZED/OK/LOST state machine,
Tracking.cc:419-786).  All heavy compute is jit-compiled device code
(models/tracking.py, models/frame.py); this class sequences it, holds the
MapState pytree between calls, makes the keyframe decision from a handful of
device scalars, and records the trajectory.

Where the reference runs Tracking / LocalMapping / LoopClosing in three
mutex-synchronized threads (System.cc:116-145), this engine runs them as
pipelined phases: tracking every frame, a mapping step after each keyframe
insertion (models/local_mapping.py), loop closing periodically
(models/loop_closing.py) — same dataflow, no shared mutable state.
"""

from __future__ import annotations

import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import se3
from ..utils import trajectory as traj_io
from . import frame as frame_mod
from . import map_state as ms
from . import tracking
from .config import SlamConfig

STATE_NOT_INITIALIZED = 0
STATE_OK = 1
STATE_LOST = 2


class System:
    """Mono/stereo/RGB-D SLAM engine (reference System.h public surface:
    TrackMonocular/TrackStereo/TrackRGBD, localization-mode switch, Reset,
    trajectory savers)."""

    def __init__(self, config: SlamConfig, enable_mapping: bool = True,
                 enable_loop_closing: bool = True):
        self.config = config
        self.map = ms.empty_map(config)
        self.state = STATE_NOT_INITIALIZED
        self.localization_only = False
        self.enable_mapping = enable_mapping
        self.enable_loop_closing = enable_loop_closing

        self.frame_id = 0
        self.last_kf_frame_id = 0
        self.Tcw = jnp.eye(4)
        self.velocity = jnp.eye(4)
        self.last_frame: Optional[frame_mod.FrameData] = None
        self.last_obs_pt: Optional[jnp.ndarray] = None
        self.trajectory: list[tuple[float, np.ndarray]] = []
        self.timings: list[float] = []
        self._lost_count = 0
        self._last_kf_inliers = 0
        self._prev_inliers = 0

        cfg = config
        self._jit_frame_rgbd = jax.jit(functools.partial(frame_mod.make_frame_rgbd, cfg))
        self._jit_frame_stereo = jax.jit(functools.partial(frame_mod.make_frame_stereo, cfg))
        self._jit_frame_mono = jax.jit(functools.partial(frame_mod.make_frame_mono, cfg))
        self._jit_track_motion = jax.jit(functools.partial(tracking.track_motion, cfg))
        self._jit_track_local = jax.jit(functools.partial(tracking.track_local_map, cfg))
        self._jit_init_depth = jax.jit(
            functools.partial(tracking.initialize_depth, cfg), donate_argnums=0
        )
        self._jit_create_kf = jax.jit(
            functools.partial(tracking.create_keyframe, cfg), donate_argnums=0
        )
        self._local_mapper = None
        if enable_mapping:
            from .local_mapping import LocalMapper

            self._local_mapper = LocalMapper(cfg)
        self._loop_closer = None
        if enable_loop_closing:
            from .loop_closing import LoopCloser

            self._loop_closer = LoopCloser(cfg)

    # ------------------------------------------------------------- public API

    def track_rgbd(self, image: np.ndarray, depth: np.ndarray, timestamp: float) -> np.ndarray:
        t0 = time.perf_counter()
        frame = self._jit_frame_rgbd(jnp.asarray(image, jnp.float32), jnp.asarray(depth, jnp.float32))
        out = self._track(frame, timestamp)
        self.timings.append(time.perf_counter() - t0)
        return out

    def track_stereo(self, image_l: np.ndarray, image_r: np.ndarray, timestamp: float) -> np.ndarray:
        t0 = time.perf_counter()
        frame = self._jit_frame_stereo(
            jnp.asarray(image_l, jnp.float32), jnp.asarray(image_r, jnp.float32)
        )
        out = self._track(frame, timestamp)
        self.timings.append(time.perf_counter() - t0)
        return out

    def activate_localization_mode(self) -> None:
        """Reference System::ActivateLocalizationMode (src/System.cc:346)."""
        self.localization_only = True

    def deactivate_localization_mode(self) -> None:
        self.localization_only = False

    def reset(self) -> None:
        """Reference Tracking::Reset (src/Tracking.cc:2242): clear everything."""
        self.map = ms.empty_map(self.config)
        self.state = STATE_NOT_INITIALIZED
        self.frame_id = 0
        self.last_kf_frame_id = 0
        self.Tcw = jnp.eye(4)
        self.velocity = jnp.eye(4)
        self.last_frame = None
        self.last_obs_pt = None
        self.trajectory = []
        self._lost_count = 0
        self._last_kf_inliers = 0
        self._prev_inliers = 0

    def shutdown(self) -> None:  # parity with reference System::Shutdown
        pass

    def save_trajectory_tum(self, path: str) -> None:
        ts = np.array([t for t, _ in self.trajectory])
        poses = np.stack([p for _, p in self.trajectory])
        traj_io.save_tum(path, ts, poses)

    def save_trajectory_kitti(self, path: str) -> None:
        poses = np.stack([p for _, p in self.trajectory])
        traj_io.save_kitti(path, poses)

    def n_keyframes(self) -> int:
        return int(self.map.n_kf)

    def n_points(self) -> int:
        return int(jnp.sum(self.map.pt_valid))

    # ------------------------------------------------------------ state machine

    def _track(self, frame: frame_mod.FrameData, timestamp: float) -> np.ndarray:
        cfg = self.config

        if self.state == STATE_NOT_INITIALIZED:
            n_depth = int(jnp.sum(frame.has_depth()))
            if n_depth >= cfg.tracking.min_init_depth_points:
                self.map, kf_id = self._jit_init_depth(
                    self.map, frame, jnp.int32(self.frame_id), jnp.float32(timestamp)
                )
                self.state = STATE_OK
                self.last_obs_pt = self.map.kf_obs_pt[kf_id]
                self.last_kf_frame_id = self.frame_id
                self._last_kf_inliers = n_depth
            self.Tcw = jnp.eye(4)
        else:
            # Dual-hypothesis motion tracking.  A constant-velocity prior
            # EXTRAPOLATES its own estimation error (error doubles per frame
            # once the window search starts confirming the bad prior), so we
            # also track from the last pose (no extrapolation) and prefer
            # that solution unless the velocity hypothesis is clearly
            # stronger (fast platforms like KITTI, where the static prior's
            # window cannot contain the real motion).  Plays the role of the
            # reference's prior-free TrackReferenceKeyFrame fallback
            # (Tracking.cc:508-519) without needing BoW.
            res_vel = self._jit_track_motion(
                self.map, frame, self.Tcw, self.velocity, self.last_frame,
                self.last_obs_pt, jnp.float32(cfg.tracking.motion_search_radius),
            )
            res_static = self._jit_track_motion(
                self.map, frame, self.Tcw, jnp.eye(4), self.last_frame,
                self.last_obs_pt, jnp.float32(cfg.tracking.motion_search_radius_wide),
            )
            n_vel = int(res_vel.n_inliers)
            n_static = int(res_static.n_inliers)
            res = res_static if n_static >= 0.9 * n_vel else res_vel
            n_inl = int(res.n_inliers)

            lres = self._jit_track_local(self.map, frame, res.Tcw, res.obs_pt)
            n_local = int(lres.n_inliers)

            if n_local >= cfg.tracking.min_inliers_local:
                new_Tcw = lres.Tcw
                self.velocity = new_Tcw @ se3.inverse(self.Tcw)
                self.Tcw = new_Tcw
                self.state = STATE_OK
                self._lost_count = 0
                self.last_obs_pt = lres.obs_pt
                self._prev_inliers = n_local

                if not self.localization_only and self._need_keyframe(lres, frame):
                    self.map, kf_id = self._jit_create_kf(
                        self.map, frame, self.Tcw, lres.obs_pt,
                        jnp.int32(self.frame_id), jnp.float32(timestamp),
                    )
                    self.last_kf_frame_id = self.frame_id
                    self.last_obs_pt = self.map.kf_obs_pt[kf_id]
                    self._last_kf_inliers = n_local
                    if self._local_mapper is not None:
                        self.map = self._local_mapper.process(self.map, kf_id)
                    if self._loop_closer is not None:
                        self.map = self._loop_closer.process(self.map, kf_id)
            else:
                self.state = STATE_LOST
                self._lost_count += 1
                # keep constant-velocity dead reckoning so relocalization (or
                # the next good frame) has a sane prior
                self.Tcw = self.velocity @ self.Tcw
                self.last_obs_pt = jnp.full(
                    frame.capacity, ms.NO_POINT, jnp.int32
                ) if self.last_obs_pt is None else self.last_obs_pt

        self.last_frame = frame
        self.frame_id += 1
        Tcw_np = np.asarray(self.Tcw)
        self.trajectory.append((timestamp, Tcw_np))
        return Tcw_np

    def _need_keyframe(self, lres, frame) -> bool:
        """Keyframe policy (reference Tracking::NeedNewKeyFrame
        src/Tracking.cc:1509-1648), deterministic pipelined variant: no
        mapping-queue-occupancy dependence."""
        cfg = self.config.tracking
        if int(self.map.n_kf) >= self.config.caps.max_keyframes:
            return False
        frames_since = self.frame_id - self.last_kf_frame_id
        if frames_since < cfg.min_frames_between_kf:
            return False
        n_inl = int(lres.n_inliers)
        if n_inl < 15:
            return False
        # Redundancy vs the best existing keyframe: what fraction of the
        # current inliers does the most-covisible KF also observe?  The
        # reference's c2 compares inliers against the reference KF's tracked
        # points (Tracking.cc:1621); this ratio measures the same "is this
        # view already covered" quantity but stays meaningful while the
        # observation graph is young.
        overlap = int(lres.ref_shared) / max(n_inl, 1)
        c1 = frames_since >= cfg.max_frames_between_kf
        c2 = overlap < cfg.kf_ref_ratio_stereo
        c4 = n_inl < cfg.kf_attrition_ratio * self._last_kf_inliers
        # stereo/RGB-D close-point rule (:1585-1605): many close depth
        # features not yet in the map -> insert
        n_close_new = int(
            jnp.sum(
                frame.has_depth()
                & (frame.depth < self.config.th_depth)
                & (lres.obs_pt < 0)
            )
        )
        n_close_tracked = int(
            jnp.sum(
                (lres.obs_pt >= 0) & frame.has_depth()
                & (frame.depth < self.config.th_depth)
            )
        )
        c3 = (n_close_tracked < cfg.kf_min_close_points) and (
            n_close_new > cfg.kf_min_new_close
        )
        return bool(c1 or c2 or c3 or c4)
