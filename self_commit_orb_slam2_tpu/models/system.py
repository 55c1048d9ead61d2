"""Public API facade + host-side state machine.

TPU-native counterpart of the reference System (src/System.cc) and the
control-flow parts of Tracking (the NOT_INITIALIZED/OK/LOST state machine,
Tracking.cc:419-786).  All per-frame compute is ONE fused jit call
(models/pipeline.py); this class holds the device-resident MapState/TrackCarry
pytrees between calls, fetches a handful of scalars per frame, and records
the trajectory.

Where the reference runs Tracking / LocalMapping / LoopClosing in three
mutex-synchronized threads (System.cc:116-145), this engine runs them as
pipelined phases inside the fused step (tracking every frame; mapping under
an in-graph lax.cond on keyframe insertion) plus a periodic loop-closing
phase — same dataflow, no shared mutable state.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import trajectory as traj_io
from . import map_state as ms
from . import pipeline
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
        # Localization-mode "tracking on VO points, map support lost" flag
        # (the reference's mbVO, src/Tracking.cc:538-541)
        self.vo_mode = False
        self.enable_mapping = enable_mapping

        self.carry: Optional[pipeline.TrackCarry] = None
        self.trajectory: list[tuple[float, np.ndarray]] = []
        # Reference-relative trajectory (timestamp, ref_kf_id, T_cr): poses
        # are recomposed against the CURRENT keyframe poses at save time, so
        # loop-closure corrections propagate to the whole trajectory
        # (reference System::SaveTrajectoryTUM, src/System.cc:414-503).
        self._rel_trajectory: list[tuple[float, int, np.ndarray]] = []
        self.timings: list[float] = []
        self.Tcw = jnp.eye(4)

        cfg = config
        self._mono_first = None   # (FrameData, timestamp) awaiting init
        self._mono_first_ts = 0.0
        self._mono_key = jax.random.PRNGKey(11)
        # jit variants: (sensor, localization_only) -> fused step
        self._steps = {}
        for loc in (False, True):
            self._steps[("rgbd", loc)] = jax.jit(
                functools.partial(pipeline.step_rgbd, cfg, localization_only=loc,
                                  run_mapping=enable_mapping),
                donate_argnums=(0, 1),
            )
            self._steps[("stereo", loc)] = jax.jit(
                functools.partial(pipeline.step_stereo, cfg, localization_only=loc,
                                  run_mapping=enable_mapping),
                donate_argnums=(0, 1),
            )
            self._steps[("mono", loc)] = jax.jit(
                functools.partial(pipeline.step_mono, cfg, localization_only=loc,
                                  run_mapping=enable_mapping),
                donate_argnums=(0, 1),
            )
        # Chunk streaming = TWO async dispatches: a batched frame phase
        # (whole chunk through one extraction chain) + a tracking-only scan.
        # They must stay separate jits — one fused graph miscompiles the
        # scan's rematerialized xs on the axon TPU backend (round-4 note in
        # pipeline.batch_steps_rgbd).
        self._frame_fns = {
            "rgbd": jax.jit(functools.partial(pipeline.frames_rgbd_packed, cfg)),
            "stereo": jax.jit(functools.partial(pipeline.frames_stereo_packed, cfg)),
            "mono": jax.jit(functools.partial(pipeline.frames_mono_packed, cfg)),
        }
        self._scan_fns = {}
        self._batches = {}
        for loc in (False, True):
            for sensor in ("rgbd", "stereo", "mono"):
                scan = jax.jit(
                    functools.partial(pipeline.batch_steps_frames, cfg,
                                      localization_only=loc,
                                      run_mapping=enable_mapping),
                    donate_argnums=(0, 1),
                )
                self._scan_fns[(sensor, loc)] = scan
                frame_fn = self._frame_fns[sensor]

                def batch(m, carry, buf, frame_fn=frame_fn, scan=scan):
                    frames, ts, valid = frame_fn(buf)
                    return scan(m, carry, frames, ts, valid)

                self._batches[(sensor, loc)] = batch
        self._init_rgbd = jax.jit(
            functools.partial(pipeline.init_rgbd, cfg), donate_argnums=0
        )
        self._init_stereo = jax.jit(
            functools.partial(pipeline.init_stereo, cfg), donate_argnums=0
        )
        self._jit_reloc = None
        if cfg.vocab is not None:
            from . import relocalization

            self._jit_reloc = jax.jit(
                functools.partial(relocalization.relocalize, cfg)
            )
        self._reloc_key = jax.random.PRNGKey(0)
        # streaming chunk size for _track_batch (frames per device dispatch);
        # small enough that upload(k+1) overlaps compute(k), large enough to
        # amortize the tunnel's per-transfer stall.  Round-3 sweeps picked 8
        # for large frames, but with the round-4 two-dispatch frame/scan
        # split and async StepInfo fetches chunk 4 wins everywhere: the
        # chunk-8 pyramid-slab working set costs ~10% device throughput at
        # both 640x480 (151.9 -> 164.7 fps) and KITTI width (48.9 -> 53.6),
        # and quiet-machine e2e is equal or better (39.5 vs 41.7/34.2).
        self._batch_chunk = int(os.environ.get("SLAM_BATCH_CHUNK", "4"))
        self._last_big_change = 0
        self._loop_closer = None
        if enable_loop_closing:
            from .loop_closing import LoopCloser

            self._loop_closer = LoopCloser(cfg)

    def warm_start(self) -> None:
        """Pre-compile the loop-closing programs (detection + correction +
        async GBA) AND prime the streaming pipeline — the runtime analogue
        of the reference's seconds-long ORBvoc load at startup
        (src/System.cc:77-89).  Optional; everything also compiles lazily,
        but without priming the first timed window of a stream pays the
        scan compile plus the tunnel's transfer ramp (measured 8 fps vs 39
        steady-state in round 4)."""
        if self._loop_closer is not None and self._loop_closer.enabled:
            self._loop_closer.warmup(self.map)
        self._prime_stream()

    def _prime_stream(self) -> None:
        """Compile the chunked frame+scan programs and push two dummy packed
        chunks through upload + both dispatches on scratch state, covering
        the jit compiles and the transfer-pipeline ramp before the first
        real frame arrives.  The dummy chunks carry valid=False so the scan
        takes only its skip branches (compilation covers both)."""
        sensor = self.config.sensor
        cam = self.config.camera
        H, W = int(cam.height), int(cam.width)
        C = self._batch_chunk
        per_frame = {"rgbd": 3 * H * W + 8, "stereo": 2 * H * W + 8,
                     "mono": H * W + 8}[sensor]
        frame_fn = self._frame_fns[sensor]
        scan = self._scan_fns[(sensor, self.localization_only)]
        host_buf = np.zeros((C, per_frame), np.uint8)
        m = ms.empty_map(self.config)
        carry = None
        # several rounds: the remote tunnel's transfer path ramps with data
        # volume (TCP-style), so a single dummy upload leaves the first real
        # window under-ramped
        for _ in range(6):
            buf = jnp.asarray(host_buf)
            frames, ts, valid = frame_fn(buf)
            if carry is None:
                frame0 = jax.tree.map(lambda x: x[0], frames)
                carry = pipeline.init_carry(self.config, frame0)
            m, carry, packed = scan(m, carry, frames, ts, valid)
        jax.block_until_ready(packed)

    # ------------------------------------------------------------- public API

    def track_rgbd(self, image: np.ndarray, depth: np.ndarray, timestamp: float) -> np.ndarray:
        t0 = time.perf_counter()
        out = self._track(
            "rgbd",
            (jnp.asarray(image, jnp.float32), jnp.asarray(depth, jnp.float32)),
            timestamp,
        )
        self.timings.append(time.perf_counter() - t0)
        return out

    def track_monocular(self, image: np.ndarray, timestamp: float) -> np.ndarray:
        """Reference System::TrackMonocular (src/System.cc:292)."""
        t0 = time.perf_counter()
        out = self._track("mono", (jnp.asarray(image, jnp.float32),), timestamp)
        self.timings.append(time.perf_counter() - t0)
        return out

    def track_stereo(self, image_l: np.ndarray, image_r: np.ndarray, timestamp: float) -> np.ndarray:
        t0 = time.perf_counter()
        out = self._track(
            "stereo",
            (jnp.asarray(image_l, jnp.float32), jnp.asarray(image_r, jnp.float32)),
            timestamp,
        )
        self.timings.append(time.perf_counter() - t0)
        return out

    def track_batch_rgbd(self, images: np.ndarray, depths: np.ndarray,
                         timestamps: np.ndarray,
                         chunk: Optional[int] = None) -> np.ndarray:
        """Throughput mode: process a frame batch as a stream of fixed-size
        chunked device calls.  The first frame initializes the map if needed.
        Returns [B, 4, 4] per-frame poses (as tracked; use get_trajectory()
        for the loop-corrected version)."""
        depths_mm = np.clip(np.asarray(depths) * 1e3, 0, 65535).astype(np.uint16)
        return self._track_batch(
            "rgbd",
            (np.clip(images, 0, 255).astype(np.uint8), depths_mm),
            timestamps, chunk, pipeline.pack_rgbd_chunk,
        )

    def track_batch_stereo(self, images_l: np.ndarray, images_r: np.ndarray,
                           timestamps: np.ndarray,
                           chunk: Optional[int] = None) -> np.ndarray:
        """Stereo throughput mode (see track_batch_rgbd)."""
        return self._track_batch(
            "stereo",
            (np.clip(images_l, 0, 255).astype(np.uint8),
             np.clip(images_r, 0, 255).astype(np.uint8)),
            timestamps, chunk, pipeline.pack_stereo_chunk,
        )

    def track_batch_mono(self, images: np.ndarray, timestamps: np.ndarray,
                         chunk: Optional[int] = None) -> np.ndarray:
        """Monocular throughput mode (see track_batch_rgbd).  The two-frame
        bootstrap runs through the per-frame path until the map initializes
        (possibly consuming several leading frames); the rest stream in
        chunks."""
        return self._track_batch(
            "mono",
            (np.clip(images, 0, 255).astype(np.uint8),),
            timestamps, chunk, pipeline.pack_mono_chunk,
        )

    def open_stream(self, sensor: str, chunk: Optional[int] = None):
        """Open a persistent streaming session (models/streaming.py): feed()
        chunks for the lifetime of a run without the per-call pipeline
        teardown the one-shot batch API implies.  The reference analogue is
        the standing Tracking thread + its queues (src/System.cc:116-145).
        At most one session may be active at a time (the map is donated
        through each chunk)."""
        from .streaming import StreamSession

        return StreamSession(self, sensor, chunk)

    def _track_batch(self, sensor: str, arrays: tuple, timestamps: np.ndarray,
                     chunk: Optional[int], pack) -> np.ndarray:
        """Chunked streaming batch tracker (one-shot wrapper around a
        StreamSession: feed everything, finish, return the poses).

        Frames go to the device in fixed-size chunks (ONE compiled program
        for every chunk; only the final chunk is padded).  Each chunk's
        inputs are packed into ONE uint8 buffer — the tunnel pays ~2.7ms
        latency per transfer, so one buffer beats four arrays.  Dispatch is
        asynchronous, so chunk k+1's host->device transfer overlaps chunk
        k's compute.  Per-frame summaries are fetched via bounded ASYNC
        device->host copies (each blocking fetch costs a full round trip on
        a remote-attached TPU; measured ~75-100ms over the tunnel)."""
        t0 = time.perf_counter()
        sess = self.open_stream(sensor, chunk)
        sess.feed(arrays, timestamps)
        poses = sess.finish()
        if len(poses) == 0:
            return np.asarray(self.Tcw)[None]
        B = len(poses)
        dt = (time.perf_counter() - t0) / max(B, 1)
        self.timings.extend([dt] * B)
        return poses

    def _consume_chunk_infos(self, packed, snapshot=None) -> np.ndarray:
        """Consume one chunk-group's packed StepInfo (already host-copied
        when called from the streaming path) and DISPATCH loop detection for
        every keyframe created in it — corrections land asynchronously via
        LoopCloser.resolve.  Keyframes are identified by SEQ number — with
        free-list slot reuse a slot can be culled and reassigned between
        creation and processing, so the slot is re-resolved against the map
        snapshot taken at enqueue time and seqs no longer live are skipped."""
        arr = np.asarray(packed)
        infos = pipeline.unpack_infos(arr)
        created = np.nonzero(infos.created_kf)[0]
        if len(created):
            kf_seq, kf_valid = (
                (np.asarray(snapshot[0]), np.asarray(snapshot[1]))
                if snapshot is not None
                else jax.device_get((self.map.kf_seq, self.map.kf_valid)))
            slots, b_last = [], None
            for b in created:
                seq = int(infos.ref_kf_seq[b])
                slot = int(infos.ref_kf[b])
                if (not 0 <= slot < len(kf_seq)) or kf_seq[slot] != seq \
                        or not kf_valid[slot]:
                    live = np.nonzero((kf_seq == seq) & kf_valid)[0]
                    if len(live) == 0:
                        continue  # culled before loop processing could run
                    slot = int(live[0])
                slots.append(slot)
                b_last = b
            if slots:
                # re-base payload: the newest keyframe's pose delta (the
                # chain-end correction is what the live tracking state must
                # follow) — applied by the caller when the correction fires
                self._loop_closer.dispatch_group(
                    self.map, slots,
                    rebase=(slots[-1], infos.ref_kf_Tcw[b_last]))
        return arr

    def _apply_correction_to_carry(self, kf_slot: int,
                                   kf_Tcw_at_track: np.ndarray) -> None:
        """Propagate a loop correction into the live tracking state.

        CorrectLoop rewrites keyframe poses (reference LoopClosing.cc:571+,
        which also updates the current keyframe the Tracking thread hangs
        off); our device-resident carry would otherwise keep predicting from
        the PRE-correction pose while the local map has moved by the
        correction — a jump that can exceed the projection search windows
        and degrade tracking right after every closure.  The carry pose is
        re-based by the reference keyframe's pose delta."""
        if self.carry is None:
            return
        kf_new = np.asarray(self.map.kf_Tcw[kf_slot])
        # preserve the camera-to-keyframe RELATIVE pose: new_Tcw =
        # Tcw · Tkw_old⁻¹ · Tkw_new (the delta acts in the keyframe's frame,
        # not the camera's — left-multiplying applied it in camera coords
        # and the error grew with the camera–keyframe offset)
        new_Tcw = jnp.asarray(
            (np.asarray(self.carry.Tcw)
             @ np.linalg.inv(np.asarray(kf_Tcw_at_track))
             @ kf_new).astype(np.float32))
        self.carry = self.carry._replace(Tcw=new_Tcw)
        self.Tcw = new_Tcw

    def activate_localization_mode(self) -> None:
        """Reference System::ActivateLocalizationMode (src/System.cc:346)."""
        self.localization_only = True

    def deactivate_localization_mode(self) -> None:
        self.localization_only = False

    def reset(self) -> None:
        """Reference Tracking::Reset (src/Tracking.cc:2242): clear everything."""
        self.map = ms.empty_map(self.config)
        self.state = STATE_NOT_INITIALIZED
        self.carry = None
        self.trajectory = []
        self._rel_trajectory = []
        self.Tcw = jnp.eye(4)

    def shutdown(self) -> None:  # parity with reference System::Shutdown
        pass

    def get_trajectory(self) -> tuple[np.ndarray, np.ndarray]:
        """(timestamps, poses_cw) with loop-closure corrections applied:
        each frame's T_cr is composed with its reference keyframe's CURRENT
        (possibly corrected) pose.  References are SEQ numbers: live ones
        resolve via the slot map; culled ones walk the archived parent chain
        (reference SaveTrajectoryTUM, src/System.cc:438-460)."""
        kf_poses = np.asarray(self.map.kf_Tcw)
        kf_valid = np.asarray(self.map.kf_valid)
        kf_seq = np.asarray(self.map.kf_seq)
        cull_seq = np.asarray(self.map.cull_seq)
        cull_parent = np.asarray(self.map.cull_parent_seq)
        cull_Tcp = np.asarray(self.map.cull_Tcp)
        seq_to_slot = {int(s): i for i, s in enumerate(kf_seq)
                       if kf_valid[i] and s >= 0}
        seq_to_arch = {int(s): i for i, s in enumerate(cull_seq) if s >= 0}

        def resolve(seq: int) -> np.ndarray:
            T = np.eye(4)
            guard = 0
            while seq not in seq_to_slot and guard < 64:
                a = seq_to_arch.get(seq)
                if a is None:
                    break
                T = T @ cull_Tcp[a]
                seq = int(cull_parent[a])
                guard += 1
            if seq not in seq_to_slot:
                # unresolvable (archive ring overwrote it, or the parent
                # chain is deeper than the hop guard): nearest older live
                # keyframe is the best remaining anchor
                older = [s for s in seq_to_slot if s <= seq]
                seq = max(older) if older else min(seq_to_slot)
            return T @ kf_poses[seq_to_slot[seq]]

        ts = np.array([t for t, _, _ in self._rel_trajectory])
        poses = np.stack([
            Tcr @ resolve(ref) for _, ref, Tcr in self._rel_trajectory
        ]) if self._rel_trajectory else np.zeros((0, 4, 4))
        return ts, poses

    def save_trajectory_tum(self, path: str) -> None:
        ts, poses = self.get_trajectory()
        traj_io.save_tum(path, ts, poses)

    def save_trajectory_kitti(self, path: str) -> None:
        _, poses = self.get_trajectory()
        traj_io.save_kitti(path, poses)

    def save_keyframe_trajectory_tum(self, path: str) -> None:
        """Keyframe-only trajectory (reference System::SaveKeyFrameTrajectoryTUM
        src/System.cc:505-549): surviving keyframes' optimized poses."""
        valid, ts, poses = jax.device_get(
            (self.map.kf_valid, self.map.kf_timestamp, self.map.kf_Tcw)
        )
        traj_io.save_tum(path, ts[valid], poses[valid])

    def map_changed(self) -> bool:
        """Poll for big map changes — loop closures / global BA (reference
        System::MapChanged src/System.cc:362-374 via Map::InformNewBigChange
        src/Map.cc:111-119).  Returns True once per change."""
        idx = self._loop_closer.n_big_changes if self._loop_closer else 0
        changed = idx != self._last_big_change
        self._last_big_change = idx
        return changed

    def save_map(self, path: str) -> None:
        """Persist the map (the reference's System.h:146-149 SaveMap TODO,
        implemented)."""
        from .checkpoint import save_map

        save_map(path, self.map)

    def load_map(self, path: str) -> None:
        """Restore a map; typically followed by activate_localization_mode()
        + relocalization against it."""
        from .checkpoint import load_map

        self.map = load_map(path)
        self.state = STATE_NOT_INITIALIZED if int(self.map.n_kf) == 0 else STATE_LOST

    def n_keyframes(self) -> int:
        return int(self.map.n_kf)

    def n_points(self) -> int:
        return int(jnp.sum(self.map.pt_valid))

    @property
    def last_obs_pt(self):
        return self.carry.last_obs_pt if self.carry is not None else None

    @property
    def last_frame(self):
        return self.carry.last_frame if self.carry is not None else None

    # ------------------------------------------------------------ state machine

    def _track(self, sensor: str, images: tuple, timestamp: float) -> np.ndarray:
        if self.state == STATE_NOT_INITIALIZED and sensor == "mono":
            return self._mono_initialize(images[0], timestamp)
        if self.state == STATE_NOT_INITIALIZED:
            init = self._init_rgbd if sensor == "rgbd" else self._init_stereo
            m, carry, n_depth = init(self.map, *images, jnp.float32(timestamp))
            if int(n_depth) >= self.config.tracking.min_init_depth_points:
                self.map, self.carry = m, carry
                self.state = STATE_OK
                self.Tcw = jnp.eye(4)
                self._rel_trajectory.append((timestamp, 0, np.eye(4)))
            else:  # not enough depth features: drop the premature keyframe
                self.map = ms.empty_map(self.config)
                self.carry = None
        else:
            step = self._steps[(sensor, self.localization_only)]
            self.map, self.carry, info = step(
                self.map, self.carry, *images, jnp.float32(timestamp)
            )
            self.Tcw = info.Tcw
            self.state = STATE_OK if bool(info.state_ok) else STATE_LOST
            self.vo_mode = bool(info.vo)
            if self.state == STATE_LOST and self._jit_reloc is not None:
                # Reference: Tracking falls back to Relocalization when LOST
                # (src/Tracking.cc:523-629, :2030).
                self._reloc_key, sub = jax.random.split(self._reloc_key)
                reloc = self._jit_reloc(self.map, self.carry.last_frame, sub)
                if bool(reloc.success):
                    self.carry = self.carry._replace(
                        Tcw=reloc.Tcw,
                        velocity=jnp.eye(4),
                        last_obs_pt=reloc.obs_pt,
                        last_obs_birth=jnp.where(
                            reloc.obs_pt >= 0,
                            self.map.pt_birth[jnp.clip(
                                reloc.obs_pt, 0, self.map.max_pt - 1)], 0),
                        state_ok=jnp.array(True),
                        # mbVO clears on relocalization success (reference
                        # Tracking.cc:623) — a stale True would keep
                        # want_reloc asserted in localization mode, letting
                        # EPnP override good local-map tracking every frame
                        vo=jnp.array(False),
                    )
                    self.Tcw = reloc.Tcw
                    self.state = STATE_OK
            # record the keyframe-relative pose BEFORE any loop correction:
            # Tcr composed with the ref KF's CURRENT pose at save time is how
            # corrections reach the trajectory (reference SaveTrajectoryTUM)
            Tcr = np.asarray(self.Tcw) @ np.linalg.inv(np.asarray(info.ref_kf_Tcw))
            self._rel_trajectory.append((timestamp, int(info.ref_kf_seq), Tcr))
            if bool(info.created_kf) and self._loop_closer is not None:
                before = self._loop_closer.n_big_changes
                self.map = self._loop_closer.process(self.map, int(info.ref_kf))
                if self._loop_closer.n_big_changes != before:
                    self._apply_correction_to_carry(
                        int(info.ref_kf), np.asarray(info.ref_kf_Tcw))

        Tcw_np = np.asarray(self.Tcw)
        self.trajectory.append((timestamp, Tcw_np))
        return Tcw_np

    def _mono_initialize(self, image, timestamp: float) -> np.ndarray:
        """Two-frame monocular bootstrap (reference
        Tracking::MonocularInitialization, src/Tracking.cc:886)."""
        import functools as _ft

        from . import frame as frame_mod
        from . import mono_init

        if not hasattr(self, "_jit_mono_frame"):
            # DOUBLED feature budget before the map exists (reference
            # mpIniORBextractor = 2x nFeatures, src/Tracking.cc:121-124):
            # bootstrap frames carry 2N candidates; try_initialize keeps the
            # N best (triangulated first) for the fixed-capacity map rows.
            ini_cfg = self.config._replace(orb=self.config.orb._replace(
                n_features=2 * self.config.orb.n_features))
            self._jit_mono_frame = jax.jit(
                _ft.partial(frame_mod.make_frame_mono, ini_cfg)
            )
            self._jit_mono_try = jax.jit(
                _ft.partial(mono_init.try_initialize, self.config)
            )
        frame = self._jit_mono_frame(image)
        n_feat = int(jnp.sum(frame.valid))
        Tcw_np = np.asarray(self.Tcw)
        if self._mono_first is None:
            if n_feat >= 100:
                self._mono_first = frame
                self._mono_first_ts = timestamp
        else:
            if n_feat < 100:
                self._mono_first = None
            else:
                self._mono_key, sub = jax.random.split(self._mono_key)
                res = self._jit_mono_try(
                    self.map, self._mono_first, frame,
                    jnp.float32(self._mono_first_ts), jnp.float32(timestamp),
                    jnp.int32(len(self.trajectory)), sub,
                )
                if bool(res.success):
                    self.map = res.m
                    self.carry = res.carry
                    self.state = STATE_OK
                    self.Tcw = res.carry.Tcw
                    Tcw_np = np.asarray(self.Tcw)
                    self._rel_trajectory.append(
                        (timestamp, 1, np.asarray(
                            Tcw_np @ np.linalg.inv(np.asarray(self.map.kf_Tcw[1])))))
                    self._mono_first = None
                elif int(res.n_matches) < self.config.tracking.mono_init_min_matches:
                    # too few matches: restart from the current frame
                    # (reference Tracking.cc:938-946)
                    self._mono_first = frame
                    self._mono_first_ts = timestamp
        self.trajectory.append((timestamp, Tcw_np))
        return Tcw_np
