"""Fleet tracking: S independent camera streams in one sharded program.

The production-serving scaling mode for tracking itself: each stream's map +
carry live device-resident on its shard of a 1-axis ("map") mesh, and ONE
jit-compiled shard_map program advances every stream by a chunk of frames
(the fused per-frame pipeline under lax.scan, models/pipeline.py).  Streams
are independent, so the program contains no cross-device collectives — it
scales linearly over chips/hosts (DCN-friendly), which is how a SLAM service
tracks many cameras at once.

The reference has no analogue (one process = one camera, SURVEY §2.3); this
is pure added capability from the sharded-state design.  Each device runs its
local streams as statically-unrolled scans, preserving the lax.cond keyframe
branches (a vmap over streams would degrade cond to select and run the
mapping phase every frame on every stream).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import pipeline
from ..models import map_state as ms
from ..models.config import SlamConfig


def make_fleet_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), ("map",))


class FleetTracker:
    """Lockstep tracker for `n_streams` RGB-D or stereo streams.

    Usage:
        fleet = FleetTracker(cfg, n_streams=8, sensor="rgbd")
        fleet.initialize(images0, depths0, ts0)        # frame 0 per stream
        poses = fleet.track_chunk(images, depths, ts)  # [S, B, 4, 4]
    """

    def __init__(self, config: SlamConfig, n_streams: int,
                 sensor: str = "rgbd", mesh: Optional[Mesh] = None,
                 enable_mapping: bool = True, localization_only: bool = False):
        self.config = config
        self.sensor = sensor
        self.mesh = mesh if mesh is not None else make_fleet_mesh()
        D = self.mesh.devices.size
        if n_streams % D != 0:
            raise ValueError(f"n_streams={n_streams} not divisible by "
                             f"mesh size {D}")
        self.n_streams = n_streams
        self.local = n_streams // D
        self._sharding = NamedSharding(self.mesh, P("map"))
        self.map = None      # stacked [S, ...] MapState
        self.carry = None    # stacked [S, ...] TrackCarry
        self.trajectories = [[] for _ in range(n_streams)]
        # per-stream serving state, refreshed each track_chunk: tracking
        # alive, and the localization-mode VO flag (the reference's mbVO —
        # "map support lost, tracking on temporal VO points",
        # src/Tracking.cc:538-541); a serving deployment watches these
        self.state_ok = np.ones(n_streams, bool)
        self.vo = np.zeros(n_streams, bool)

        batch_fn = (pipeline.batch_steps_rgbd_packed if sensor == "rgbd"
                    else pipeline.batch_steps_stereo_packed)
        local = self.local

        def body(m, carry, buf):
            outs = []
            for i in range(local):
                mi = jax.tree.map(lambda x: x[i], m)
                ci = jax.tree.map(lambda x: x[i], carry)
                mi, ci, pk = batch_fn(config, mi, ci, buf[i],
                                      localization_only=localization_only,
                                      run_mapping=enable_mapping
                                      and not localization_only)
                outs.append((mi, ci, pk))
            return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

        self._step = jax.jit(
            jax.shard_map(
                body, mesh=self.mesh,
                in_specs=(P("map"), P("map"), P("map")),
                out_specs=(P("map"), P("map"), P("map")),
                check_vma=False,
            ),
            donate_argnums=(0, 1),
        )
        init_fn = (pipeline.init_rgbd if sensor == "rgbd"
                   else pipeline.init_stereo)
        self._init = jax.jit(functools.partial(init_fn, config))
        self._pack = (pipeline.pack_rgbd_chunk if sensor == "rgbd"
                      else pipeline.pack_stereo_chunk)

    # ------------------------------------------------------------------ API

    def initialize(self, a0: np.ndarray, b0: np.ndarray,
                   ts0: np.ndarray) -> None:
        """Initialize every stream from its first frame.  a0: [S, H, W]
        images; b0: [S, H, W] depths (rgbd) or right images (stereo)."""
        maps, carries = [], []
        for s in range(self.n_streams):
            m = ms.empty_map(self.config)
            m, carry, _ = self._init(m, jnp.asarray(a0[s], jnp.float32),
                                     jnp.asarray(b0[s], jnp.float32),
                                     jnp.float32(ts0[s]))
            maps.append(m)
            carries.append(carry)
            self.trajectories[s].append((float(ts0[s]), np.eye(4, dtype=np.float32)))
        stack = lambda xs: jax.device_put(
            jax.tree.map(lambda *y: jnp.stack(y), *xs), self._sharding)
        self.map = stack(maps)
        self.carry = stack(carries)

    def initialize_localization(self, prebuilt_map, a0: np.ndarray,
                                b0: np.ndarray, ts0: np.ndarray) -> np.ndarray:
        """Localization-serving bring-up: every stream relocalizes its first
        frame against a PREBUILT map (models/checkpoint.py; the reference's
        Localization Mode on a frozen map, Tracking.cc:523-629) instead of
        building its own.  `prebuilt_map`: one MapState (shared by all
        streams) or a list of per-stream MapStates.  Returns [S] success
        flags; failed streams start at identity and will dead-reckon until
        their content overlaps the map."""
        import functools as _ft

        from ..models import frame as frame_mod
        from ..models.relocalization import relocalize

        if self.config.vocab is None:
            raise ValueError("localization bring-up needs a vocabulary")
        if isinstance(prebuilt_map, ms.MapState):  # NamedTuple IS a tuple
            prebuilt_map = [prebuilt_map] * self.n_streams
        mk = jax.jit(_ft.partial(
            frame_mod.make_frame_rgbd if self.sensor == "rgbd"
            else frame_mod.make_frame_stereo, self.config))
        rl = jax.jit(_ft.partial(relocalize, self.config))
        key = jax.random.PRNGKey(3)
        maps, carries, ok = [], [], []
        for s in range(self.n_streams):
            m = prebuilt_map[s]
            frame = mk(jnp.asarray(a0[s], jnp.float32),
                       jnp.asarray(b0[s], jnp.float32))
            key, sub = jax.random.split(key)
            reloc = rl(m, frame, sub)
            carry = pipeline.init_carry(self.config, frame)
            success = bool(reloc.success)
            obs_r = jnp.where(success, reloc.obs_pt, carry.last_obs_pt)
            carry = carry._replace(
                Tcw=jnp.where(success, reloc.Tcw, jnp.eye(4)),
                last_obs_pt=obs_r,
                last_obs_birth=jnp.where(
                    obs_r >= 0,
                    m.pt_birth[jnp.clip(obs_r, 0, m.max_pt - 1)], 0),
                frame_id=jnp.int32(1),
                state_ok=jnp.array(success),
            )
            maps.append(m)
            carries.append(carry)
            ok.append(success)
            self.trajectories[s].append(
                (float(ts0[s]), np.asarray(carry.Tcw)))
        stack = lambda xs: jax.device_put(
            jax.tree.map(lambda *y: jnp.stack(y), *xs), self._sharding)
        self.map = stack(maps)
        self.carry = stack(carries)
        return np.asarray(ok)

    def track_chunk(self, a: np.ndarray, b: np.ndarray,
                    ts: np.ndarray) -> np.ndarray:
        """Advance all streams by one chunk.  a/b: [S, B, H, W]; ts: [S, B].
        Returns per-frame poses [S, B, 4, 4]."""
        S, B = a.shape[:2]
        assert S == self.n_streams
        if self.sensor == "rgbd":
            au = np.clip(a, 0, 255).astype(np.uint8)
            bu = np.clip(np.asarray(b) * 1e3, 0, 65535).astype(np.uint16)
        else:
            au = np.clip(a, 0, 255).astype(np.uint8)
            bu = np.clip(b, 0, 255).astype(np.uint8)
        valid = np.ones(B, bool)
        buf = np.stack([
            self._pack(au[s], bu[s], np.asarray(ts[s], np.float32), valid)
            for s in range(S)
        ])
        buf = jax.device_put(jnp.asarray(buf), self._sharding)
        self.map, self.carry, packed = self._step(self.map, self.carry, buf)
        packed = np.asarray(packed)  # [S, B, X] one fetch
        poses = np.zeros((S, B, 4, 4), np.float32)
        for s in range(S):
            infos = pipeline.unpack_infos(packed[s])
            poses[s] = infos.Tcw
            self.state_ok[s] = bool(infos.state_ok[-1])
            self.vo[s] = bool(infos.vo[-1])
            for b_i in range(B):
                self.trajectories[s].append((float(ts[s][b_i]),
                                             np.asarray(infos.Tcw[b_i])))
        return poses

    def stream_map(self, s: int) -> ms.MapState:
        """Fetch one stream's MapState to host (e.g. for joint_refine)."""
        return jax.tree.map(lambda x: jnp.asarray(np.asarray(x[s])), self.map)

    def n_keyframes(self) -> np.ndarray:
        return np.asarray(self.map.n_kf)

    def n_points(self) -> np.ndarray:
        return np.asarray(self.map.n_pt)
