"""Persistent chunked streaming session over a live System.

The round-4 throughput-mode implementation rebuilt its transfer pipeline on
every track_batch call and ended each call with a FORCED drain — one full
device round-trip (plus a blocking loop-closer resolve) per call.  For the
one-shot batch API that cost was amortized over the whole batch, but a
long-running stream that feeds chunk-sized batches (the reference-length
bench, a live camera) paid it on every chunk: the 4000-frame sustained run
sat at 25 fps while the chip held 162.

A StreamSession keeps all pipeline state alive across feed() calls:

  * fixed-size chunk dispatches (ONE compiled program; only finish() pads),
  * asynchronous StepInfo fetches with a bounded in-flight queue,
  * per-chunk-group loop-closure dispatch/resolve (never blocking mid-run),
  * the host-side tail of frames that do not yet fill a chunk.

The reference analogue of this object is the standing Tracking thread +
its queues into LocalMapping/LoopClosing (reference src/System.cc:116-145,
src/LocalMapping.cc:175-188, src/LoopClosing.cc:114-130): construct once,
feed frames for the lifetime of the run, never tear down between frames.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from . import pipeline

STATE_NOT_INITIALIZED = 0
STATE_OK = 1
STATE_LOST = 2


class StreamSession:
    """One live stream of frames into a System.  Not thread-safe; at most
    one session may be active per System (chunks donate the map through
    the device, so interleaved sessions would race the donation)."""

    MAX_INFLIGHT = 3

    def __init__(self, system, sensor: str, chunk: Optional[int] = None):
        self.sys = system
        self.sensor = sensor
        self.pack = {"rgbd": pipeline.pack_rgbd_chunk,
                     "stereo": pipeline.pack_stereo_chunk,
                     "mono": pipeline.pack_mono_chunk}[sensor]
        self.C = int(chunk or system._batch_chunk)
        self.loc = system.localization_only  # frozen at open
        self.batch = system._batches[(sensor, self.loc)]
        lc = system._loop_closer
        self.per_chunk_loops = lc is not None and lc.enabled
        self.stride = max(1, int(os.environ.get("SLAM_LOOP_CHUNK_STRIDE", "4")))
        self.upload_burst = max(1, int(os.environ.get("SLAM_UPLOAD_CHUNKS", "1")))
        # host-side remainder that does not yet fill a chunk
        self._tail: list | None = None
        self._tail_ts: list = []
        # packed per-chunk StepInfo awaiting fetch-enqueue (grouped by stride)
        self._pending: list = []
        # in-flight async device->host fetches: (cat, (kf_seq, kf_valid))
        self._inflight: list = []
        self._packed_parts: list = []
        self._all_ts: list = []      # timestamps of every dispatched frame
        self.n_fed = 0

    # ------------------------------------------------------------------ feed

    def feed(self, arrays: tuple, timestamps) -> None:
        """Queue frames (tuple of [B, H, W] uint8/uint16 host arrays + [B]
        timestamps).  Dispatches every full chunk immediately; never blocks
        on results."""
        ts = np.asarray(timestamps, np.float64).reshape(-1)
        arrays = tuple(np.asarray(a) for a in arrays)
        i0 = 0
        if self.sys.state == STATE_NOT_INITIALIZED and self.n_fed == 0 \
                and self._tail is None:
            # bootstrap through the per-frame path: one frame for
            # stereo/RGB-D, possibly several for the monocular two-frame
            # init (which keeps restarting until parallax suffices)
            while self.sys.state == STATE_NOT_INITIALIZED and i0 < len(ts):
                first = tuple(
                    jnp.asarray(a[i0], jnp.float32)
                    * (jnp.float32(1e-3) if a.dtype == np.uint16
                       else jnp.float32(1.0))
                    for a in arrays)
                self.sys._track(self.sensor, first, float(ts[i0]))
                i0 += 1
                if self.sensor != "mono" \
                        and self.sys.state == STATE_NOT_INITIALIZED:
                    raise RuntimeError("initialization failed on first frame")
            if self.sys.state == STATE_NOT_INITIALIZED:
                return  # mono: keep bootstrapping on the next feed
        if i0 >= len(ts):
            return
        if self._tail is None:
            self._tail = [a[i0:] for a in arrays]
            self._tail_ts = list(ts[i0:])
        else:
            self._tail = [np.concatenate([t, a[i0:]])
                          for t, a in zip(self._tail, arrays)]
            self._tail_ts.extend(ts[i0:])
        C = self.C
        # dispatch all full chunks, uploading up to `upload_burst` chunk
        # buffers back-to-back before dispatching them (amortizes the
        # tunnel's per-transfer stall when the caller hands us many chunks)
        n_full = len(self._tail_ts) // C
        k = 0
        bufs: list = []
        while k < n_full:
            while len(bufs) < self.upload_burst and k + len(bufs) < n_full:
                j = k + len(bufs)
                ts_j = self._tail_ts[j * C:(j + 1) * C]
                bufs.append((self._upload(
                    [a[j * C:(j + 1) * C] for a in self._tail], ts_j), ts_j))
            self._dispatch(*bufs.pop(0))
            k += 1
        self._tail = [a[n_full * C:] for a in self._tail]
        self._tail_ts = self._tail_ts[n_full * C:]

    def _upload(self, arrs: list, ts: list) -> jnp.ndarray:
        n_live = len(ts)
        pad = self.C - n_live
        if pad:
            arrs = [np.concatenate([a, np.repeat(a[-1:], pad, axis=0)])
                    for a in arrs]
            ts = list(ts) + [ts[-1]] * pad
        valid = np.zeros(self.C, bool)
        valid[:n_live] = True
        return jnp.asarray(self.pack(
            *arrs, np.asarray(ts, np.float32), valid))

    def _dispatch(self, buf: jnp.ndarray, ts_live: list) -> None:
        self.sys.map, self.sys.carry, packed = self.batch(
            self.sys.map, self.sys.carry, buf)
        n_live = len(ts_live)
        if n_live < self.C:
            packed = packed[:n_live]
        self._all_ts.extend(ts_live)
        self.n_fed += n_live
        if self.per_chunk_loops:
            self._pending.append(packed)
            if len(self._pending) >= self.stride:
                self._enqueue_infos()
            self._drain(False)
        else:
            self._packed_parts.append(packed)

    # ---------------------------------------------------------------- drains

    def _enqueue_infos(self) -> None:
        cat = (self._pending[0] if len(self._pending) == 1
               else jnp.concatenate(self._pending, axis=0))
        self._pending = []
        # device-copy the tiny slot tables: the live map's buffers get
        # DONATED to the next chunk's scan, which would delete the snapshot
        # out from under the async fetch
        snap = (jnp.copy(self.sys.map.kf_seq), jnp.copy(self.sys.map.kf_valid))
        for x in (cat, *snap):
            x.copy_to_host_async()
        self._inflight.append((cat, snap))

    def _drain(self, force: bool) -> None:
        while self._inflight:
            cat, snap = self._inflight[0]
            ready = cat.is_ready() and all(x.is_ready() for x in snap)
            if not ready and not (force or len(self._inflight) > self.MAX_INFLIGHT):
                break
            self._inflight.pop(0)
            self._packed_parts.append(
                self.sys._consume_chunk_infos(cat, snap))
        lc = self.sys._loop_closer
        if lc is not None and lc.pending():
            self.sys.map, fired = lc.resolve(self.sys.map, block=force)
            for rb in fired:
                if rb is not None:
                    self.sys._apply_correction_to_carry(*rb)

    # ---------------------------------------------------------------- finish

    def poll(self) -> None:
        """Opportunistic non-blocking drain (call between feeds on a live
        stream to keep corrections landing promptly)."""
        if self.per_chunk_loops:
            self._drain(False)

    def finish(self) -> np.ndarray:
        """Flush the tail (padded final chunk), block for every outstanding
        fetch / loop resolution, record the trajectory, and return [B, 4, 4]
        poses for every frame dispatched since the session opened."""
        if self._tail is not None and self._tail_ts:
            ts_live = self._tail_ts
            self._dispatch(self._upload(self._tail, ts_live), ts_live)
        self._tail, self._tail_ts = None, []
        if self.per_chunk_loops:
            if self._pending:
                self._enqueue_infos()
            self._drain(True)
        if not self._packed_parts:
            return np.zeros((0, 4, 4), np.float32)
        packed_all = np.concatenate(
            [np.asarray(p) for p in self._packed_parts], axis=0)
        self._packed_parts = []
        infos = pipeline.unpack_infos(packed_all)
        sysm = self.sys
        assert packed_all.shape[0] == len(self._all_ts)
        for b in range(packed_all.shape[0]):
            tsb = float(self._all_ts[b])
            sysm.trajectory.append((tsb, infos.Tcw[b]))
            sysm._rel_trajectory.append(
                (tsb, int(infos.ref_kf_seq[b]),
                 infos.Tcw[b] @ np.linalg.inv(infos.ref_kf_Tcw[b])))
        self._all_ts = []
        sysm.Tcw = jnp.asarray(infos.Tcw[-1])
        sysm.state = STATE_OK if bool(infos.state_ok[-1]) else STATE_LOST
        sysm.vo_mode = bool(infos.vo[-1])
        return infos.Tcw
