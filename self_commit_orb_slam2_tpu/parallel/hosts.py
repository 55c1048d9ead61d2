"""Multi-host bring-up: jax.distributed + global mesh construction.

The reference's "communication backend" is shared memory + mutexes inside
one process (SURVEY §2.3); ours is the JAX runtime: every host runs this
same program, `jax.distributed.initialize` wires the hosts into one runtime,
and the meshes built here span ALL devices — collectives in
parallel/distributed_ba.py / distributed_pose_graph.py then ride ICI inside
a slice and DCN across hosts with no code changes (the in_specs/out_specs
are device-count-agnostic).

Single-host usage needs none of this; multi-host usage:

    from self_commit_orb_slam2_tpu.parallel import hosts
    hosts.initialize()                  # env-driven (TPU pods: automatic)
    mesh = hosts.global_mesh(n_map=2)   # ("map", "blk") over all devices

On TPU pods the coordinator/process ids come from the environment and
`initialize()` needs no arguments; elsewhere pass coordinator_address,
num_processes, process_id explicitly.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import MeshSpec, make_mesh

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Idempotent jax.distributed bring-up (no-op if already initialized or
    single-process)."""
    global _initialized
    if _initialized:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    else:
        # Decide single- vs multi-process WITHOUT touching the backend:
        # jax.process_count() would initialize XLA, after which
        # jax.distributed.initialize() raises on exactly the multi-host
        # environment this path targets.  Env markers cover TPU pods
        # (TPU_WORKER_HOSTNAMES / MEGASCALE_*) and explicit JAX coordinators.
        import os

        markers = ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                   "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS",
                   "CLOUD_TPU_TASK_ID")
        if num_processes in (None, 1) and not any(os.environ.get(k) for k in markers):
            _initialized = True  # single process: nothing to wire
            return
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        # Only the benign double-init cases fall through (distributed service
        # already up, or the XLA backend was touched first in what is in fact
        # a single-process runtime — e.g. a dev box whose env carries pod-ish
        # markers).  Every other failure — and any failure when the caller
        # explicitly asked for >1 processes — is a real multi-host bring-up
        # error: silently degrading a pod job to uncoordinated single-process
        # behavior would corrupt it.
        msg = str(e).lower()
        benign = ("already initialized" in msg
                  or ("before any jax calls" in msg
                      and (num_processes in (None, 1))))
        if not benign:
            raise
    _initialized = True


def global_mesh(n_map: int = 1, n_blk: Optional[int] = None) -> Mesh:
    """("map", "blk") mesh over every device of every host.

    Lay the map axis across HOSTS first (maps are independent: their traffic
    tolerates DCN), keeping each map's blk stripe inside one host/slice so
    the psum/all_gather reductions stay on ICI.
    """
    devs = jax.devices()
    total = len(devs)
    if total % n_map:
        raise ValueError(f"{total} devices not divisible by n_map={n_map}")
    n_blk = n_blk or total // n_map
    if n_map * n_blk > total:
        raise ValueError(f"mesh {n_map}x{n_blk} exceeds {total} devices")
    # jax.devices() orders by (process, local id): reshaping to
    # [n_map, n_blk] groups contiguous (same-host) devices on the blk axis
    return make_mesh(MeshSpec(n_map=n_map, n_blk=n_blk), devices=devs)


def local_device_count() -> int:
    return jax.local_device_count()


def is_coordinator() -> bool:
    return jax.process_index() == 0


def fold_in_process(seed: int) -> np.random.Generator:
    """Per-host RNG (e.g. for host-side RANSAC set sampling)."""
    return np.random.default_rng(seed + 1315423911 * jax.process_index())
