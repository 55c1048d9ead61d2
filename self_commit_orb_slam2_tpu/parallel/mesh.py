"""Device mesh construction and axis conventions.

Axes:
  * "map" — data parallelism over independent maps/sequences (multi-sequence
    processing; DCN-friendly, no per-step collectives between maps).
  * "blk" — block parallelism inside one map: map-point blocks (and their
    observation stripes) sharded across chips; BA reductions ride ICI
    (psum/all_gather) along this axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class MeshSpec(NamedTuple):
    n_map: int = 1
    n_blk: int = 1

    @property
    def total(self) -> int:
        return self.n_map * self.n_blk


def make_mesh(spec: MeshSpec, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if spec.total > len(devices):
        raise ValueError(f"mesh {spec} needs {spec.total} devices, have {len(devices)}")
    grid = np.asarray(devices[: spec.total]).reshape(spec.n_map, spec.n_blk)
    return Mesh(grid, ("map", "blk"))


def map_sharding(mesh: Mesh) -> NamedSharding:
    """Arrays with a leading per-map axis: [S, ...] sharded over "map"."""
    return NamedSharding(mesh, P("map"))


def point_block_sharding(mesh: Mesh) -> NamedSharding:
    """Per-map point blocks: [S, P, ...] sharded (map, blk)."""
    return NamedSharding(mesh, P("map", "blk"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
