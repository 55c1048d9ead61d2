"""Map checkpoint / resume.

The reference left SaveMap/LoadMap as a TODO (reference include/System.h:146-
149); here it is a real feature: the whole MapState pytree round-trips
through one compressed npz, enabling persistent maps, localization-only
deployments against prebuilt maps, and distributed restore.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .config import SlamConfig
from .map_state import MapState


def save_map(path: str, m: MapState) -> None:
    arrays = {f"f{i}": np.asarray(leaf) for i, leaf in enumerate(m)}
    np.savez_compressed(path, **arrays)


def load_map(path: str) -> MapState:
    z = np.load(path)
    leaves = [jnp.asarray(z[f"f{i}"]) for i in range(len(z.files))]
    return MapState(*leaves)
