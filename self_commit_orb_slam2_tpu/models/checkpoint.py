"""Map checkpoint / resume.

The reference left SaveMap/LoadMap as a TODO (reference include/System.h:146-
149); here it is a real feature: the whole MapState pytree round-trips
through one compressed npz, enabling persistent maps, localization-only
deployments against prebuilt maps, and distributed restore.

Entries are keyed by FIELD NAME (plus a schema-version entry), so adding or
reordering MapState fields never silently corrupts old checkpoints: unknown
extra entries are rejected loudly, and fields a checkpoint predates are
synthesized from documented defaults where safe.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .map_state import MapState

SCHEMA_VERSION = 2

# Fields added after a checkpoint format existed, with shape-aware default
# factories (arg = the partially-loaded field dict).  Only fields whose
# default is semantically safe belong here.
_FIELD_DEFAULTS = {
    # pre-round-4 checkpoints had no live spanning tree: -1 (root) falls back
    # to the temporal chain in essential_tree_edges, the old behavior
    "kf_tree_parent_seq": lambda d: np.full(d["kf_valid"].shape[0], -1,
                                            np.int32),
    # pre-round-5 checkpoints had no per-point birth stamp (slot-reuse guard);
    # 0 matches what carries re-derive on their first post-load frame
    "pt_birth": lambda d: np.zeros(d["pt_valid"].shape[0], np.int32),
}


def save_map(path: str, m: MapState) -> None:
    arrays = {name: np.asarray(leaf) for name, leaf in m._asdict().items()}
    arrays["__schema_version__"] = np.int32(SCHEMA_VERSION)
    np.savez_compressed(path, **arrays)


def load_map(path: str) -> MapState:
    z = np.load(path)
    if "__schema_version__" not in z.files:
        raise ValueError(
            f"{path}: not a name-keyed map checkpoint (no schema version; "
            "pre-round-5 positional checkpoints must be re-saved)")
    fields = MapState._fields
    d = {name: z[name] for name in z.files if name != "__schema_version__"}
    unknown = set(d) - set(fields)
    if unknown:
        raise ValueError(f"{path}: unknown MapState fields {sorted(unknown)} "
                         "(checkpoint from a newer schema?)")
    for name in fields:
        if name not in d:
            factory = _FIELD_DEFAULTS.get(name)
            if factory is None:
                raise ValueError(f"{path}: missing MapState field '{name}' "
                                 "with no known default")
            d[name] = factory(d)
    return MapState(**{k: jnp.asarray(v) for k, v in d.items()})
