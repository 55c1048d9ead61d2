"""Multi-chip scaling: device meshes, sharded map state, distributed BA.

The reference's parallelism is three mutex-guarded CPU threads over shared
memory (SURVEY §2.3); there is no distributed compute to port.  This package
is the TPU-native analogue designed from scratch: keyframe/point blocks
sharded over a `jax.sharding.Mesh`, bundle adjustment reducing its Schur
system with psum/all_gather collectives over ICI, and map-parallel processing
of independent sequences (the "KITTI 00+02+05 multi-sequence sharded maps"
configuration).
"""

from .mesh import make_mesh, MeshSpec  # noqa: F401
from .distributed_ba import distributed_bundle_adjust  # noqa: F401
from .distributed_pose_graph import distributed_pose_graph  # noqa: F401
from .multi_map import joint_refine, stack_maps  # noqa: F401
from .fleet import FleetTracker, make_fleet_mesh  # noqa: F401
