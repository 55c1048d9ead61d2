"""TPU-native visual SLAM engine (ORB-SLAM2-class capabilities).

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
C++ system (DreamWaterFound/self_commit_ORB-SLAM2): monocular / stereo / RGB-D
tracking, sparse mapping, place recognition, relocalization, loop closing with
Sim3 pose-graph optimization and global bundle adjustment, SLAM/localization
mode switching, and TUM/KITTI trajectory export.

Architecture (TPU-first, not a port):
  * All per-frame compute (`ops/`) is batched, jit-compiled, fixed-shape with
    validity masks: ORB pyramid+FAST+BRIEF extraction, Hamming matching,
    Gauss-Newton pose optimization, Schur-complement bundle adjustment.
  * Map state (`models/map_state.py`) is a struct-of-arrays pytree (poses
    [K,4,4], descriptors [K,N,8] uint32, points [P,3], observation tables),
    not a pointer graph; culling is masking, `Replace` is index forwarding.
  * The reference's three mutex-guarded threads (Tracking / LocalMapping /
    LoopClosing, reference src/System.cc:116-145) become pipelined phases on
    immutable pytrees driven by a single controller (`models/system.py`).
  * Multi-chip scaling (`parallel/`) shards keyframe/point blocks over a
    `jax.sharding.Mesh`; bundle adjustment reduces its Schur system with
    psum/all_gather collectives instead of shared-memory locks.
"""

import jax as _jax

# SLAM geometry (pose chains, Schur solves, eigen problems) needs true f32
# matmuls; the TPU MXU otherwise defaults to bf16 inputs, which measurably
# corrupts SE3 composition (observed ~5e-3 abs error in 3x3 products).  The
# heavy integer work (Hamming popcount matching) is unaffected by this flag.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the fused per-frame/batched XLA programs take
# minutes to compile at VGA scale; caching them on disk makes every process
# after the first start in seconds (override dir via JAX_COMPILATION_CACHE_DIR,
# disable with SLAM_NO_COMPILE_CACHE=1).
import os as _os

if not _os.environ.get("SLAM_NO_COMPILE_CACHE"):
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                        _os.path.expanduser("~/.cache/slam_tpu_xla")),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

__version__ = "0.1.0"

