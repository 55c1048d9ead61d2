"""ORB feature extraction: pyramid, FAST, orientation, rotated BRIEF.

TPU-native redesign of the reference ORBextractor (src/ORBextractor.cc): all
stages are dense, batched image-wide ops (shift-and-compare FAST, moment-map
convolutions for orientation, gather-based BRIEF) instead of per-keypoint
scalar loops; spatial uniformity comes from grid-cell top-k selection instead
of the sequential quad-tree.
"""

from .extractor import OrbConfig, OrbFeatures, build_extractor  # noqa: F401
