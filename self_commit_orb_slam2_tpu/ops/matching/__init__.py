"""Descriptor matching kernels: Hamming tables, masked windowed search, stereo."""

from .hamming import hamming_table, hamming_distance  # noqa: F401
from .core import (  # noqa: F401
    MatchResult,
    masked_best_match,
    mutual_best_match,
    rotation_consistency_mask,
    window_mask,
)
