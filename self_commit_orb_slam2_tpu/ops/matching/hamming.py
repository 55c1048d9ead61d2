"""256-bit Hamming distance kernels.

The exact XOR+popcount-over-int32-lanes trick of the reference's
ORBmatcher::DescriptorDistance (src/ORBmatcher.cc:1913-1933), vectorized to
full N x M distance tables on the VPU via lax.population_count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INVALID_DIST = jnp.int32(10_000)  # sentinel > any possible 256-bit distance


def hamming_distance(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise Hamming distance between [..., 8] uint32 descriptors."""
    x = jnp.bitwise_xor(d1, d2)
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def hamming_table(desc1: jnp.ndarray, desc2: jnp.ndarray,
                  valid1: jnp.ndarray | None = None,
                  valid2: jnp.ndarray | None = None) -> jnp.ndarray:
    """Full distance table: [N, 8] x [M, 8] -> [N, M] int32.

    Invalid rows/cols get INVALID_DIST so downstream argmins never pick them.
    """
    x = jnp.bitwise_xor(desc1[:, None, :], desc2[None, :, :])
    table = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)
    if valid1 is not None:
        table = jnp.where(valid1[:, None], table, INVALID_DIST)
    if valid2 is not None:
        table = jnp.where(valid2[None, :], table, INVALID_DIST)
    return table
