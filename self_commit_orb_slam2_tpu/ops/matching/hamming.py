"""256-bit Hamming distance kernels.

Elementwise distances use the exact XOR+popcount-over-int32-lanes trick of
the reference's ORBmatcher::DescriptorDistance (src/ORBmatcher.cc:1913-1933).

Full N x M tables are computed on the MXU instead: with descriptors unpacked
to s in {-1,+1}^256, the bit-agreement count is (256 + s1.s2)/2, so

    hamming(d1, d2) = (256 - s1 . s2) / 2

and the whole table is ONE [N, 256] @ [256, M] matmul.  EXACT: the +-1
operands are exact in bf16, products are +-1, and the MXU accumulates in
f32 where every integer in [-256, 256] is representable.  The popcount
formulation materialized an [N, M, 8] XOR intermediate (52 MB at N=M=1280)
and ran on the VPU — measured 2.4 ms per stereo pair at the EuRoC feature
budget vs MXU microseconds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INVALID_DIST = jnp.int32(10_000)  # sentinel > any possible 256-bit distance


def hamming_distance(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise Hamming distance between [..., 8] uint32 descriptors."""
    x = jnp.bitwise_xor(d1, d2)
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def _unpack_pm1(desc: jnp.ndarray) -> jnp.ndarray:
    """[N, 8] uint32 -> [N, 256] bf16 in {-1, +1} (bit=1 -> +1)."""
    bits = (desc[:, :, None] >> jnp.arange(32, dtype=jnp.uint32)) & jnp.uint32(1)
    signs = bits.astype(jnp.bfloat16) * 2 - 1
    return signs.reshape(desc.shape[0], 256)


def hamming_table(desc1: jnp.ndarray, desc2: jnp.ndarray,
                  valid1: jnp.ndarray | None = None,
                  valid2: jnp.ndarray | None = None) -> jnp.ndarray:
    """Full distance table: [N, 8] x [M, 8] -> [N, M] int32 (one MXU matmul).

    Invalid rows/cols get INVALID_DIST so downstream argmins never pick them.
    """
    s1 = _unpack_pm1(desc1)
    s2 = _unpack_pm1(desc2)
    dot = jnp.dot(s1, s2.T, preferred_element_type=jnp.float32)
    table = ((256.0 - dot) * 0.5).astype(jnp.int32)
    if valid1 is not None:
        table = jnp.where(valid1[:, None], table, INVALID_DIST)
    if valid2 is not None:
        table = jnp.where(valid2[None, :], table, INVALID_DIST)
    return table
