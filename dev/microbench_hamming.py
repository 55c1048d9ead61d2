#!/usr/bin/env python
"""Hamming table: xor+popcount (VPU, [N,M,8] intermediate) vs bit-unpack +
bf16 matmul (MXU).  popcount(a^b) = pc(a) + pc(b) - 2*dot(bits_a, bits_b)."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = int(os.environ.get("N", 1024))
M = int(os.environ.get("M", 1024))
rng = np.random.default_rng(0)
d1 = jnp.asarray(rng.integers(0, 2**32, size=(N, 8), dtype=np.uint64).astype(np.uint32))
d2 = jnp.asarray(rng.integers(0, 2**32, size=(M, 8), dtype=np.uint64).astype(np.uint32))


@jax.jit
def xor_table(d1, d2):
    x = jnp.bitwise_xor(d1[:, None, :], d2[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def unpack_bits(d):  # [N, 8] u32 -> [N, 256] bf16 of {0,1}
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (d[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(d.shape[0], 256).astype(jnp.bfloat16)


@jax.jit
def mxu_table(d1, d2):
    b1 = unpack_bits(d1)
    b2 = unpack_bits(d2)
    inner = jax.lax.dot_general(
        b1, b2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    pc1 = jnp.sum(jax.lax.population_count(d1), -1).astype(jnp.int32)
    pc2 = jnp.sum(jax.lax.population_count(d2), -1).astype(jnp.int32)
    return pc1[:, None] + pc2[None, :] - 2 * inner.astype(jnp.int32)


def timeit(name, fn, *args, n=50):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:36s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms")
    return out


print(f"N={N} M={M} backend={jax.devices()[0]}")
a = timeit("xor+popcount table", xor_table, d1, d2)
b = timeit("bit-unpack + MXU matmul", mxu_table, d1, d2)
print("equal:", bool(jnp.all(a == b)))

# batched (vmap 8 neighbors, the triangulation shape)
d1b = jnp.broadcast_to(d1, (8, N, 8))
timeit("xor table vmap8", jax.jit(jax.vmap(lambda a: xor_table(a, d2))), d1b, n=20)
timeit("mxu table vmap8", jax.jit(jax.vmap(lambda a: mxu_table(a, d2))), d1b, n=20)
