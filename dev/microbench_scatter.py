#!/usr/bin/env python
"""Microbench: scatter-based indicator ops vs matmul/incidence alternatives.

The mapping phase's cost is dominated by [K*N]->[P] scatters
(observation_count, covisibility_row, points_of_keyframes).  TPU scatters
with duplicate indices serialize; this measures the alternatives:

  a) status quo scatter-add / scatter-or
  b) dense bool incidence matrix [K, P] + matvec/reduction
  c) building the incidence itself (the one remaining scatter)
"""

import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

K, N, P = (int(os.environ.get("K", 64)), int(os.environ.get("N", 1024)),
           int(os.environ.get("P", 16384)))

rng = np.random.default_rng(0)
obs = rng.integers(-1, P, size=(K, N)).astype(np.int32)
obs_j = jnp.asarray(obs)
valid = obs_j >= 0


def timeit(name, fn, *args, n=50):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms")
    return out


@jax.jit
def obs_count_scatter(obs):
    o = jnp.where(obs >= 0, obs, P + 1)
    return jnp.zeros(P + 2, jnp.int32).at[o.reshape(-1)].add(1, mode="drop")[:P]


@jax.jit
def build_inc_scatter(obs):
    # [K, P] bool incidence by 2-d scatter
    k_idx = jnp.broadcast_to(jnp.arange(K)[:, None], (K, N))
    o = jnp.where(obs >= 0, obs, P + 1)
    inc = jnp.zeros((K, P + 2), bool)
    inc = inc.at[k_idx.reshape(-1), o.reshape(-1)].set(True, mode="drop")
    return inc[:, :P]


@jax.jit
def build_inc_onehot(obs):
    # one-hot == comparison summed over N, no scatter:
    # inc[k, p] = any_n obs[k, n] == p, done in P-blocks to bound memory
    blk = 2048
    nb = P // blk

    def one(b):
        lo = b * blk
        eq = obs[:, :, None] == (lo + jnp.arange(blk))[None, None, :]
        return jnp.any(eq, axis=1)

    return jnp.concatenate([one(b) for b in range(nb)], axis=1)


@jax.jit
def obs_count_from_inc(inc):
    return jnp.sum(inc.astype(jnp.int32), axis=0)


@jax.jit
def covis_row_scatter(obs, row):
    ind = jnp.zeros(P + 2, bool).at[jnp.where(row >= 0, row, P + 1)].set(True, mode="drop")
    hits = ind[jnp.clip(obs, 0, P + 1)] & (obs >= 0)
    return jnp.sum(hits, axis=1).astype(jnp.int32)


@jax.jit
def covis_full_from_inc(inc):
    f = inc.astype(jnp.bfloat16)
    return (f @ f.T).astype(jnp.int32)


@jax.jit
def covis_row_from_inc(inc, k):
    return (inc.astype(jnp.bfloat16) @ inc[k].astype(jnp.bfloat16)).astype(jnp.int32)


@jax.jit
def build_row_inc_scatter(row):
    return jnp.zeros(P + 2, bool).at[jnp.where(row >= 0, row, P + 1)].set(True, mode="drop")[:P]


print(f"K={K} N={N} P={P}  backend={jax.devices()[0]}")
timeit("obs_count scatter-add [K*N]->[P]", obs_count_scatter, obs_j)
inc = timeit("build inc [K,P] via scatter", build_inc_scatter, obs_j)
inc2 = timeit("build inc [K,P] via onehot-any", build_inc_onehot, obs_j)
print("  inc equal:", bool(jnp.all(inc == inc2)))
timeit("obs_count from inc (reduce)", obs_count_from_inc, inc)
timeit("covis_row scatter (status quo)", covis_row_scatter, obs_j, obs_j[3])
timeit("covis FULL [K,K] from inc (matmul)", covis_full_from_inc, inc)
timeit("covis one row from inc (matvec)", covis_row_from_inc, inc, 3)
timeit("build ONE row inc via scatter [N]->[P]", build_row_inc_scatter, obs_j[3])
