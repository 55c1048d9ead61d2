#!/usr/bin/env python
"""Microbench v2: chain ops so each iteration depends on the previous —
measures true device time free of dispatch pipelining artifacts."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

K, N, P = (int(os.environ.get("K", 64)), int(os.environ.get("N", 1024)),
           int(os.environ.get("P", 16384)))
rng = np.random.default_rng(0)
obs = jnp.asarray(rng.integers(-1, P, size=(K, N)).astype(np.int32))


def chain(name, fn, reps=30):
    """fn: (obs, salt:int32) -> scalar-ish; chained via salt."""
    j = jax.jit(lambda o, s: fn(o, s))
    salt = jnp.int32(0)
    salt = j(obs, salt)  # compile
    jax.block_until_ready(salt)
    t0 = time.perf_counter()
    for _ in range(reps):
        salt = j(obs, salt)
    jax.block_until_ready(salt)
    print(f"{name:46s} {(time.perf_counter()-t0)/reps*1e3:8.3f} ms")


def f_obs_count(o, s):
    o = jnp.where(o >= 0, o + s * 0, P + 1)
    c = jnp.zeros(P + 2, jnp.int32).at[o.reshape(-1)].add(1, mode="drop")[:P]
    return jnp.sum(c) % 1000


def f_covis_row(o, s):
    row = o[3] + s * 0
    ind = jnp.zeros(P + 2, bool).at[jnp.where(row >= 0, row, P + 1)].set(True, mode="drop")
    hits = ind[jnp.clip(o, 0, P + 1)] & (o >= 0)
    return jnp.sum(hits) % 1000


def f_inc_build(o, s):
    k_idx = jnp.broadcast_to(jnp.arange(K)[:, None], (K, N))
    oo = jnp.where(o >= 0, o + s * 0, P + 1)
    inc = jnp.zeros((K, P + 2), bool).at[k_idx.reshape(-1), oo.reshape(-1)].set(True, mode="drop")
    return jnp.sum(inc) % 1000


def f_inc_build_and_covis(o, s):
    k_idx = jnp.broadcast_to(jnp.arange(K)[:, None], (K, N))
    oo = jnp.where(o >= 0, o + s * 0, P + 1)
    inc = jnp.zeros((K, P + 2), jnp.bfloat16).at[
        k_idx.reshape(-1), oo.reshape(-1)].max(1.0, mode="drop")[:, :P]
    covis = inc @ inc.T          # [K, K] full covisibility
    cnt = jnp.sum(inc, axis=0)   # [P] obs_count
    return (jnp.sum(covis) + jnp.sum(cnt)).astype(jnp.int32) % 1000


def f_six_covis_rows(o, s):
    # status-quo cost model: 6 independent covisibility_row calls
    tot = jnp.int32(0)
    for k in range(6):
        row = o[k] + s * 0
        ind = jnp.zeros(P + 2, bool).at[jnp.where(row >= 0, row, P + 1)].set(True, mode="drop")
        hits = ind[jnp.clip(o, 0, P + 1)] & (o >= 0)
        tot += jnp.sum(hits)
    return tot % 1000


def f_gather_pos(o, s):
    # typical gather: positions of [N] point ids from [P,3]
    pos = jnp.zeros((P, 3), jnp.float32)
    ids = jnp.clip(o[3] + s * 0, 0, P - 1)
    return jnp.sum(pos[ids]).astype(jnp.int32) % 1000


def f_hamming_block(o, s):
    # [N, N] popcount table, 8 words — the matching workhorse
    d1 = (o[:N // 64].reshape(-1)[: N * 8] + s).reshape(N, 8).astype(jnp.uint32)
    d2 = d1 + 1
    x = d1[:, None, :] ^ d2[None, :, :]
    pc = jax.lax.population_count(x).astype(jnp.int32).sum(-1)
    return jnp.sum(pc) % 1000


chain("noop (dispatch floor)", lambda o, s: s + 1)
chain("obs_count scatter-add", f_obs_count)
chain("covis_row scatter+gather (x1)", f_covis_row)
chain("covis_row scatter+gather (x6)", f_six_covis_rows)
chain("inc build scatter [K,P]", f_inc_build)
chain("inc build + FULL covis + obs_count", f_inc_build_and_covis)
chain("gather pos [N] from [P,3]", f_gather_pos)
chain("hamming [N,N] popcount", f_hamming_block)
