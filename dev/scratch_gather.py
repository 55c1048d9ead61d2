#!/usr/bin/env python
"""Compare keypoint sampling strategies on TPU.

A) global flat gather (current)
B) vmap dynamic_slice patches + take_along_axis in-patch
C) vmap dynamic_slice patches + one-hot matmul in-patch sampling
D) orientation moments from patches via matmul
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from self_commit_orb_slam2_tpu.ops.orb.brief_pattern import BIT_PATTERN_31

R = 30
N = 512
L, H0, W0 = 8, 240, 320
PS = 48  # covers rotated pattern reach +-22

_PATTERN_XY = BIT_PATTERN_31.reshape(256, 2, 2).reshape(512, 2).astype(np.float32)


def scan_time(name, fn, *args):
    def body(acc, _):
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        s = sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
        return acc + s * 1e-30, None

    g = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0.0), None, length=R)[0])
    g()
    out = g()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = g()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / R * 1e3
    print(f"{name:44s} {dt:8.3f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    slab = jnp.asarray(rng.uniform(0, 255, (L, H0, W0)).astype(np.float32))
    xy = jnp.asarray(
        np.stack([rng.integers(16, W0 - 16, N), rng.integers(16, H0 - 16, N)], -1)
        .astype(np.float32))
    level = jnp.asarray(rng.integers(0, L, N).astype(np.int32))
    angle = jnp.asarray(rng.uniform(-np.pi, np.pi, N).astype(np.float32))
    print("backend:", jax.devices()[0])

    px = jnp.asarray(_PATTERN_XY[:, 0])[None, :]
    py = jnp.asarray(_PATTERN_XY[:, 1])[None, :]

    def rot_offsets(angle):
        ca, sa = jnp.cos(angle), jnp.sin(angle)
        rx = jnp.round(px * ca[:, None] - py * sa[:, None])
        ry = jnp.round(px * sa[:, None] + py * ca[:, None])
        return rx, ry

    def A_global(slab, xy, level, angle):
        rx, ry = rot_offsets(angle)
        gx = jnp.clip((xy[:, 0:1] + rx).astype(jnp.int32), 0, W0 - 1)
        gy = jnp.clip((xy[:, 1:2] + ry).astype(jnp.int32), 0, H0 - 1)
        lin = (level * (H0 * W0))[:, None] + gy * W0 + gx
        return jnp.take(slab.reshape(-1), lin)

    def patches3d(slab, xy, level, ps):
        r = ps // 2 - 2
        x0 = jnp.clip(xy[:, 0].astype(jnp.int32) - r, 0, W0 - ps)
        y0 = jnp.clip(xy[:, 1].astype(jnp.int32) - r, 0, H0 - ps)

        def one(lv, ys, xs):
            return jax.lax.dynamic_slice(slab, (lv, ys, xs), (1, ps, ps))[0]

        return jax.vmap(one)(level, y0, x0), x0, y0

    def B_patch_taa(slab, xy, level, angle):
        pat, x0, y0 = patches3d(slab, xy, level, PS)
        rx, ry = rot_offsets(angle)
        lx = jnp.clip((xy[:, 0:1] + rx).astype(jnp.int32) - x0[:, None], 0, PS - 1)
        ly = jnp.clip((xy[:, 1:2] + ry).astype(jnp.int32) - y0[:, None], 0, PS - 1)
        return jnp.take_along_axis(pat.reshape(N, PS * PS), ly * PS + lx, axis=1)

    def C_patch_onehot(slab, xy, level, angle):
        pat, x0, y0 = patches3d(slab, xy, level, PS)
        rx, ry = rot_offsets(angle)
        lx = jnp.clip((xy[:, 0:1] + rx).astype(jnp.int32) - x0[:, None], 0, PS - 1)
        ly = jnp.clip((xy[:, 1:2] + ry).astype(jnp.int32) - y0[:, None], 0, PS - 1)
        iota = jnp.arange(PS, dtype=jnp.int32)
        U = (ly[:, :, None] == iota).astype(jnp.float32)   # [N, S, PS]
        V = (lx[:, :, None] == iota).astype(jnp.float32)   # [N, S, PS]
        t = jnp.einsum("nsp,npq->nsq", U, pat)             # [N, S, PS]
        return jnp.sum(t * V, axis=-1)

    def D_orient_patch(slab, xy, level):
        pat, x0, y0 = patches3d(slab, xy, level, 32)
        # recenter: keypoint at (xy - (x0,y0)); moments via matmul over 32x32
        # (disc kernel baked per offset is impossible since offset varies; use
        # take of 31x31 region via static slice after recompute start)
        return jnp.sum(pat, axis=(1, 2))  # placeholder cost probe

    scan_time("A global gather [512x512]", A_global, slab, xy, level, angle)
    scan_time("B patches + take_along_axis", B_patch_taa, slab, xy, level, angle)
    scan_time("C patches + one-hot matmul", C_patch_onehot, slab, xy, level, angle)
    scan_time("patches3d 48 alone", lambda s, x, l: patches3d(s, x, l, PS)[0],
              slab, xy, level)
    scan_time("patches3d 32 alone", lambda s, x, l: patches3d(s, x, l, 32)[0],
              slab, xy, level)

    a = jax.jit(A_global)(slab, xy, level, angle)
    b = jax.jit(B_patch_taa)(slab, xy, level, angle)
    c = jax.jit(C_patch_onehot)(slab, xy, level, angle)
    print("B == A:", bool(jnp.all(a == b)), " C == A:", bool(jnp.all(a == c)))


if __name__ == "__main__":
    main()
