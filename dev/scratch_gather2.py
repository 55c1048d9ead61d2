#!/usr/bin/env python
"""Patch extraction + fused orientation/BRIEF variants."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from self_commit_orb_slam2_tpu.ops.orb.brief_pattern import BIT_PATTERN_31
from self_commit_orb_slam2_tpu.ops.orb.orientation import _DX, _DY, HALF_PATCH

R = 30
N = 512
L, H0, W0 = 8, 240, 320
PS = 48

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
    iota = jnp.arange(PS, dtype=jnp.int32)

    def starts(xy, level):
        r = PS // 2 - 2
        x0 = jnp.clip(xy[:, 0].astype(jnp.int32) - r, 0, W0 - PS)
        y0 = jnp.clip(xy[:, 1].astype(jnp.int32) - r, 0, H0 - PS)
        return x0, y0

    def patches_rowtake(slab, xy, level):
        """rows via take(axis=0) on [L*H0, W0], cols via one-hot matmul."""
        slab2d = slab.reshape(L * H0, W0)
        x0, y0 = starts(xy, level)
        rowidx = level[:, None] * H0 + y0[:, None] + iota[None, :]  # [N, PS]
        rows = jnp.take(slab2d, rowidx.reshape(-1), axis=0).reshape(N, PS, W0)
        V = (jnp.arange(W0, dtype=jnp.int32)[None, :, None]
             == (x0[:, None, None] + iota[None, None, :])).astype(jnp.float32)
        pat = jnp.einsum("npw,nwq->npq", rows, V)  # [N, PS, PS]
        return pat, x0, y0

    def patches_ds(slab, xy, level):
        x0, y0 = starts(xy, level)

        def one(lv, ys, xs):
            return jax.lax.dynamic_slice(slab, (lv, ys, xs), (1, PS, PS))[0]

        return jax.vmap(one)(level, y0, x0), x0, y0

    def sample_onehot(pat, x0, y0, xy, angle):
        ca, sa = jnp.cos(angle), jnp.sin(angle)
        rx = jnp.round(px * ca[:, None] - py * sa[:, None])
        ry = jnp.round(px * sa[:, None] + py * ca[:, None])
        lx = jnp.clip((xy[:, 0:1] + rx).astype(jnp.int32) - x0[:, None], 0, PS - 1)
        ly = jnp.clip((xy[:, 1:2] + ry).astype(jnp.int32) - y0[:, None], 0, PS - 1)
        U = (ly[:, :, None] == iota).astype(jnp.float32)
        V = (lx[:, :, None] == iota).astype(jnp.float32)
        t = jnp.einsum("nsp,npq->nsq", U, pat)
        return jnp.sum(t * V, axis=-1)

    def orient_from_pat(pat, x0, y0, xy):
        """moments over the 31x31 disc inside the 48-patch via one-hot."""
        d = jnp.arange(-HALF_PATCH, HALF_PATCH + 1, dtype=jnp.int32)
        oy = (xy[:, 1].astype(jnp.int32) - y0)[:, None] + d[None, :]  # [N, 31]
        ox = (xy[:, 0].astype(jnp.int32) - x0)[:, None] + d[None, :]
        U = (oy[:, :, None] == iota).astype(jnp.float32)  # [N, 31, PS]
        V = (ox[:, :, None] == iota).astype(jnp.float32)
        t = jnp.einsum("nip,npq->niq", U, pat)            # [N, 31, PS]
        p31 = jnp.einsum("niq,njq->nij", t, V)            # [N, 31, 31]
        kx = jnp.asarray(_DX)
        ky = jnp.asarray(_DY)
        m10 = jnp.sum(p31 * kx, axis=(1, 2))
        m01 = jnp.sum(p31 * ky, axis=(1, 2))
        return jnp.arctan2(m01, m10)

    def full_C(slab, xy, level, angle):
        pat, x0, y0 = patches_ds(slab, xy, level)
        return sample_onehot(pat, x0, y0, xy, angle)

    def full_E(slab, xy, level, angle):
        pat, x0, y0 = patches_rowtake(slab, xy, level)
        return sample_onehot(pat, x0, y0, xy, angle)

    def fused_all(slab, xy, level):
        """shared patches -> orientation -> descriptor samples."""
        pat, x0, y0 = patches_rowtake(slab, xy, level)
        ang = orient_from_pat(pat, x0, y0, xy)
        return sample_onehot(pat, x0, y0, xy, ang), ang

    def fused_all_ds(slab, xy, level):
        pat, x0, y0 = patches_ds(slab, xy, level)
        ang = orient_from_pat(pat, x0, y0, xy)
        return sample_onehot(pat, x0, y0, xy, ang), ang

    scan_time("patches rowtake", lambda s, x, l: patches_rowtake(s, x, l)[0],
              slab, xy, level)
    scan_time("patches dynamic_slice", lambda s, x, l: patches_ds(s, x, l)[0],
              slab, xy, level)
    scan_time("C  ds-patch + onehot sample", full_C, slab, xy, level, angle)
    scan_time("E  rowtake-patch + onehot sample", full_E, slab, xy, level, angle)
    scan_time("FUSED rowtake: orient+describe", fused_all, slab, xy, level)
    scan_time("FUSED ds: orient+describe", fused_all_ds, slab, xy, level)

    a = jax.jit(full_C)(slab, xy, level, angle)
    e = jax.jit(full_E)(slab, xy, level, angle)
    print("E == C:", bool(jnp.all(a == e)))


if __name__ == "__main__":
    main()


def dual():
    rng = np.random.default_rng(0)
    slab = jnp.asarray(rng.uniform(0, 255, (L, H0, W0)).astype(np.float32))
    slab_b = slab * 0.9
    big = jnp.stack([slab, slab_b])  # [2, L, H0, W0]
    xy = jnp.asarray(
        np.stack([rng.integers(16, W0 - 16, N), rng.integers(16, H0 - 16, N)], -1)
        .astype(np.float32))
    level = jnp.asarray(rng.integers(0, L, N).astype(np.int32))
    iota = jnp.arange(PS, dtype=jnp.int32)
    px = jnp.asarray(_PATTERN_XY[:, 0])[None, :]
    py = jnp.asarray(_PATTERN_XY[:, 1])[None, :]

    def starts(xy):
        r = PS // 2 - 2
        x0 = jnp.clip(xy[:, 0].astype(jnp.int32) - r, 0, W0 - PS)
        y0 = jnp.clip(xy[:, 1].astype(jnp.int32) - r, 0, H0 - PS)
        return x0, y0

    def patches_dual(big, xy, level):
        x0, y0 = starts(xy)

        def one(lv, ys, xs):
            return jax.lax.dynamic_slice(big, (0, lv, ys, xs), (2, 1, PS, PS))[:, 0]

        return jax.vmap(one)(level, y0, x0), x0, y0  # [N, 2, PS, PS]

    def fused_dual(big, xy, level):
        pat2, x0, y0 = patches_dual(big, xy, level)
        raw, blur = pat2[:, 0], pat2[:, 1]
        # orientation from raw
        d = jnp.arange(-HALF_PATCH, HALF_PATCH + 1, dtype=jnp.int32)
        oy = (xy[:, 1].astype(jnp.int32) - y0)[:, None] + d[None, :]
        ox = (xy[:, 0].astype(jnp.int32) - x0)[:, None] + d[None, :]
        U = (oy[:, :, None] == iota).astype(jnp.float32)
        V = (ox[:, :, None] == iota).astype(jnp.float32)
        t = jnp.einsum("nip,npq->niq", U, raw)
        p31 = jnp.einsum("niq,njq->nij", t, V)
        m10 = jnp.sum(p31 * jnp.asarray(_DX), axis=(1, 2))
        m01 = jnp.sum(p31 * jnp.asarray(_DY), axis=(1, 2))
        ang = jnp.arctan2(m01, m10)
        # describe from blur
        ca, sa = jnp.cos(ang), jnp.sin(ang)
        rx = jnp.round(px * ca[:, None] - py * sa[:, None])
        ry = jnp.round(px * sa[:, None] + py * ca[:, None])
        lx = jnp.clip((xy[:, 0:1] + rx).astype(jnp.int32) - x0[:, None], 0, PS - 1)
        ly = jnp.clip((xy[:, 1:2] + ry).astype(jnp.int32) - y0[:, None], 0, PS - 1)
        Us = (ly[:, :, None] == iota).astype(jnp.float32)
        Vs = (lx[:, :, None] == iota).astype(jnp.float32)
        ts = jnp.einsum("nsp,npq->nsq", Us, blur)
        return jnp.sum(ts * Vs, axis=-1), ang

    scan_time("patches dual-slab slice", lambda b, x, l: patches_dual(b, x, l)[0],
              big, xy, level)
    scan_time("FUSED dual: orient+describe", fused_dual, big, xy, level)


if len(sys.argv) > 1 and sys.argv[1] == "dual":
    dual()
