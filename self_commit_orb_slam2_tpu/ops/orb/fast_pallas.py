"""Fused FAST-9-16 + 3x3 NMS as one Pallas TPU kernel.

TPU-native replacement for the per-cell scalar FAST of
ORBextractor::ComputeKeyPointsOctTree (reference src/ORBextractor.cc:1052-1199).
The pure-XLA formulation in fast.py materializes ~10 full-image intermediates
per threshold in HBM; this kernel computes BOTH thresholds (the reference's
20 -> 7 fallback pair) and their non-max suppressions in a single pass with
the image tile resident in VMEM — HBM traffic is one image read and two
score-map writes.

Layout: grid over row tiles; each step DMAs a (TILE+8)-row halo window from
the edge-padded image in HBM into VMEM scratch.  Ring neighbors are static
row slices of lane-rolled copies (vertical halo is exact; horizontal wrap
from the roll is confined to a 3px border that is masked off — keypoints
carry a 16px border margin anyway, reference EDGE_THRESHOLD=19).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast import ARC_LENGTH, RING_OFFSETS

_HALO = 4  # 3 (FAST ring) + 1 (NMS)


def _fast_nms_kernel(img_hbm, hi_ref, lo_ref, scratch, sem, *,
                     thr_hi: float, thr_lo: float, tile: int, h: int, w: int):
    i = pl.program_id(0)
    copy = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * tile, tile + 2 * _HALO)], scratch, sem
    )
    copy.start()
    copy.wait()
    block = scratch[:]                       # [tile+8, Wp]
    wp = block.shape[1]

    # lane-rolled copies, one per distinct dx of the Bresenham ring
    # (pltpu.roll wants non-negative shifts; out[:, j] = block[:, j + dx])
    rolled = {dx: pltpu.roll(block, (-dx) % wp, axis=1) for dx in range(-3, 4)}

    # score rows cover the tile plus one NMS halo row on each side:
    # local row L in [3, tile+5) -> global row g = i*tile + L - 4
    T2 = tile + 2
    p = block[3:3 + T2, :]

    def arc_and_score(thr):
        t = jnp.float32(thr)
        bits_b = jnp.zeros(p.shape, jnp.uint32)
        bits_d = jnp.zeros(p.shape, jnp.uint32)
        sum_b = jnp.zeros(p.shape, jnp.float32)
        sum_d = jnp.zeros(p.shape, jnp.float32)
        for k, (dy, dx) in enumerate(RING_OFFSETS):
            ring = rolled[int(dx)][3 + int(dy):3 + int(dy) + T2, :]
            bmask = ring > p + t
            dmask = ring < p - t
            bit = jnp.uint32(1 << k)
            bits_b = bits_b | jnp.where(bmask, bit, jnp.uint32(0))
            bits_d = bits_d | jnp.where(dmask, bit, jnp.uint32(0))
            sum_b = sum_b + jnp.where(bmask, ring - p - t, 0.0)
            sum_d = sum_d + jnp.where(dmask, p - t - ring, 0.0)

        def has_arc(bits):
            acc = bits
            for k in range(1, ARC_LENGTH):
                rot = ((bits << k) | (bits >> (16 - k))) & jnp.uint32(0xFFFF)
                acc = acc & rot
            return acc != 0

        corner = has_arc(bits_b) | has_arc(bits_d)
        return jnp.where(corner, jnp.maximum(sum_b, sum_d), 0.0)

    row_l = jax.lax.broadcasted_iota(jnp.int32, (T2, wp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (T2, wp), 1)
    g_row = i * tile + row_l - 1             # global image row of score row
    inb = ((g_row >= _HALO) & (g_row < h - _HALO)
           & (col >= _HALO) & (col < w - _HALO))

    def nms(score):
        # vertical neighbors via static row slices (axis-0 rolls on a
        # non-sublane-aligned height miscompile); horizontal via lane roll
        score = jnp.where(inb, score, 0.0)
        center = score[1:1 + tile, :]
        keep = jnp.ones(center.shape, bool)
        for dy in (-1, 0, 1):
            sv = score[1 + dy:1 + dy + tile, :]
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                sh = pltpu.roll(sv, (-dx) % wp, axis=1)
                if dy < 0 or (dy == 0 and dx < 0):
                    keep = keep & (center > sh)   # earlier raster: strict
                else:
                    keep = keep & (center >= sh)
        return jnp.where(keep, center, 0.0)

    hi_ref[:] = nms(arc_and_score(thr_hi))
    lo_ref[:] = nms(arc_and_score(thr_lo))


def _fast_band_kernel(img_hbm, hi_max_ref, hi_arg_ref, lo_max_ref, lo_arg_ref,
                      scratch, sem, *, thr_hi: float, thr_lo: float,
                      tile: int, h: int, w: int, H0p: int,
                      dims, border: int, n_levels: int):
    """FAST + NMS + per-level border mask + 16-row band max/argmax, fused.

    Writes only [tile//16, wp] band maxima (and the in-band argrow) per
    threshold instead of full score maps: the full-resolution scores never
    leave VMEM, which removes ~2x the slab's HBM traffic plus the entire
    XLA-side mask/pad/transpose/reduce chain over full score maps."""
    i = pl.program_id(0)
    copy = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * tile, tile + 2 * _HALO)], scratch, sem
    )
    copy.start()
    copy.wait()
    block = scratch[:]
    wp = block.shape[1]

    rolled = {dx: pltpu.roll(block, (-dx) % wp, axis=1) for dx in range(-3, 4)}
    T2 = tile + 2
    p = block[3:3 + T2, :]

    def arc_and_score(thr):
        t = jnp.float32(thr)
        bits_b = jnp.zeros(p.shape, jnp.uint32)
        bits_d = jnp.zeros(p.shape, jnp.uint32)
        sum_b = jnp.zeros(p.shape, jnp.float32)
        sum_d = jnp.zeros(p.shape, jnp.float32)
        for k, (dy, dx) in enumerate(RING_OFFSETS):
            ring = rolled[int(dx)][3 + int(dy):3 + int(dy) + T2, :]
            bmask = ring > p + t
            dmask = ring < p - t
            bit = jnp.uint32(1 << k)
            bits_b = bits_b | jnp.where(bmask, bit, jnp.uint32(0))
            bits_d = bits_d | jnp.where(dmask, bit, jnp.uint32(0))
            sum_b = sum_b + jnp.where(bmask, ring - p - t, 0.0)
            sum_d = sum_d + jnp.where(dmask, p - t - ring, 0.0)

        def has_arc(bits):
            acc = bits
            for k in range(1, ARC_LENGTH):
                rot = ((bits << k) | (bits >> (16 - k))) & jnp.uint32(0xFFFF)
                acc = acc & rot
            return acc != 0

        corner = has_arc(bits_b) | has_arc(bits_d)
        return jnp.where(corner, jnp.maximum(sum_b, sum_d), 0.0)

    row_l = jax.lax.broadcasted_iota(jnp.int32, (T2, wp), 0)
    col2 = jax.lax.broadcasted_iota(jnp.int32, (T2, wp), 1)
    g_row2 = i * tile + row_l - 1
    inb = ((g_row2 >= _HALO) & (g_row2 < h - _HALO)
           & (col2 >= _HALO) & (col2 < w - _HALO))

    def nms(score):
        score = jnp.where(inb, score, 0.0)
        center = score[1:1 + tile, :]
        keep = jnp.ones(center.shape, bool)
        for dy in (-1, 0, 1):
            sv = score[1 + dy:1 + dy + tile, :]
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                sh = pltpu.roll(sv, (-dx) % wp, axis=1)
                if dy < 0 or (dy == 0 and dx < 0):
                    keep = keep & (center > sh)
                else:
                    keep = keep & (center >= sh)
        return jnp.where(keep, center, 0.0)

    # per-level border validity of the tile's center rows (the reference
    # allows FAST from EDGE_THRESHOLD-3 but keypoints carry a `border` margin
    # — same mask select_keypoints_slab applies, folded into the kernel)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile, wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile, wp), 1)
    g_row = i * tile + rows
    slc = g_row // H0p
    row_in = g_row - slc * H0p
    lvl = slc % n_levels
    hr = jnp.zeros((tile, wp), jnp.int32)
    wr = jnp.zeros((tile, wp), jnp.int32)
    for l, (hl, wl) in enumerate(dims[:n_levels]):
        hr = jnp.where(lvl == l, hl, hr)
        wr = jnp.where(lvl == l, wl, wr)
    valid = ((row_in >= border) & (row_in < hr - border)
             & (cols >= border) & (cols < wr - border) & (g_row < h))

    def bands(score):
        score = jnp.where(valid, score, 0.0)
        maxs, args = [], []
        for b in range(tile // 16):
            sb = score[b * 16:(b + 1) * 16, :]
            mx = jnp.max(sb, axis=0, keepdims=True)          # [1, wp]
            ri = jax.lax.broadcasted_iota(jnp.int32, sb.shape, 0)
            ar = jnp.min(jnp.where(sb == mx, ri, 16), axis=0,
                         keepdims=True)                      # first argmax
            maxs.append(mx)
            args.append(ar)
        return jnp.concatenate(maxs, 0), jnp.concatenate(args, 0)

    hi_max_ref[0], hi_arg_ref[0] = bands(nms(arc_and_score(thr_hi)))
    lo_max_ref[0], lo_arg_ref[0] = bands(nms(arc_and_score(thr_lo)))


@functools.partial(jax.jit, static_argnames=(
    "thr_hi", "thr_lo", "H0p", "dims", "border", "n_levels"))
def fast_nms_bands_hi_lo(image: jnp.ndarray, thr_hi: float, thr_lo: float,
                         H0p: int, dims: tuple, border: int, n_levels: int):
    """[G*H0p, W0] stacked slab -> 16-row band max/argmax per threshold.

    Returns (hi_max, hi_arg, lo_max, lo_arg), each [G*H0p//16, wp] with the
    per-level border mask already applied (zeros outside).  H0p must be a
    multiple of 16 so bands never straddle slab slices."""
    h, w = image.shape
    assert H0p % 16 == 0 and h % H0p == 0
    wp = w + (-w) % 128
    tile = 128 if wp <= 384 else (64 if wp <= 768 else 32)
    grid = pl.cdiv(h, tile)
    pad_bottom = grid * tile + _HALO - h
    padded = jnp.pad(image, ((_HALO, pad_bottom), (0, wp - w)), mode="edge")

    kernel = functools.partial(
        _fast_band_kernel, thr_hi=thr_hi, thr_lo=thr_lo, tile=tile, h=h, w=w,
        H0p=H0p, dims=dims, border=border, n_levels=n_levels,
    )
    nb = tile // 16
    # 3D blocks (1, nb, wp): Mosaic requires the last two block dims to be
    # (8, 128)-aligned OR equal to the array dims — nb (2/4/8) is the full
    # dim-1 here, so any tile height works
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=tuple(
            pl.BlockSpec((1, nb, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((grid, nb, wp), jnp.float32),
            jax.ShapeDtypeStruct((grid, nb, wp), jnp.int32),
            jax.ShapeDtypeStruct((grid, nb, wp), jnp.float32),
            jax.ShapeDtypeStruct((grid, nb, wp), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * _HALO, wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(padded)
    nbands = h // 16
    return tuple(o.reshape(grid * nb, wp)[:nbands] for o in out)


@functools.partial(jax.jit, static_argnames=("thr_hi", "thr_lo"))
def fast_nms_hi_lo(image: jnp.ndarray, thr_hi: float, thr_lo: float):
    """[H, W] f32 -> (hi, lo) NMS'd FAST score maps, one fused TPU kernel."""
    h, w = image.shape
    # tile height bounded by VMEM: the kernel keeps ~57 (tile+8, wp) f32
    # arrays live (measured via Mosaic's scoped-vmem accounting)
    wp_ = w + (-w) % 128
    tile = 128 if wp_ <= 384 else (64 if wp_ <= 768 else 32)
    grid = pl.cdiv(h, tile)
    # pad rows so every halo window [i*tile, i*tile + tile + 8) is in bounds
    # (P[r + HALO] = image[r]) and columns to the 128-lane width Mosaic DMA
    # requires; the column padding sits beyond the masked border
    wp = w + (-w) % 128
    pad_bottom = grid * tile + _HALO - h
    padded = jnp.pad(image, ((_HALO, pad_bottom), (0, wp - w)), mode="edge")

    kernel = functools.partial(
        _fast_nms_kernel, thr_hi=thr_hi, thr_lo=thr_lo, tile=tile, h=h, w=w
    )
    hi, lo = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(
            pl.BlockSpec((tile, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((grid * tile, wp), jnp.float32),
            jax.ShapeDtypeStruct((grid * tile, wp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * _HALO, wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(padded)
    return hi[:h, :w], lo[:h, :w]
