"""Profile the stereo frame phase vs batch size at the EuRoC geometry.

The round-5 euroc bench showed chunk-batched frame construction COSTING
more per frame (11.5 ms) than single-frame construction (5.4 ms) — this
breaks the whole premise of the two-dispatch chunk pipeline.  Measure
extract_batch and the full make_frames_stereo_batch at B in {1,2,4,8}.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from self_commit_orb_slam2_tpu.models import frame as frame_mod
from self_commit_orb_slam2_tpu.models.config import (
    Capacities, SlamConfig, TrackingConfig,
)
from self_commit_orb_slam2_tpu.ops.camera import CameraParams
from self_commit_orb_slam2_tpu.ops.orb import extractor as orb_extractor
from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig
from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import functools as _f  # noqa
    W, H, FX, NF = (int(x) for x in os.environ.get(
        "GEOM", "752,480,458,1200").split(","))
    seq = generate_sequence(n_frames=8, width=W, height=H, fx=FX, seed=5,
                            stereo_baseline=0.11)
    cam = CameraParams.create(fx=FX, fy=FX, cx=W / 2, cy=H / 2,
                              bf=FX * 0.11, width=W, height=H)
    cfg = SlamConfig(camera=cam, orb=OrbConfig(n_features=NF),
                     caps=Capacities(), tracking=TrackingConfig(),
                     sensor="stereo")
    il = jnp.asarray(seq.images, jnp.float32)
    ir = jnp.asarray(seq.right_images, jnp.float32)

    ex1 = jax.jit(functools.partial(orb_extractor.extract, config=cfg.orb))
    t = timeit(lambda x: ex1(x), il[0])
    print(f"extract single           : {t:7.2f} ms/frame", flush=True)

    exb = jax.jit(functools.partial(orb_extractor.extract_batch,
                                    config=cfg.orb))
    for B in (2, 4, 8, 16):
        x = jnp.concatenate([il[: B // 2], ir[: B // 2]], axis=0) \
            if B <= 16 else None
        t = timeit(lambda y: exb(y), x)
        print(f"extract_batch B={B:2d}       : {t:7.2f} ms total "
              f"({t / B:5.2f} ms/image)", flush=True)

    mk1 = jax.jit(functools.partial(frame_mod.make_frame_stereo, cfg))
    t = timeit(lambda a, b: mk1(a, b), il[0], ir[0])
    print(f"make_frame_stereo single : {t:7.2f} ms/frame", flush=True)

    mkb = jax.jit(functools.partial(frame_mod.make_frames_stereo_batch, cfg))
    for B in (2, 4, 8):
        t = timeit(lambda a, b: mkb(a, b), il[:B], ir[:B])
        print(f"make_frames_stereo B={B}   : {t:7.2f} ms total "
              f"({t / B:5.2f} ms/frame)", flush=True)


if __name__ == "__main__":
    main()


def parts():
    """Attribute make_frame_stereo cost: extraction pair vs stereo match."""
    import functools
    W, H, FX, NF = (int(x) for x in os.environ.get(
        "GEOM", "752,480,458,1200").split(","))
    seq = generate_sequence(n_frames=2, width=W, height=H, fx=FX, seed=5,
                            stereo_baseline=0.11)
    cam = CameraParams.create(fx=FX, fy=FX, cx=W / 2, cy=H / 2,
                              bf=FX * 0.11, width=W, height=H)
    cfg = SlamConfig(camera=cam, orb=OrbConfig(n_features=NF),
                     caps=Capacities(), tracking=TrackingConfig(),
                     sensor="stereo")
    from self_commit_orb_slam2_tpu.ops.matching import stereo as stereo_ops
    from self_commit_orb_slam2_tpu.ops.orb.pyramid import level_shapes
    il = jnp.asarray(seq.images[0], jnp.float32)
    ir = jnp.asarray(seq.right_images[0], jnp.float32)

    pair = jax.jit(functools.partial(orb_extractor.extract_pair,
                                     config=cfg.orb))
    out = pair(il, ir)
    jax.block_until_ready(out)
    t = timeit(lambda a, b: pair(a, b), il, ir)
    print(f"extract_pair             : {t:7.2f} ms", flush=True)

    fl, fr, sl, sr = pair(il, ir)
    dims = level_shapes(H, W, cfg.orb.n_levels, cfg.orb.scale_factor)
    sf = jnp.asarray(cfg.orb.scale_factors())

    ms = jax.jit(functools.partial(stereo_ops.match_stereo,
                                   level_dims=dims))
    args = (fl.xy, fl.level, fl.desc, fl.valid,
            fr.xy, fr.level, fr.desc, fr.valid,
            sl, sr, cam.bf, cam.baseline, sf)
    t = timeit(lambda: ms(*args), reps=20)
    print(f"match_stereo             : {t:7.2f} ms", flush=True)

    # hamming table alone
    from self_commit_orb_slam2_tpu.ops.matching.hamming import hamming_table
    ht = jax.jit(hamming_table)
    t = timeit(lambda: ht(fl.desc, fr.desc, fl.valid, fr.valid), reps=20)
    print(f"hamming_table            : {t:7.2f} ms", flush=True)


if os.environ.get("PARTS") == "1":
    main = parts
