#!/usr/bin/env python
"""Weak-scaling harness for the distributed BA / pose-graph collectives.

Holds the PER-DEVICE load constant while widening the blk axis (each device
owns a fixed point stripe / edge stripe) and reports throughput + scaling
efficiency.  On the CPU backend (XLA_FLAGS=--xla_force_host_platform_
device_count=8) this validates the collective structure and measures its
overhead; on a real pod slice the same script measures ICI scaling
(BASELINE.json: >=70% efficiency to 2 hosts).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/scaling_bench.py [--per-dev-points 512] [--kfs 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# force the CPU backend BEFORE first jax use (the environment's
# sitecustomize force-registers the remote TPU; the env var alone is
# ignored) unless the user explicitly wants the real backend
if os.environ.get("SCALING_BENCH_REAL_BACKEND") != "1":
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count="
                               + os.environ.get("SCALING_BENCH_DEVICES", "8"))
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-dev-points", type=int, default=512)
    ap.add_argument("--kfs", type=int, default=8)
    ap.add_argument("--obs-per-kf", type=int, default=256)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from self_commit_orb_slam2_tpu.ops import se3
    from self_commit_orb_slam2_tpu.ops.camera import CameraParams, project
    from self_commit_orb_slam2_tpu.parallel.distributed_ba import (
        distributed_bundle_adjust,
    )
    from self_commit_orb_slam2_tpu.parallel.mesh import MeshSpec, make_mesh

    n_dev = len(jax.devices())
    cam = CameraParams.create(fx=300.0, fy=300.0, cx=160.0, cy=120.0,
                              bf=30.0, width=320, height=240)
    rng = np.random.default_rng(0)
    K, N = args.kfs, args.obs_per_kf

    results = {}
    widths = [w for w in (1, 2, 4, 8, 16, 32) if w <= n_dev]
    for blk in widths:
        P = args.per_dev_points * blk  # weak scaling: fixed stripe per device
        pt = rng.uniform(-1, 1, (1, P, 3)).astype(np.float32)
        pt[..., 2] += 5.0
        poses = np.zeros((1, K, 4, 4), np.float32)
        obs_pt = np.zeros((1, K, N), np.int32)
        obs_uvr = np.zeros((1, K, N, 3), np.float32)
        for k in range(K):
            xi = jnp.asarray((rng.normal(0, 0.05, 6)).astype(np.float32))
            poses[0, k] = np.asarray(se3.se3_exp(xi))
            sel = rng.choice(P, N, replace=False).astype(np.int32)
            obs_pt[0, k] = sel
            pc = pt[0, sel] @ poses[0, k][:3, :3].T + poses[0, k][:3, 3]
            uv, _ = project(cam, jnp.asarray(pc))
            ur = np.asarray(uv)[:, 0] - float(cam.bf) / pc[:, 2]
            obs_uvr[0, k] = np.concatenate([np.asarray(uv), ur[:, None]], -1)

        mesh = make_mesh(MeshSpec(n_map=1, n_blk=blk))

        def run():
            return distributed_bundle_adjust(
                mesh, cam, jnp.asarray(poses), jnp.asarray(pt),
                jnp.asarray(obs_pt), jnp.asarray(obs_uvr),
                jnp.ones((1, K, N), jnp.float32), jnp.ones((1, K, N), bool),
                jnp.asarray(np.tile(np.arange(K) > 0, (1, 1))
                            if K == 1 else (np.arange(K) > 0)[None]),
                jnp.ones((1, P), bool), n_iters=args.iters,
            )

        jax.block_until_ready(run())  # compile
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(run())
            best = min(best, time.perf_counter() - t0)
        results[blk] = (P, best)
        print(f"blk={blk:3d}  points={P:7d}  {best*1e3:8.2f} ms", flush=True)

    base_blk = widths[0]
    _, t1 = results[base_blk]
    print("\nweak-scaling efficiency vs blk=%d (ideal: flat time):" % base_blk)
    table = []
    for blk in widths:
        P, t = results[blk]
        eff = t1 / t
        print(f"  blk={blk:3d}: {eff*100:6.1f}%  ({t*1e3:.2f} ms for {P} pts)")
        table.append({"devices": blk, "points": P, "ms": round(t * 1e3, 2),
                      "efficiency_pct": round(eff * 100, 1)})
    # persist as the weak-scaling artifact the default bench attaches
    # (BENCH extra.weak_scaling); refreshed whenever this script runs
    import json

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING.json")
    with open(out, "w") as f:
        json.dump({
            "kind": "weak_scaling_distributed_ba",
            "per_device_points": args.per_dev_points,
            "kfs": args.kfs, "obs_per_kf": args.obs_per_kf,
            "iters": args.iters,
            "backend": str(jax.devices()[0]),
            "table": table,
        }, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
