"""Offline multi-map refinement CLI.

Jointly refines saved map checkpoints (models/checkpoint.py npz files) on the
available device mesh: distributed Sim3 pose graph + distributed Schur global
BA per map, maps data-parallel over devices (parallel/multi_map.py).  This is
the batch analogue of the reference's LoopClosing::RunGlobalBundleAdjustment
(src/LoopClosing.cc:880) run over N sequences at once — e.g. the KITTI
00+02+05 multi-sequence configuration.

Usage:
  python -m self_commit_orb_slam2_tpu.refine_maps m0.npz m1.npz \
      --settings TUM1.yaml [--mesh SxB] [--no-pose-graph] [--suffix .refined]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("maps", nargs="+", help="map checkpoint npz files")
    ap.add_argument("--settings", required=True,
                    help="reference-style YAML with the camera parameters the "
                    "maps were built with (required: refining against default "
                    "intrinsics silently corrupts the maps)")
    ap.add_argument("--mesh", default=None,
                    help="MAPxBLK device grid, e.g. 2x4 (default: all devices "
                    "on the blk axis of a 1xN mesh)")
    ap.add_argument("--ba-iters", type=int, default=10)
    ap.add_argument("--pg-iters", type=int, default=20)
    ap.add_argument("--no-pose-graph", action="store_true")
    ap.add_argument("--suffix", default=".refined.npz",
                    help="output path suffix replacing .npz")
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    from .models.checkpoint import load_map, save_map
    from .parallel.mesh import MeshSpec, make_mesh
    from .parallel.multi_map import joint_refine
    from .utils.config_io import load_settings

    maps = [load_map(p) for p in args.maps]
    shapes = {tuple(m.kf_Tcw.shape) + tuple(m.pt_pos.shape) for m in maps}
    if len(shapes) != 1:
        print("error: maps have different capacities; refine same-config "
              "maps together", file=sys.stderr)
        return 2

    n_dev = len(jax.devices())
    if args.mesh:
        n_map, n_blk = (int(x) for x in args.mesh.split("x"))
    else:
        n_map, n_blk = 1, n_dev
    mesh = make_mesh(MeshSpec(n_map=n_map, n_blk=n_blk))

    cfg = load_settings(args.settings, sensor="rgbd",
                        width=640, height=480)
    P = maps[0].pt_pos.shape[0]
    if P % n_blk:
        print(f"error: point capacity {P} not divisible by blk={n_blk}",
              file=sys.stderr)
        return 2

    # process in groups of n_map (the data-parallel width)
    out_paths = []
    for lo in range(0, len(maps), n_map):
        group = maps[lo:lo + n_map]
        pad = n_map - len(group)
        group = group + [group[-1]] * pad
        refined = joint_refine(
            mesh, cfg, group,
            pg_iters=args.pg_iters, ba_iters=args.ba_iters,
            run_pose_graph=not args.no_pose_graph,
        )
        for i, m in enumerate(refined[: n_map - pad]):
            src = args.maps[lo + i]
            dst = src[:-4] + args.suffix if src.endswith(".npz") \
                else src + args.suffix
            save_map(dst, m)
            out_paths.append(dst)
            print(f"{src} -> {dst}  (kf={int(np.asarray(m.n_kf))} "
                  f"pt={int(np.asarray(m.n_pt))})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
