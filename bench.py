#!/usr/bin/env python
"""Benchmark harness: full RGB-D SLAM tracking throughput + accuracy.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Mirrors the reference's de-facto benchmark (dataset drivers printing
median/mean tracking time, reference Examples/Monocular/mono_tum.cc:113-122)
on the synthetic textured-room sequence with exact ground truth.  The
baseline is the reference's real-time bar: 30 fps (TUM/EuRoC camera rate,
reference Examples/RGB-D/TUM1.yaml:23) on an i7 CPU — `vs_baseline` is our
frames/s divided by 30.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    from self_commit_orb_slam2_tpu.models.config import (
        Capacities, SlamConfig, TrackingConfig,
    )
    from self_commit_orb_slam2_tpu.models.system import System
    from self_commit_orb_slam2_tpu.ops.camera import CameraParams
    from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig
    from self_commit_orb_slam2_tpu.utils.evaluation import ate_rmse
    from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_frames = int(args[0]) if args else 120
    # --long[=N]: reference-length bounded-map run (default 4000 frames at
    # the 640x480/1000f default config) — writes bench_long.json, which the
    # default bench attaches as extra.long_run
    long_arg = next((a for a in sys.argv[1:] if a.startswith("--long")), None)
    if long_arg is not None:
        kitti = "--size=kitti" in sys.argv
        n_default = 500 if kitti else (
            1200 if "--mono" in sys.argv else
            2000 if "--loop" in sys.argv else 4000)
        n_long = int(long_arg.split("=", 1)[1]) if "=" in long_arg \
            else n_default
        # --loop: drift-injected run that must FIRE real loop closures and
        # measures their stream cost; --mono: monocular variant with SCALE
        # drift (7-DoF Sim3 correction)
        if "--mono" in sys.argv:
            return bench_long_mono(n_long)
        if "--loop" in sys.argv:
            return bench_long_loop(n_long)
        return bench_long(n_long, kitti=kitti)
    # --dataset=DIR: bench on a real TUM RGB-D directory instead of the
    # synthetic scene — the moment real data is mountable, ATE-parity
    # numbers drop out of the same harness with zero new code.
    dataset_dir = next((a.split("=", 1)[1] for a in sys.argv[1:]
                        if a.startswith("--dataset=")), None)
    if dataset_dir:
        return bench_dataset(dataset_dir, n_frames)
    # DEFAULT = the reference-comparable configuration: the reference's own
    # operating point (TUM 640x480, 1000 features, reference
    # Examples/RGB-D/TUM1.yaml) with the vocabulary LOADED (the reference
    # always loads ORBvoc.txt and runs a live loop thread, System.cc:77-89).
    # --size=toy: the small 320x240/500f scene (round-1..3 headline config)
    # --size=kitti: KITTI stereo geometry (1241x376, 2000 features; the
    #   reference's bar there is 10 fps, Examples/Stereo/KITTI00-02.yaml:22)
    toy_scale = "--size=toy" in sys.argv
    kitti_scale = "--size=kitti" in sys.argv
    euroc_scale = "--size=euroc" in sys.argv
    bar_fps = 30.0
    if kitti_scale:
        width, height, fx, n_feat = 1241, 376, 718.9, 2000
        bar_fps = 10.0
    elif euroc_scale:
        # EuRoC stereo operating point (reference Examples/Stereo/EuRoC.yaml:
        # 752x480 @ 20 fps, 1200 features, ~11cm baseline) INCLUDING the 2x
        # per-eye undistort-rectify remap in the frame path (the reference
        # remaps every pair before tracking, stereo_euroc.cc:45-80 region)
        width, height, fx, n_feat = 752, 480, 458.7, 1200
        bar_fps = 20.0
    elif toy_scale:
        width, height, fx, n_feat = 320, 240, 260.0, 500
    else:
        width, height, fx, n_feat = 640, 480, 520.0, 1000
    # --sensor=stereo benches the stereo pipeline (row-band matching instead
    # of RGB-D depth lookup); default rgbd matches the TUM configuration
    sensor = "stereo" if ("--sensor=stereo" in sys.argv or kitti_scale
                          or euroc_scale) else "rgbd"
    # --no-vocab: drop place recognition (loop closing + reloc) to measure
    # the bare tracking pipeline
    vocab = None
    if "--no-vocab" not in sys.argv:
        from self_commit_orb_slam2_tpu.ops.bow import load_vocabulary
        from self_commit_orb_slam2_tpu.run_slam import _default_vocab_path

        vocab = load_vocabulary(_default_vocab_path())

    rect_maps = None
    baseline = 0.11 if euroc_scale else 0.1
    if euroc_scale:
        seq, rect_maps = _euroc_synthetic(n_frames, width, height, fx,
                                          baseline)
    else:
        seq = generate_sequence(
            n_frames=n_frames, width=width, height=height, fx=fx, seed=5,
            stereo_baseline=baseline if sensor == "stereo" else 0.0)
    cam = CameraParams.create(fx=fx, fy=fx, cx=width / 2, cy=height / 2,
                              bf=fx * baseline, width=width, height=height)
    cfg = SlamConfig(
        camera=cam,
        orb=OrbConfig(n_features=n_feat),
        caps=Capacities(max_keyframes=64, max_points=16384, local_points=1024),
        tracking=TrackingConfig(max_frames_between_kf=10),
        sensor=sensor,
        vocab=vocab,
        rect_maps=rect_maps,
    )
    slam = System(cfg)
    slam.warm_start()  # pre-compile loop closing (reference: ORBvoc load)
    second = seq.right_images if sensor == "stereo" else seq.depths
    track_batch = (slam.track_batch_stereo if sensor == "stereo"
                   else slam.track_batch_rgbd)

    # equal-shape windows: the first compiles (same batch length = same XLA
    # program), the rest are timed repetitions.  The HEADLINE number is the
    # MEDIAN of the steady-state windows (all but the first timed window,
    # which still carries transfer-pipeline warm-up); the max and ALL
    # samples stay in `extra` for scrutiny.  Window length is a multiple of
    # the streaming chunk so no window pays padded (wasted) frames.
    n_windows = 6
    C = slam._batch_chunk
    B = max(C, (n_frames - 1) // n_windows // C * C)
    track_batch(seq.images[: 1 + B], second[: 1 + B],
                seq.timestamps[: 1 + B])  # init frame + B
    samples = []
    for w in range(1, n_windows):
        s = 1 + w * B
        t0 = time.perf_counter()
        track_batch(seq.images[s : s + B], second[s : s + B],
                    seq.timestamps[s : s + B])
        samples.append(B / (time.perf_counter() - t0))
    fps = float(np.median(samples[1:]))
    dt = B / fps

    _, est = slam.get_trajectory()
    ate = ate_rmse(est, seq.poses_gt[: len(est)])
    n_kf, n_pt = slam.n_keyframes(), slam.n_points()

    phases = phase_breakdown(cfg, slam, seq, sensor)
    dev_fps = device_fps(slam, seq, second, sensor)

    vtag = "" if vocab is None else "_vocab"
    record = {
        "metric": f"{sensor}_tracking_fps_{width}x{height}_{n_feat}feat{vtag}",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / bar_fps, 3),
        "extra": {
            "ate_rmse_m": round(float(ate), 4),
            "vocab_loaded": vocab is not None,
            "device_vs_bar": round(dev_fps / bar_fps, 2),
            "n_frames": n_frames,
            "keyframes": n_kf,
            "map_points": n_pt,
            "median_ms": round(dt / B * 1e3, 2),
            "fps_max": round(max(samples), 1),
            "fps_samples": [round(s, 1) for s in samples],
            "backend": str(jax.devices()[0]),
            "tracking_lost": slam.state != 1,
            "mode": "batched",
            "phase_ms": phases,
            # steady-state throughput with DEVICE-RESIDENT inputs: what a
            # locally-attached chip sustains.  The headline value includes
            # the remote tunnel, whose per-transfer stalls dominate at large
            # frames (measured ~1 GB/s raw but ~6 ms/frame of stall when
            # uploads interleave with execution).
            "device_fps": dev_fps,
            **({} if not euroc_scale else {"rectified": True}),
            **_long_run_extra(),
        },
    }
    print(json.dumps(record))
    # per-config compact summary: --size=kitti / --size=euroc runs persist
    # their numbers so the DEFAULT bench's artifact self-contains every
    # operating point (attached by _long_run_extra)
    if kitti_scale or euroc_scale:
        name = "bench_kitti.json" if kitti_scale else "bench_euroc.json"
        compact = {
            "metric": record["metric"],
            "fps": record["value"],
            "vs_bar": record["vs_baseline"],
            "bar_fps": bar_fps,
            "device_fps": dev_fps,
            "device_vs_bar": record["extra"]["device_vs_bar"],
            "ate_rmse_m": record["extra"]["ate_rmse_m"],
            "n_frames": n_frames,
            "backend": record["extra"]["backend"],
        }
        if euroc_scale:
            compact["rectified"] = True
        with open(os.path.join(
                os.path.dirname(os.path.abspath(__file__)), name), "w") as f:
            json.dump(compact, f, indent=1)


def _euroc_synthetic(n_frames, width, height, fx, baseline):
    """Synthetic EuRoC-style stereo: each RAW eye is rendered with a small
    camera-frame rotation (the misalignment real rigs have), and the
    returned undistort-rectify maps rotate both eyes back into the ideal
    row-aligned pair on device — so the bench charges the full
    2x-remap-per-frame cost of the reference's EuRoC preprocessing
    (Examples/Stereo/stereo_euroc.cc:45-80 region) with exact geometry.
    Distortion coefficients are zero here (the radtan math is unit-tested in
    tests/test_rectify.py / test_euroc_rectified.py); rotation is what makes
    the remap geometrically load-bearing."""
    from self_commit_orb_slam2_tpu.utils.rectify import (
        init_undistort_rectify_map,
    )
    from self_commit_orb_slam2_tpu.utils.synthetic import (
        SyntheticSequence, lookat_trajectory, make_room,
    )

    rng = np.random.default_rng(5)
    scene = make_room(rng)
    K = np.array([[fx, 0, width / 2], [0, fx, height / 2], [0, 0, 1.0]])
    poses = lookat_trajectory(n_frames)
    # raw-eye mounting rotations (~0.5 deg, EuRoC-like misalignment)
    R_l = _rotvec([0.004, -0.009, 0.003])
    R_r = _rotvec([-0.006, 0.007, -0.002])
    T_l = np.eye(4)
    T_l[:3, :3] = R_l
    T_r = np.eye(4)
    T_r[:3, :3] = R_r
    T_rl = np.eye(4)
    T_rl[0, 3] = -baseline
    imgs_l, imgs_r = [], []
    for i in range(n_frames):
        img_l, _ = scene.render(K, T_l @ poses[i], width, height)
        img_r, _ = scene.render(K, T_r @ T_rl @ poses[i], width, height)
        imgs_l.append(img_l)
        imgs_r.append(img_r)
    # rectifying rotation maps RAW camera coords -> RECTIFIED:
    # x_raw = R_eye x_rect  =>  R = R_eye^T
    D = np.zeros(4)
    mxl, myl = init_undistort_rectify_map(K, D, R_l.T, K, width, height)
    mxr, myr = init_undistort_rectify_map(K, D, R_r.T, K, width, height)
    seq = SyntheticSequence(
        images=np.stack(imgs_l),
        depths=np.zeros((n_frames, height, width), np.float32),
        poses_gt=np.asarray(poses, np.float32),
        K=K.astype(np.float32),
        timestamps=np.arange(n_frames, dtype=np.float64) / 20.0,
        right_images=np.stack(imgs_r),
    )
    return seq, (mxl, myl, mxr, myr)


def _rotvec(v):
    th = np.linalg.norm(v)
    if th < 1e-12:
        return np.eye(3)
    k = np.asarray(v) / th
    Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx


def _long_run_extra():
    """Attach every recorded per-config / long-run artifact so BENCH_r{N}
    alone certifies all operating points (kitti/euroc summaries, the
    reference-length bounded run, the drift-injected loop-closure runs, and
    the weak-scaling table) without README cross-reference."""
    out = {}
    for key, name in (("long_run", "bench_long.json"),
                      ("long_run_kitti", "bench_long_kitti.json"),
                      ("long_run_loop", "bench_long_loop.json"),
                      ("long_run_mono", "bench_long_mono.json"),
                      ("config_kitti", "bench_kitti.json"),
                      ("config_euroc", "bench_euroc.json"),
                      ("weak_scaling", "SCALING.json")):
        p = os.path.join(os.path.dirname(os.path.abspath(__file__)), name)
        if os.path.exists(p):
            with open(p) as f:
                out[key] = json.load(f)
    return out


def bench_long(n_frames: int, kitti: bool = False):
    """Reference-length bounded-map run at the default 640x480/1000f RGB-D
    configuration (default 4000 frames) or KITTI stereo geometry
    (--size=kitti, default 500 frames), WITH the vocabulary, cycling one
    rendered look-at orbit so the camera re-traverses the same arc
    (KITTI-00-style revisits; the reference's 4500-frame KITTI 00 stays
    bounded through LocalMapping culling, src/LocalMapping.cc:261,873).
    Records fps, ATE, live/culled keyframe counts, and map-boundedness."""
    import jax

    from self_commit_orb_slam2_tpu.models.config import (
        Capacities, SlamConfig, TrackingConfig,
    )
    from self_commit_orb_slam2_tpu.models.system import System
    from self_commit_orb_slam2_tpu.ops.bow import load_vocabulary
    from self_commit_orb_slam2_tpu.ops.camera import CameraParams
    from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig
    from self_commit_orb_slam2_tpu.run_slam import _default_vocab_path
    from self_commit_orb_slam2_tpu.utils.evaluation import ate_rmse
    from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence

    if kitti:
        width, height, fx, n_feat = 1241, 376, 718.9, 2000
        sensor, bar, cycle = "stereo", 10.0, 120
    else:
        width, height, fx, n_feat = 640, 480, 520.0, 1000
        sensor, bar, cycle = "rgbd", 30.0, 160
    vocab = load_vocabulary(_default_vocab_path())
    seq = generate_sequence(n_frames=cycle, width=width, height=height,
                            fx=fx, seed=5,
                            stereo_baseline=0.1 if sensor == "stereo" else 0.0)
    cam = CameraParams.create(fx=fx, fy=fx, cx=width / 2, cy=height / 2,
                              bf=fx * 0.1, width=width, height=height)
    cfg = SlamConfig(
        camera=cam, orb=OrbConfig(n_features=n_feat),
        caps=Capacities(max_keyframes=64, max_points=16384,
                        local_points=1024),
        tracking=TrackingConfig(max_frames_between_kf=10),
        sensor=sensor, vocab=vocab,
    )
    slam = System(cfg)
    # sustained streaming is upload-round-trip bound: over thousands of
    # frames chunk 8 beats the interactive chunk-4 default (25.0 vs 22.0
    # fps measured at 640x480/4000 frames) — fewer, larger transfers
    if "SLAM_BATCH_CHUNK" not in os.environ:
        slam._batch_chunk = 8
    slam.warm_start()
    if sensor == "stereo":
        second = np.clip(seq.right_images, 0, 255).astype(np.uint8)
    else:
        second = np.clip(seq.depths * 1e3, 0, 65535).astype(np.uint16)
    images = np.clip(seq.images, 0, 255).astype(np.uint8)
    # persistent streaming session: the pipeline (async fetches, loop
    # dispatches, upload overlap) survives across chunk feeds — the round-4
    # per-call teardown forced a device round trip every chunk and capped
    # the 4000-frame run at 25 fps with the chip at 162
    sess = slam.open_stream(sensor)
    C = slam._batch_chunk
    done = 0
    t_start = None
    idx0 = np.arange(C)
    while done < n_frames:
        idx = (done + idx0) % cycle
        ts = (done + idx0) / 30.0
        if done == 2 * C:  # skip remaining warmup chunks
            t_start = time.perf_counter()
        sess.feed((images[idx], second[idx]), ts)
        done += C
    sess.finish()
    t_timed = time.perf_counter() - (t_start or time.perf_counter())
    timed_frames = done - 2 * C
    fps = timed_frames / max(t_timed, 1e-9)
    _, est = slam.get_trajectory()
    gt = seq.poses_gt[np.arange(len(est)) % cycle]
    ate = float(ate_rmse(est, gt))
    m = slam.map
    live_kf = int(np.sum(np.asarray(m.kf_valid)))
    record = {
        "n_frames": int(done),
        "fps": round(fps, 2),
        "ate_rmse_m": round(ate, 4),
        "keyframes_live": live_kf,
        "keyframes_ever": int(np.asarray(m.n_kf)),
        "keyframes_culled": int(np.asarray(m.n_culled)),
        "map_points_live": slam.n_points(),
        "map_bounded": live_kf <= cfg.caps.max_keyframes,
        "tracking_lost": slam.state != 1,
        "loop_closures": (slam._loop_closer.n_big_changes
                          if slam._loop_closer else 0),
        "chunk": C,
        "backend": str(jax.devices()[0]),
    }
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "bench_long_kitti.json" if kitti else "bench_long.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({
        "metric": f"{sensor}_long_run_{width}x{height}_{n_feat}feat_vocab",
        "value": record["fps"], "unit": "frames/s",
        "vs_baseline": round(record["fps"] / bar, 3), "extra": record,
    }))


def bench_long_loop(n_frames: int):
    """Reference-length loop-closure run: the default 640x480/1000f RGB-D
    stream with synthetic odometry drift injected device-side every chunk
    (utils/drift.py), so the orbit's revisits accumulate real map
    discrepancy and the FULL loop path — BoW detection, Sim3, pose graph,
    loop-group fuse, asynchronous GBA merge — must fire mid-stream
    (reference src/LoopClosing.cc:571-880; KITTI 00's big loop).

    Records: closures fired, ATE with the corrections vs the SAME drifted
    sequence with loop closing disabled, per-chunk latency stats and the
    worst chunk around each correction (the stream stall the correction
    cost), and the async-GBA path + in-flight time."""
    import jax
    import jax.numpy as jnp

    from self_commit_orb_slam2_tpu.models.config import (
        Capacities, SlamConfig, TrackingConfig,
    )
    from self_commit_orb_slam2_tpu.models.system import System
    from self_commit_orb_slam2_tpu.ops.bow import load_vocabulary
    from self_commit_orb_slam2_tpu.ops.camera import CameraParams
    from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig
    from self_commit_orb_slam2_tpu.run_slam import _default_vocab_path
    from self_commit_orb_slam2_tpu.utils.drift import (
        make_injector, se3_increment,
    )
    from self_commit_orb_slam2_tpu.utils.evaluation import ate_rmse
    from self_commit_orb_slam2_tpu.utils.synthetic import (
        circle_trajectory, generate_sequence,
    )

    width, height, fx, n_feat, cycle = 640, 480, 520.0, 1000, 160
    vocab = load_vocabulary(_default_vocab_path())
    # closed-circle trajectory: each sector is left behind and revisited one
    # revolution later — the KITTI-00 loop topology, not the sweep orbit
    # (whose revisits stay covisible and never become loop candidates)
    seq = generate_sequence(
        n_frames=cycle, width=width, height=height, fx=fx, seed=5,
        trajectory=circle_trajectory(cycle, frames_per_rev=cycle))
    cam = CameraParams.create(fx=fx, fy=fx, cx=width / 2, cy=height / 2,
                              bf=fx * 0.1, width=width, height=height)
    cfg = SlamConfig(
        camera=cam, orb=OrbConfig(n_features=n_feat),
        # a full circle revolution needs ~55 keyframes before redundancy
        # culling can reclaim slots; 96 leaves creation headroom
        caps=Capacities(max_keyframes=96, max_points=16384,
                        local_points=1024),
        tracking=TrackingConfig(max_frames_between_kf=10),
        sensor="rgbd", vocab=vocab,
    )
    # per-frame drift increment (~1.1mm + 0.05deg yaw), composed per chunk;
    # injection models EXPLORATION drift: it starts after the first full
    # revolution (the map must exist) and stops two revolutions before the
    # end — real odometry error grows while covering new ground, not while
    # re-traversing a corrected map, and the clean tail shows whether the
    # corrections actually converged the map (vs. chasing a moving target)
    dD1 = np.asarray(se3_increment(
        [0.0011, 0.00028, -0.00055, 0.0, 0.0009, 0.0]), np.float64)
    drift_start = cycle
    drift_stop = max(drift_start, n_frames - 2 * cycle)

    images = np.clip(seq.images, 0, 255).astype(np.uint8)
    depths_mm = np.clip(seq.depths * 1e3, 0, 65535).astype(np.uint16)

    def run(enable_loops: bool):
        slam = System(cfg, enable_loop_closing=enable_loops)
        if "SLAM_BATCH_CHUNK" not in os.environ:
            slam._batch_chunk = 8
        slam.warm_start()
        sess = slam.open_stream("rgbd")
        C = slam._batch_chunk
        dD_c = np.eye(4)
        for _ in range(C):
            dD_c = dD_c @ dD1
        inject = make_injector(keep_recent=6)
        dD_dev = jnp.asarray(dD_c.astype(np.float32))
        one = jnp.float32(1.0)
        done = 0
        idx0 = np.arange(C)
        chunk_ms = []
        corrections = []   # chunk index where a correction landed
        closures_before = 0
        while done < n_frames:
            idx = (done + idx0) % cycle
            ts = (done + idx0) / 30.0
            t0 = time.perf_counter()
            sess.feed((images[idx], depths_mm[idx]), ts)
            if drift_start <= done < drift_stop:
                slam.map = inject(slam.map, dD_dev, one)
            chunk_ms.append((time.perf_counter() - t0) * 1e3)
            if enable_loops:
                nb = slam._loop_closer.n_big_changes
                if nb != closures_before:
                    corrections.append(len(chunk_ms) - 1)
                    closures_before = nb
            done += C
        t0 = time.perf_counter()
        sess.finish()
        chunk_ms.append((time.perf_counter() - t0) * 1e3)
        _, est = slam.get_trajectory()
        gt = seq.poses_gt[np.arange(len(est)) % cycle]
        return slam, float(ate_rmse(est, gt)), chunk_ms, corrections, done

    slam, ate_corr, chunk_ms, corrections, done = run(True)
    _, ate_raw, _, _, _ = run(False)

    ct = np.asarray(chunk_ms[4:])
    med = float(np.median(ct))
    # stream stall of each correction: worst chunk in the 2-chunk window
    # after it fired, in excess of the median chunk
    stalls = []
    for c in corrections:
        w = np.asarray(chunk_ms[max(c - 1, 0): c + 3])
        stalls.append(float(w.max() - med))
    n_closures = slam._loop_closer.n_big_changes
    record = {
        "n_frames": int(done),
        "fps": round(done / (np.sum(chunk_ms) / 1e3), 2),
        "loop_closures": int(n_closures),
        "ate_rmse_m": round(ate_corr, 4),
        "ate_rmse_m_no_loop": round(ate_raw, 4),
        "chunk_ms_median": round(med, 1),
        "correction_stall_ms": [round(s, 1) for s in stalls],
        "gba": slam._loop_closer.last_gba_info,
        "drift_per_frame_m": 0.0013,
        "tracking_lost": slam.state != 1,
        "backend": str(jax.devices()[0]),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "bench_long_loop.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({
        "metric": "rgbd_long_loop_640x480_1000feat_vocab",
        "value": record["loop_closures"], "unit": "loop_closures",
        "vs_baseline": round(ate_raw / max(ate_corr, 1e-9), 2),
        "extra": record,
    }))


def bench_long_mono(n_frames: int):
    """Reference-length MONOCULAR run with SCALE drift: old map content is
    progressively re-scaled+displaced (similarity drift, the failure mode
    7-DoF loop closure exists for — reference src/LoopClosing.cc:337-463
    mono Sim3 with scale, src/Optimizer.cc:1017 7-DoF essential graph).  The
    fix_scale=False Sim3 pipeline must recover the scale and the corrected
    Sim3-aligned ATE must beat the uncorrected run."""
    import jax
    import jax.numpy as jnp

    from self_commit_orb_slam2_tpu.models.config import (
        Capacities, SlamConfig, TrackingConfig,
    )
    from self_commit_orb_slam2_tpu.models.system import System
    from self_commit_orb_slam2_tpu.ops.bow import load_vocabulary
    from self_commit_orb_slam2_tpu.ops.camera import CameraParams
    from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig
    from self_commit_orb_slam2_tpu.run_slam import _default_vocab_path
    from self_commit_orb_slam2_tpu.utils.drift import (
        make_injector, se3_increment,
    )
    from self_commit_orb_slam2_tpu.utils.evaluation import ate_rmse
    from self_commit_orb_slam2_tpu.utils.synthetic import (
        circle_trajectory, generate_sequence,
    )

    width, height, fx, n_feat, cycle = 640, 480, 520.0, 1000, 160
    vocab = load_vocabulary(_default_vocab_path())
    seq = generate_sequence(
        n_frames=cycle, width=width, height=height, fx=fx, seed=5,
        trajectory=circle_trajectory(cycle, frames_per_rev=cycle))
    cam = CameraParams.create(fx=fx, fy=fx, cx=width / 2, cy=height / 2,
                              bf=fx * 0.1, width=width, height=height)
    cfg = SlamConfig(
        camera=cam, orb=OrbConfig(n_features=n_feat),
        caps=Capacities(max_keyframes=96, max_points=16384,
                        local_points=1024),
        tracking=TrackingConfig(max_frames_between_kf=10),
        sensor="mono", vocab=vocab,
    )
    dD1 = jnp.asarray(np.asarray(se3_increment(
        [0.0009, 0.0002, -0.0004, 0.0, 0.0007, 0.0]), np.float32))
    s1 = jnp.float32(1.0006)   # ~10% scale drift per revisit
    drift_start = cycle
    drift_stop = max(drift_start, n_frames - 2 * cycle)  # see bench_long_loop

    images = np.clip(seq.images, 0, 255).astype(np.uint8)

    def run(enable_loops: bool):
        slam = System(cfg, enable_loop_closing=enable_loops)
        if "SLAM_BATCH_CHUNK" not in os.environ:
            slam._batch_chunk = 8
        slam.warm_start()
        sess = slam.open_stream("mono")
        C = slam._batch_chunk
        inject = make_injector(keep_recent=6)
        # compose the per-frame similarity increment per chunk
        dD_np = np.asarray(dD1, np.float64)
        dD_c = np.eye(4)
        for _ in range(C):
            dD_c = dD_c @ dD_np
        dD_dev = jnp.asarray(dD_c.astype(np.float32))
        s_c = jnp.float32(float(s1) ** C)
        frame_ms = []
        idx0 = np.arange(C)
        done = 0
        while done < n_frames:
            idx = (done + idx0) % cycle
            ts = (done + idx0) / 30.0
            t0 = time.perf_counter()
            sess.feed((images[idx],), ts)
            if drift_start <= done < drift_stop and slam.state == 1:
                slam.map = inject(slam.map, dD_dev, s_c)
            frame_ms.append((time.perf_counter() - t0) * 1e3 / C)
            done += C
        t0 = time.perf_counter()
        sess.finish()
        frame_ms.append((time.perf_counter() - t0) * 1e3 / C)
        _, est = slam.get_trajectory()
        n = len(est)
        # est starts at the mono init frame: pair against the TRAILING n
        # ground-truth poses of the cycled trajectory
        gt = seq.poses_gt[(done - n + np.arange(n)) % cycle]
        ate = float(ate_rmse(est, gt, with_scale=True))  # mono: Sim3-aligned
        return slam, ate, frame_ms

    slam, ate_corr, frame_ms = run(True)
    _, ate_raw, _ = run(False)
    n_closures = slam._loop_closer.n_big_changes
    record = {
        "n_frames": int(n_frames),
        "fps": round(len(frame_ms) / (np.sum(frame_ms) / 1e3), 2),
        "loop_closures": int(n_closures),
        "ate_rmse_m_sim3": round(ate_corr, 4),
        "ate_rmse_m_sim3_no_loop": round(ate_raw, 4),
        "scale_drift_per_frame": 1.0006,
        "frame_ms_median": round(float(np.median(frame_ms[20:])), 1),
        "gba": slam._loop_closer.last_gba_info,
        "tracking_lost": slam.state != 1,
        "keyframes_live": int(np.sum(np.asarray(slam.map.kf_valid))),
        "backend": str(jax.devices()[0]),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "bench_long_mono.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({
        "metric": "mono_long_scale_loop_640x480_1000feat_vocab",
        "value": record["loop_closures"], "unit": "loop_closures",
        "vs_baseline": round(ate_raw / max(ate_corr, 1e-9), 2),
        "extra": record,
    }))


def device_fps(slam, seq, second, sensor, n_reps: int = 48):
    """Pure-device steady-state fps: pre-upload one chunk, dispatch it
    n_reps times against the live (donated) map state, fetch once."""
    import time as _t

    import jax
    import jax.numpy as jnp
    import numpy as np

    from self_commit_orb_slam2_tpu.models import pipeline

    C = slam._batch_chunk
    batch = slam._batches[(slam.config.sensor, False)]
    if sensor == "stereo":
        a = np.clip(seq.images[1 : 1 + C], 0, 255).astype(np.uint8)
        b = np.clip(seq.right_images[1 : 1 + C], 0, 255).astype(np.uint8)
        pack = pipeline.pack_stereo_chunk
    else:
        a = np.clip(seq.images[1 : 1 + C], 0, 255).astype(np.uint8)
        b = np.clip(seq.depths[1 : 1 + C] * 1e3, 0, 65535).astype(np.uint16)
        pack = pipeline.pack_rgbd_chunk
    ts = np.asarray(seq.timestamps[1 : 1 + C], np.float32)
    buf = jax.block_until_ready(
        jnp.asarray(pack(a, b, ts, np.ones(C, bool))))
    m, carry = slam.map, slam.carry
    # warm (the donated shapes are already compiled by the main run)
    m, carry, packed = batch(m, carry, buf)
    jax.block_until_ready(packed)
    t0 = _t.perf_counter()
    for _ in range(n_reps // C):
        m, carry, packed = batch(m, carry, buf)
    jax.block_until_ready(packed)
    fps = (n_reps // C * C) / (_t.perf_counter() - t0)
    # donation consumed the live handles: adopt the probe's final state
    # (callers must capture map statistics BEFORE this probe — re-tracking
    # the same frames inflates keyframe counts)
    slam.map, slam.carry = m, carry
    return round(fps, 1)


def phase_breakdown(cfg, slam, seq, sensor):
    """Per-phase device-time breakdown (ms), measured scan-amortized against
    the post-run map state: frame construction (ORB + depth), the tracking
    step without the mapping branch, and the full fused step with the
    mapping phase taken.  Emitted into the bench artifact so a regression in
    any one phase is visible in the artifact diff (round-2 review: the
    122-vs-142fps regression had no per-phase attribution)."""
    import functools
    import time as _t

    import jax
    import jax.numpy as jnp

    from self_commit_orb_slam2_tpu.models import frame as frame_mod
    from self_commit_orb_slam2_tpu.models import pipeline

    R = 10
    m, carry = slam.map, slam.carry
    img = jnp.asarray(seq.images[-1], jnp.float32)
    second = (jnp.asarray(seq.right_images[-1], jnp.float32)
              if sensor == "stereo"
              else jnp.asarray(seq.depths[-1], jnp.float32))
    ts = jnp.float32(float(seq.timestamps[-1]))

    def scan_time(fn):
        def body(acc, _):
            out = fn()
            s = sum(jnp.sum(x.astype(jnp.float32))
                    for x in jax.tree_util.tree_leaves(out))
            return acc + s * 1e-30, None

        g = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0.0), None,
                                         length=R)[0])
        jax.block_until_ready(g())
        t0 = _t.perf_counter()
        jax.block_until_ready(g())
        return round((_t.perf_counter() - t0) / R * 1e3, 3)

    mk = (functools.partial(frame_mod.make_frame_stereo, cfg, img, second)
          if sensor == "stereo"
          else functools.partial(frame_mod.make_frame_rgbd, cfg, img, second))
    step = (pipeline.step_stereo if sensor == "stereo" else pipeline.step_rgbd)

    from self_commit_orb_slam2_tpu.models import local_mapping, map_state as ms

    # batched frame phase, per frame (what the streaming pipeline actually
    # pays: the whole chunk through one extraction chain)
    C = slam._batch_chunk
    if sensor == "stereo":
        a = np.clip(seq.images[1:1 + C], 0, 255).astype(np.uint8)
        b = np.clip(seq.right_images[1:1 + C], 0, 255).astype(np.uint8)
        buf = jnp.asarray(pipeline.pack_stereo_chunk(
            a, b, np.asarray(seq.timestamps[1:1 + C], np.float32),
            np.ones(C, bool)))
    else:
        a = np.clip(seq.images[1:1 + C], 0, 255).astype(np.uint8)
        b = np.clip(seq.depths[1:1 + C] * 1e3, 0, 65535).astype(np.uint16)
        buf = jnp.asarray(pipeline.pack_rgbd_chunk(
            a, b, np.asarray(seq.timestamps[1:1 + C], np.float32),
            np.ones(C, bool)))
    ffn = slam._frame_fns[sensor]
    jax.block_until_ready(ffn(buf))
    t0 = _t.perf_counter()
    for _ in range(10):
        out_f = ffn(buf)
    jax.block_until_ready(out_f)
    frame_ms = (_t.perf_counter() - t0) / 10 / C * 1e3

    kf_id = ms.latest_kf(m)
    out = {
        # ORB extraction + stereo/RGB-D depth association, chunk-batched
        "frame": round(frame_ms, 3),
        # single-frame construction (the per-frame API's cost)
        "frame_single": scan_time(mk),
        # full per-frame tracking path, mapping branch not taken
        "track": scan_time(lambda: step(cfg, m, carry, img, second, ts,
                                        run_mapping=False)[2]),
        # the per-KEYFRAME mapping phase (amortize by the KF cadence)
        "mapping_per_kf": scan_time(
            lambda: local_mapping._process(cfg, m, kf_id).n_pt),
    }
    return out


def bench_dataset(root, n_frames):
    """Bench on a real TUM RGB-D sequence directory (rgb.txt/depth.txt +
    groundtruth.txt when present)."""
    import jax
    import numpy as np

    from self_commit_orb_slam2_tpu.models.config import (
        Capacities, SlamConfig, TrackingConfig,
    )
    from self_commit_orb_slam2_tpu.models.system import System
    from self_commit_orb_slam2_tpu.utils.config_io import load_settings
    from self_commit_orb_slam2_tpu.utils.datasets import TumRgbdDataset
    from self_commit_orb_slam2_tpu.utils.evaluation import ate_rmse

    ds = TumRgbdDataset(root)
    yaml = next((a.split("=", 1)[1] for a in sys.argv[1:]
                 if a.startswith("--settings=")), None)
    if yaml:
        cfg = load_settings(yaml, sensor="rgbd")
    else:
        first = ds[0]
        h, w = first.image.shape
        from self_commit_orb_slam2_tpu.ops.camera import CameraParams
        from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig

        cam = CameraParams.create(fx=525.0, fy=525.0, cx=w / 2, cy=h / 2,
                                  bf=525.0 * 0.075, width=w, height=h)
        cfg = SlamConfig(camera=cam, orb=OrbConfig(n_features=1000),
                         caps=Capacities(), tracking=TrackingConfig(),
                         sensor="rgbd")
    slam = System(cfg)
    n = min(n_frames, len(ds))
    imgs, deps, ts = [], [], []
    for i in range(n):
        f = ds[i]
        imgs.append(f.image)
        deps.append(f.depth)
        ts.append(f.timestamp)
    imgs, deps, ts = np.stack(imgs), np.stack(deps), np.asarray(ts)
    t0 = time.perf_counter()
    slam.track_batch_rgbd(imgs, deps, ts)
    fps = n / (time.perf_counter() - t0)
    extra = {"n_frames": n, "keyframes": slam.n_keyframes(),
             "map_points": slam.n_points(),
             "backend": str(jax.devices()[0]), "dataset": root}
    gt = getattr(ds, "groundtruth", None)
    if gt is not None:
        est_ts, est = slam.get_trajectory()
        extra["ate_rmse_m"] = round(float(ate_rmse(est, gt(est_ts))), 4)
    print(json.dumps({
        "metric": "rgbd_tracking_fps_dataset",
        "value": round(fps, 2), "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3), "extra": extra,
    }))


if __name__ == "__main__":
    main()
