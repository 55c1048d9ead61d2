"""Multi-device tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from self_commit_orb_slam2_tpu.ops import se3
from self_commit_orb_slam2_tpu.ops.camera import CameraParams, project
from self_commit_orb_slam2_tpu.ops.optim.bundle_adjust import bundle_adjust
from self_commit_orb_slam2_tpu.parallel.distributed_ba import distributed_bundle_adjust
from self_commit_orb_slam2_tpu.parallel.mesh import MeshSpec, make_mesh

CAM = CameraParams.create(fx=300.0, fy=300.0, cx=160.0, cy=120.0, bf=30.0,
                          width=320, height=240)


def make_problem(rng, S, K, N, P):
    pt = rng.uniform(-1, 1, (S, P, 3)).astype(np.float32)
    pt[..., 2] += 5.0
    poses = np.zeros((S, K, 4, 4), np.float32)
    obs_pt = np.zeros((S, K, N), np.int32)
    obs_uvr = np.zeros((S, K, N, 3), np.float32)
    for s in range(S):
        for k in range(K):
            xi = jnp.asarray((rng.normal(0, 0.1, 6) * [1, 1, 1, 0.3, 0.3, 0.3]).astype(np.float32))
            poses[s, k] = np.asarray(se3.se3_exp(xi))
            sel = rng.choice(P, N, replace=False).astype(np.int32)
            obs_pt[s, k] = sel
            pc = pt[s, sel] @ poses[s, k][:3, :3].T + poses[s, k][:3, 3]
            uv, _ = project(CAM, jnp.asarray(pc))
            ur = np.asarray(uv)[:, 0] - np.asarray(CAM.bf) / pc[:, 2]
            obs_uvr[s, k] = np.concatenate([np.asarray(uv), ur[:, None]], -1)
    return poses, pt, obs_pt, obs_uvr


def test_mesh_construction():
    mesh = make_mesh(MeshSpec(n_map=2, n_blk=4))
    assert mesh.shape == {"map": 2, "blk": 4}
    with pytest.raises(ValueError):
        make_mesh(MeshSpec(n_map=4, n_blk=4))


def test_distributed_ba_matches_single_device(rng):
    S, K, N, P = 2, 4, 96, 256
    poses, pt, obs_pt, obs_uvr = make_problem(rng, S, K, N, P)
    # perturb
    poses_n = poses.copy()
    for s in range(S):
        for k in range(1, K):
            xi = rng.normal(0, 0.005, 6).astype(np.float32)
            poses_n[s, k] = np.asarray(se3.se3_exp(jnp.asarray(xi))) @ poses_n[s, k]
    pt_n = pt + rng.normal(0, 0.01, pt.shape).astype(np.float32)
    kf_free = np.tile(np.arange(K) > 0, (S, 1))

    mesh = make_mesh(MeshSpec(n_map=2, n_blk=4))
    dres = distributed_bundle_adjust(
        mesh, CAM, jnp.asarray(poses_n), jnp.asarray(pt_n), jnp.asarray(obs_pt),
        jnp.asarray(obs_uvr), jnp.ones((S, K, N), jnp.float32),
        jnp.ones((S, K, N), bool), jnp.asarray(kf_free), jnp.ones((S, P), bool),
        n_iters=8,
    )
    # distributed result should recover the true poses
    for s in range(S):
        for k in range(1, K):
            err = np.asarray(se3.se3_log(jnp.asarray(
                np.asarray(dres.kf_Tcw)[s, k] @ np.linalg.inv(poses[s, k]))))
            assert np.linalg.norm(err) < 2e-3, f"map {s} cam {k}: {np.linalg.norm(err)}"

    # and agree with single-device BA on the same problem (map 0)
    sres = bundle_adjust(
        CAM, jnp.asarray(poses_n[0]), jnp.asarray(pt_n[0]), jnp.asarray(obs_pt[0]),
        jnp.asarray(obs_uvr[0]), jnp.ones((K, N), jnp.float32),
        jnp.ones((K, N), bool), jnp.asarray(kf_free[0]), jnp.ones(P, bool),
        n_iters_pre=4, n_iters_post=4,
    )
    for k in range(K):
        err = np.asarray(se3.se3_log(jnp.asarray(
            np.asarray(dres.kf_Tcw)[0, k] @ np.linalg.inv(np.asarray(sres.kf_Tcw)[k]))))
        assert np.linalg.norm(err) < 5e-3


def test_distributed_ba_point_sharding_layout(rng):
    """Each chip owns a stripe; results must be identical regardless of blk width."""
    S, K, N, P = 1, 3, 64, 128
    poses, pt, obs_pt, obs_uvr = make_problem(rng, S, K, N, P)
    kf_free = np.tile(np.arange(K) > 0, (S, 1))
    outs = []
    for blk in (1, 2, 4):
        mesh = make_mesh(MeshSpec(n_map=1, n_blk=blk))
        res = distributed_bundle_adjust(
            mesh, CAM, jnp.asarray(poses), jnp.asarray(pt), jnp.asarray(obs_pt),
            jnp.asarray(obs_uvr), jnp.ones((S, K, N), jnp.float32),
            jnp.ones((S, K, N), bool), jnp.asarray(kf_free), jnp.ones((S, P), bool),
            n_iters=3,
        )
        outs.append(np.asarray(res.pt_pos))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-4)
    np.testing.assert_allclose(outs[0], outs[2], atol=1e-4)


def test_graft_entry_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert bool(jnp.sum(out.valid) > 100)


def _padded_ring_graphs(rng, S, K, E_cap):
    from tests.test_pose_graph import ring_problem

    est_all, ei_all, ej_all, meas_all, valid_all, fixed_all, gt_all = \
        [], [], [], [], [], [], []
    for s in range(S):
        gt_s, est_s, (ei, ej, meas, valid) = ring_problem(rng, K=K, drift=0.02)
        E = len(ei)
        pad = E_cap - E
        ei_all.append(np.concatenate([ei, np.zeros(pad, np.int32)]))
        ej_all.append(np.concatenate([ej, np.zeros(pad, np.int32)]))
        meas_all.append(np.concatenate(
            [meas, np.tile(np.array([0, 0, 0, 1, 0, 0, 0, 1], np.float32), (pad, 1))]))
        valid_all.append(np.concatenate([valid, np.zeros(pad, bool)]))
        fixed = np.zeros(K, bool)
        fixed[0] = True
        est_all.append(est_s); fixed_all.append(fixed); gt_all.append(gt_s)
    return (np.stack(est_all), np.stack(ei_all), np.stack(ej_all),
            np.stack(meas_all), np.stack(valid_all), np.stack(fixed_all),
            np.stack(gt_all))


def test_distributed_pose_graph_matches_single_device(rng):
    from self_commit_orb_slam2_tpu.ops.optim.pose_graph import optimize_pose_graph
    from self_commit_orb_slam2_tpu.parallel.distributed_pose_graph import (
        distributed_pose_graph,
    )

    S, K, E_cap = 2, 12, 16
    est, ei, ej, meas, valid, fixed, _ = _padded_ring_graphs(rng, S, K, E_cap)
    mesh = make_mesh(MeshSpec(n_map=2, n_blk=4))
    S_out, mean_res = distributed_pose_graph(
        mesh, jnp.asarray(est), jnp.asarray(ei), jnp.asarray(ej),
        jnp.asarray(meas), jnp.asarray(valid), jnp.asarray(fixed), n_iters=20,
    )
    assert np.all(np.asarray(mean_res) < 1e-2)
    for s in range(S):
        ref = optimize_pose_graph(
            jnp.asarray(est[s]), jnp.asarray(ei[s]), jnp.asarray(ej[s]),
            jnp.asarray(meas[s]), jnp.asarray(valid[s]), jnp.asarray(fixed[s]),
            n_iters=20,
        )
        np.testing.assert_allclose(np.asarray(S_out)[s], np.asarray(ref.kf_sim3),
                                   atol=2e-3)


def test_distributed_pose_graph_blk_width_invariance(rng):
    from self_commit_orb_slam2_tpu.parallel.distributed_pose_graph import (
        distributed_pose_graph,
    )

    S, K, E_cap = 1, 10, 16
    est, ei, ej, meas, valid, fixed, _ = _padded_ring_graphs(rng, S, K, E_cap)
    outs = []
    for blk in (1, 2, 4):
        mesh = make_mesh(MeshSpec(n_map=1, n_blk=blk))
        S_out, _ = distributed_pose_graph(
            mesh, jnp.asarray(est), jnp.asarray(ei), jnp.asarray(ej),
            jnp.asarray(meas), jnp.asarray(valid), jnp.asarray(fixed), n_iters=5,
        )
        outs.append(np.asarray(S_out))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-4)
    np.testing.assert_allclose(outs[0], outs[2], atol=1e-4)


def _mean_reproj_err(config, m):
    from self_commit_orb_slam2_tpu.ops.camera import project

    K = m.kf_Tcw.shape[0]
    P = m.pt_pos.shape[0]
    pid = jnp.clip(m.kf_obs_pt, 0, P - 1)
    active = (m.kf_obs_pt >= 0) & m.kf_feat_valid & m.kf_valid[:, None] \
        & m.pt_valid[pid]
    pc = jnp.einsum("kij,knj->kni", m.kf_Tcw[:, :3, :3], m.pt_pos[pid]) \
        + m.kf_Tcw[:, None, :3, 3]
    uv, z = jax.vmap(lambda p: project(config.camera, p))(pc)
    err = jnp.sum((uv - m.kf_xy) ** 2, -1)
    w = (active & (z > 0.05)).astype(jnp.float32)
    return float(jnp.sum(err * w) / jnp.maximum(jnp.sum(w), 1.0))


def test_multi_map_joint_refine(rng):
    from self_commit_orb_slam2_tpu.models.config import Capacities, SlamConfig
    from self_commit_orb_slam2_tpu.models.system import System
    from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig
    from self_commit_orb_slam2_tpu.parallel.multi_map import joint_refine
    from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence

    cam = CameraParams.create(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                              bf=26.0, width=320, height=240)
    cfg = SlamConfig(camera=cam, orb=OrbConfig(n_features=300),
                     caps=Capacities(max_keyframes=16, max_points=4096),
                     sensor="rgbd")
    maps = []
    for seed in (3, 4):
        seq = generate_sequence(n_frames=12, width=320, height=240, seed=seed)
        slam = System(cfg)
        for i in range(12):
            slam.track_rgbd(seq.images[i], seq.depths[i],
                            float(seq.timestamps[i]))
        # perturb poses + points: joint_refine must pull them back
        m = slam.map
        K = m.kf_Tcw.shape[0]
        noise = jnp.asarray(rng.normal(0, 5e-3, (K, 6)).astype(np.float32))
        kf_new = jax.vmap(se3.update_left)(m.kf_Tcw, noise)
        kf_new = kf_new.at[0].set(m.kf_Tcw[0])
        pt_new = m.pt_pos + jnp.asarray(
            rng.normal(0, 5e-3, m.pt_pos.shape).astype(np.float32))
        maps.append(m._replace(kf_Tcw=kf_new, pt_pos=pt_new))

    before = [_mean_reproj_err(cfg, m) for m in maps]
    mesh = make_mesh(MeshSpec(n_map=2, n_blk=4))
    refined = joint_refine(mesh, cfg, maps, ba_iters=10)
    after = [_mean_reproj_err(cfg, m) for m in refined]
    for b, a in zip(before, after):
        assert a < b * 0.2, (b, a)


def test_fleet_tracker_eight_streams(rng):
    """8 streams on the 8-device mesh must each track as well as a
    single-stream System run (same config, same sequences)."""
    from self_commit_orb_slam2_tpu.models.config import Capacities, SlamConfig
    from self_commit_orb_slam2_tpu.models.system import System
    from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig
    from self_commit_orb_slam2_tpu.parallel.fleet import FleetTracker, make_fleet_mesh
    from self_commit_orb_slam2_tpu.utils.evaluation import ate_rmse
    from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence

    cam = CameraParams.create(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                              bf=26.0, width=320, height=240)
    cfg = SlamConfig(camera=cam, orb=OrbConfig(n_features=300),
                     caps=Capacities(max_keyframes=16, max_points=4096),
                     sensor="rgbd")
    n_frames, S = 10, 8
    seqs = [generate_sequence(n_frames=n_frames, width=320, height=240,
                              seed=10 + s) for s in range(S)]
    fleet = FleetTracker(cfg, n_streams=S, mesh=make_fleet_mesh(8))
    fleet.initialize(np.stack([q.images[0] for q in seqs]),
                     np.stack([q.depths[0] for q in seqs]),
                     np.array([q.timestamps[0] for q in seqs]))
    a = np.stack([q.images[1:] for q in seqs])
    b = np.stack([q.depths[1:] for q in seqs])
    ts = np.stack([q.timestamps[1:] for q in seqs])
    poses = fleet.track_chunk(a, b, ts)
    assert poses.shape == (S, n_frames - 1, 4, 4)

    ates = []
    for s in range(S):
        est = np.concatenate([np.eye(4, dtype=np.float32)[None], poses[s]])
        ates.append(ate_rmse(est, seqs[s].poses_gt))
    assert max(ates) < 0.02, ates

    # stream 0 must agree with a solo System run on the same sequence
    solo = System(cfg, enable_loop_closing=False)
    solo.track_batch_rgbd(seqs[0].images, seqs[0].depths, seqs[0].timestamps)
    _, est_solo = solo.get_trajectory()
    est0 = np.concatenate([np.eye(4, dtype=np.float32)[None], poses[0]])
    n = min(len(est_solo), len(est0))
    diff = np.abs(est_solo[:n] - est0[:n]).max()
    assert diff < 5e-2, diff
    assert int(np.asarray(fleet.n_keyframes())[0]) >= 1


def test_refine_maps_cli(rng, tmp_path):
    """The offline refine CLI round-trips checkpoints and reduces reproj err."""
    from self_commit_orb_slam2_tpu.models.checkpoint import load_map, save_map
    from self_commit_orb_slam2_tpu.models.config import Capacities, SlamConfig
    from self_commit_orb_slam2_tpu.models.system import System
    from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig
    from self_commit_orb_slam2_tpu.refine_maps import main
    from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence

    cam = CameraParams.create(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                              bf=26.0, width=320, height=240)
    cfg = SlamConfig(camera=cam, orb=OrbConfig(n_features=300),
                     caps=Capacities(max_keyframes=16, max_points=4096),
                     sensor="rgbd")
    paths = []
    for seed in (5, 6):
        seq = generate_sequence(n_frames=10, width=320, height=240, seed=seed)
        slam = System(cfg)
        for i in range(10):
            slam.track_rgbd(seq.images[i], seq.depths[i],
                            float(seq.timestamps[i]))
        m = slam.map
        noise = jnp.asarray(rng.normal(0, 4e-3, m.pt_pos.shape).astype(np.float32))
        m = m._replace(pt_pos=m.pt_pos + noise)
        p = str(tmp_path / f"m{seed}.npz")
        save_map(p, m)
        paths.append(p)

    # settings yaml carrying the camera intrinsics
    yml = tmp_path / "cam.yaml"
    yml.write_text("%YAML:1.0\nCamera.fx: 260.0\nCamera.fy: 260.0\n"
                   "Camera.cx: 160.0\nCamera.cy: 120.0\nCamera.bf: 26.0\n"
                   "Camera.width: 320\nCamera.height: 240\n")
    before = [_mean_reproj_err(cfg, load_map(p)) for p in paths]
    rc = main(paths + ["--settings", str(yml), "--mesh", "2x4"])
    assert rc == 0
    after = [_mean_reproj_err(cfg, load_map(p[:-4] + ".refined.npz"))
             for p in paths]
    for b, a in zip(before, after):
        assert a < b * 0.5, (b, a)


def test_global_mesh_and_hosts_helpers():
    from self_commit_orb_slam2_tpu.parallel import hosts

    hosts.initialize()  # single-process no-op
    mesh = hosts.global_mesh(n_map=2)
    assert mesh.shape == {"map": 2, "blk": 4}
    assert hosts.is_coordinator()
    with pytest.raises(ValueError):
        hosts.global_mesh(n_map=3)
    r1 = hosts.fold_in_process(5)
    r2 = hosts.fold_in_process(5)
    assert r1.integers(0, 1000) == r2.integers(0, 1000)


def test_fleet_localization_serving(rng):
    """Localization fleet: streams relocalize their first frame against a
    PREBUILT map and track it frozen (no keyframes/points added)."""
    from self_commit_orb_slam2_tpu.models.config import (
        Capacities, SlamConfig, TrackingConfig,
    )
    from self_commit_orb_slam2_tpu.models.system import System
    from self_commit_orb_slam2_tpu.ops.bow import train_vocabulary
    from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig, extract
    from self_commit_orb_slam2_tpu.parallel.fleet import FleetTracker, make_fleet_mesh
    from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence

    seq = generate_sequence(n_frames=20, width=320, height=240, seed=5)
    descs = []
    for i in range(0, 20, 4):
        f = extract(jnp.asarray(seq.images[i]), OrbConfig(n_features=300))
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    vocab = train_vocabulary(np.concatenate(descs), k=8, L=3, seed=2)

    cam = CameraParams.create(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                              bf=26.0, width=320, height=240)
    cfg = SlamConfig(camera=cam, orb=OrbConfig(n_features=500),
                     caps=Capacities(max_keyframes=32, max_points=8192,
                                     local_points=1024),
                     tracking=TrackingConfig(max_frames_between_kf=8),
                     sensor="rgbd", vocab=vocab)
    builder = System(cfg)
    for i in range(16):
        builder.track_rgbd(seq.images[i], seq.depths[i], float(i) / 30.0)
    m = builder.map
    n_kf, n_pt = builder.n_keyframes(), builder.n_points()

    S = 2
    starts = [4, 8]
    fleet = FleetTracker(cfg, n_streams=S, mesh=make_fleet_mesh(2),
                         localization_only=True)
    ok = fleet.initialize_localization(
        m,
        np.stack([seq.images[s] for s in starts]),
        np.stack([seq.depths[s] for s in starts]),
        np.array([0.0, 0.0]),
    )
    assert ok.all(), "relocalization bring-up failed"
    # initial poses must match ground truth (expressed in the map's world
    # frame, which is anchored at the builder's first camera)
    T0_inv = np.linalg.inv(seq.poses_gt[0])
    for i, s in enumerate(starts):
        T0 = fleet.trajectories[i][0][1]
        expect = seq.poses_gt[s] @ T0_inv
        err = np.linalg.norm(T0[:3, 3] - expect[:3, 3])
        assert err < 0.05, err

    B = 6
    a = np.stack([seq.images[s + 1 : s + 1 + B] for s in starts])
    b = np.stack([seq.depths[s + 1 : s + 1 + B] for s in starts])
    ts = np.stack([np.arange(1, B + 1) / 30.0 for _ in starts])
    poses = fleet.track_chunk(a, b, ts)
    for i, s in enumerate(starts):
        for j in range(B):
            expect = seq.poses_gt[s + 1 + j] @ T0_inv
            err = np.linalg.norm(poses[i, j][:3, 3] - expect[:3, 3])
            assert err < 0.05, (i, j, err)
    # frozen map: no keyframes or points added on any stream
    assert np.all(np.asarray(fleet.map.n_kf) == n_kf)
    assert int(np.asarray(jnp.sum(fleet.map.pt_valid, axis=1)).max()) == n_pt


@pytest.mark.slow
def test_fleet_stream_loss_recovery(rng):
    """One stream loses tracking mid-run (blank frames) and must RELOCALIZE
    via the shared in-graph pipeline while the other streams are unaffected
    (reference: Tracking falls back to Relocalization whenever LOST,
    src/Tracking.cc:523-629, :2030 — here exercised through FleetTracker)."""
    from self_commit_orb_slam2_tpu.models.config import (
        Capacities, SlamConfig, TrackingConfig,
    )
    from self_commit_orb_slam2_tpu.ops.bow import train_vocabulary
    from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig, extract
    from self_commit_orb_slam2_tpu.parallel.fleet import FleetTracker, make_fleet_mesh
    from self_commit_orb_slam2_tpu.utils.evaluation import ate_rmse
    from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence

    n, S, B = 33, 2, 8
    seqs = [generate_sequence(n_frames=n, width=320, height=240, seed=20 + s)
            for s in range(S)]
    descs = []
    for s in range(S):
        for i in range(0, n, 8):
            f = extract(jnp.asarray(seqs[s].images[i]), OrbConfig(n_features=300))
            descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    vocab = train_vocabulary(np.concatenate(descs), k=8, L=3, seed=4)

    cam = CameraParams.create(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                              bf=26.0, width=320, height=240)
    cfg = SlamConfig(camera=cam, orb=OrbConfig(n_features=400),
                     caps=Capacities(max_keyframes=24, max_points=8192,
                                     local_points=1024),
                     tracking=TrackingConfig(max_frames_between_kf=6),
                     sensor="rgbd", vocab=vocab)
    fleet = FleetTracker(cfg, n_streams=S, mesh=make_fleet_mesh(2))
    fleet.initialize(np.stack([q.images[0] for q in seqs]),
                     np.stack([q.depths[0] for q in seqs]),
                     np.array([q.timestamps[0] for q in seqs]))

    def chunk(lo, hi, blank_stream=None):
        a = np.stack([q.images[lo:hi] for q in seqs]).copy()
        b = np.stack([q.depths[lo:hi] for q in seqs]).copy()
        ts = np.stack([q.timestamps[lo:hi] for q in seqs])
        if blank_stream is not None:
            a[blank_stream] = 0.0
            b[blank_stream] = 0.0
        return a, b, ts

    poses = [fleet.track_chunk(*chunk(1, 1 + B))]
    poses.append(fleet.track_chunk(*chunk(1 + B, 1 + 2 * B, blank_stream=1)))
    state_mid = np.asarray(fleet.carry.state_ok)
    assert bool(state_mid[0]), "healthy stream lost tracking"
    assert not bool(state_mid[1]), "blanked stream still claims OK"
    poses.append(fleet.track_chunk(*chunk(1 + 2 * B, 1 + 3 * B)))
    poses.append(fleet.track_chunk(*chunk(1 + 3 * B, 1 + 4 * B)))
    state_end = np.asarray(fleet.carry.state_ok)
    assert bool(state_end[0]) and bool(state_end[1]), (
        "stream did not recover after frames returned")

    all_poses = np.concatenate(poses, axis=1)  # [S, 4B, 4, 4]
    # healthy stream: full-trajectory accuracy untouched
    est0 = np.concatenate([np.eye(4, dtype=np.float32)[None], all_poses[0]])
    assert ate_rmse(est0, seqs[0].poses_gt[: len(est0)]) < 0.02
    # recovered stream: accuracy over the NON-blank frames (the reloc must
    # return it to its own map frame, otherwise the tail is inconsistent
    # with the head and the joint ATE blows up)
    keep = np.concatenate([np.arange(0, 1 + B),
                           np.arange(1 + 2 * B, 1 + 4 * B)])
    est1 = np.concatenate([np.eye(4, dtype=np.float32)[None], all_poses[1]])
    ate1 = ate_rmse(est1[keep], seqs[1].poses_gt[keep])
    assert ate1 < 0.05, ate1
