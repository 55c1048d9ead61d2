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
