import jax
import jax.numpy as jnp
import numpy as np

from self_commit_orb_slam2_tpu.ops import se3, sim3
from self_commit_orb_slam2_tpu.ops.optim.pose_graph import (
    edge_residual, optimize_pose_graph,
)


def ring_problem(rng, K=12, drift=0.03):
    """A loop of keyframes with accumulated drift; a loop-closure edge ties
    the last keyframe back to the first."""
    # ground-truth poses on a circle
    gt = []
    for k in range(K):
        a = 2 * np.pi * k / K
        xi = np.array([np.sin(a), 0.0, 1 - np.cos(a), 0.0, a, 0.0], np.float32)
        gt.append(np.asarray(se3.se3_exp(jnp.asarray(xi))))
    gt = np.stack(gt)
    gt_s = np.stack([np.asarray(sim3.from_se3(jnp.asarray(g))) for g in gt])

    # odometry chain with drift: estimated poses accumulate noise
    est = [gt[0]]
    for k in range(1, K):
        rel = gt[k] @ np.linalg.inv(gt[k - 1])
        noise = np.asarray(se3.se3_exp(jnp.asarray(
            rng.normal(0, drift, 6).astype(np.float32))))
        est.append(noise @ rel @ est[-1])
    est = np.stack(est)
    est_s = np.stack([np.asarray(sim3.from_se3(jnp.asarray(e))) for e in est])

    # edges: sequential (from estimated relative = consistent with est) and
    # the loop edge K-1 -> 0 with the TRUE relative transform
    ei, ej, meas, valid = [], [], [], []
    for k in range(1, K):
        ei.append(k); ej.append(k - 1)
        rel = est[k] @ np.linalg.inv(est[k - 1])
        meas.append(np.asarray(sim3.from_se3(jnp.asarray(rel))))
        valid.append(True)
    ei.append(K - 1); ej.append(0)
    rel_true = gt[K - 1] @ np.linalg.inv(gt[0])
    meas.append(np.asarray(sim3.from_se3(jnp.asarray(rel_true))))
    valid.append(True)
    return gt_s, est_s, (np.array(ei, np.int32), np.array(ej, np.int32),
                         np.stack(meas), np.array(valid))


def test_edge_residual_zero_at_consistency(rng):
    S_i = sim3.exp(jnp.asarray(rng.normal(0, 0.3, 7).astype(np.float32)))
    S_j = sim3.exp(jnp.asarray(rng.normal(0, 0.3, 7).astype(np.float32)))
    meas = sim3.compose(S_i, sim3.inverse(S_j))
    r = edge_residual(S_i, S_j, meas)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-5)


def test_pose_graph_closes_loop(rng):
    gt_s, est_s, (ei, ej, meas, valid) = ring_problem(rng, K=12, drift=0.02)
    fixed = np.zeros(12, bool)
    fixed[0] = True
    res = optimize_pose_graph(
        jnp.asarray(est_s), jnp.asarray(ei), jnp.asarray(ej),
        jnp.asarray(meas), jnp.asarray(valid), jnp.asarray(fixed),
    )
    assert float(res.mean_residual) < 1e-2
    # the last keyframe must now agree with the loop edge:
    S = np.asarray(res.kf_sim3)
    rel = np.asarray(sim3.compose(jnp.asarray(S[11]), sim3.inverse(jnp.asarray(S[0]))))
    err = np.asarray(sim3.log(sim3.compose(
        sim3.inverse(jnp.asarray(meas[11])), jnp.asarray(rel))))
    assert np.linalg.norm(err) < 1e-2
    # drift spread across the chain: every pose closer to gt than before
    def t_err(Ss):
        return np.linalg.norm(np.asarray(sim3.translation(jnp.asarray(Ss)))
                              - np.asarray(sim3.translation(jnp.asarray(gt_s))), axis=1)
    before = t_err(est_s)
    after = t_err(S)
    assert after[6:].mean() < before[6:].mean() * 0.7


def test_pose_graph_respects_fixed(rng):
    gt_s, est_s, (ei, ej, meas, valid) = ring_problem(rng, K=8)
    fixed = np.zeros(8, bool)
    fixed[0] = True
    res = optimize_pose_graph(
        jnp.asarray(est_s), jnp.asarray(ei), jnp.asarray(ej),
        jnp.asarray(meas), jnp.asarray(valid), jnp.asarray(fixed), n_iters=5,
    )
    np.testing.assert_allclose(np.asarray(res.kf_sim3)[0], est_s[0], atol=1e-6)


def test_pose_graph_with_scale_drift(rng):
    """Mono-style: odometry underestimates scale; the loop edge fixes it."""
    gt_s, est_s, (ei, ej, meas, valid) = ring_problem(rng, K=10, drift=0.0)
    # inject uniform scale drift into the sequential measurements: the
    # odometry claims each step shrinks the map scale by 5%
    meas = meas.copy()
    for k in range(9):
        meas[k][7] *= 0.95
    est = [est_s[0]]
    for k in range(1, 10):
        est.append(np.asarray(sim3.compose(jnp.asarray(meas[k - 1]), jnp.asarray(est[-1]))))
    est_s = np.stack(est)
    fixed = np.zeros(10, bool)
    fixed[0] = True
    res = optimize_pose_graph(
        jnp.asarray(est_s), jnp.asarray(ei), jnp.asarray(ej),
        jnp.asarray(meas), jnp.asarray(valid), jnp.asarray(fixed), n_iters=30,
    )
    # scales must depart from 1 to absorb the drift (reference's scale-drift
    # aware essential graph)
    s = np.asarray(sim3.scale(jnp.asarray(res.kf_sim3)))
    assert float(res.mean_residual) < 5e-3
    assert s.max() > 1.01 or s.min() < 0.99
