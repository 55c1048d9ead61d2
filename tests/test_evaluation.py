import numpy as np

from self_commit_orb_slam2_tpu.utils.evaluation import ate_rmse, rpe_rmse, umeyama_alignment
from self_commit_orb_slam2_tpu.utils.synthetic import orbit_trajectory
from self_commit_orb_slam2_tpu.utils.trajectory import load_tum, save_tum


def test_ate_zero_for_reframed_trajectory():
    """A trajectory re-expressed in a different world frame must have ATE 0
    (catches center-computation / alignment bugs)."""
    gt = orbit_trajectory(20).astype(np.float64)
    est = np.stack([gt[i] @ np.linalg.inv(gt[0]) for i in range(20)])
    assert ate_rmse(est, gt) < 1e-6
    assert ate_rmse(gt, gt) < 1e-9


def test_ate_scale_alignment():
    gt = orbit_trajectory(20).astype(np.float64)
    est = gt.copy()
    est[:, :3, 3] *= 2.0  # uniformly scaled translations (mono-style)
    assert ate_rmse(est, gt, with_scale=True) < 1e-6
    assert ate_rmse(est, gt, with_scale=False) > 0.1


def test_ate_detects_error():
    gt = orbit_trajectory(20).astype(np.float64)
    est = gt.copy()
    est[10, :3, 3] += 0.5
    assert 0.05 < ate_rmse(est, gt) < 0.5


def test_rpe():
    gt = orbit_trajectory(20).astype(np.float64)
    t_err, r_err = rpe_rmse(gt, gt)
    assert t_err < 1e-9 and r_err < 1e-5


def test_umeyama(rng):
    from scipy.spatial.transform import Rotation

    src = rng.normal(size=(30, 3))
    R_true = Rotation.random(random_state=2).as_matrix()
    dst = 1.7 * src @ R_true.T + np.array([0.5, -1.0, 2.0])
    s, R, t = umeyama_alignment(src, dst, with_scale=True)
    np.testing.assert_allclose(s, 1.7, atol=1e-9)
    np.testing.assert_allclose(R, R_true, atol=1e-9)


def test_tum_roundtrip(tmp_path):
    gt = orbit_trajectory(10).astype(np.float64)
    ts = np.arange(10) / 30.0
    path = str(tmp_path / "traj.txt")
    save_tum(path, ts, gt)
    ts2, poses_wc = load_tum(path)
    np.testing.assert_allclose(ts2, ts, atol=1e-6)
    # loaded poses are Twc; invert to compare
    for i in range(10):
        Tcw = np.linalg.inv(poses_wc[i])
        np.testing.assert_allclose(Tcw, gt[i], atol=1e-5)
