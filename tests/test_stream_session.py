"""StreamSession: the persistent live-stream API (models/streaming.py).

The one-shot batch API wraps it (feed-all + finish); a live camera feeds
arbitrary-sized pieces across the lifetime of a run.  These tests cover the
session-specific behavior: chunk-boundary-crossing feeds, the host-side
tail, init-frame handling inside feed, and equivalence with the one-shot
path.
"""

import numpy as np
import pytest

from self_commit_orb_slam2_tpu.models.system import System
from self_commit_orb_slam2_tpu.utils.evaluation import ate_rmse
from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence
from tests.test_slam_rgbd import make_config


@pytest.fixture(scope="module")
def seq():
    return generate_sequence(n_frames=25, width=320, height=240, seed=5)


def _to_u8(seq):
    return (np.clip(seq.images, 0, 255).astype(np.uint8),
            np.clip(seq.depths * 1e3, 0, 65535).astype(np.uint16))


@pytest.mark.slow
def test_session_irregular_feeds_match_one_shot(seq):
    imgs, deps = _to_u8(seq)
    n = len(imgs)
    ts = np.arange(n) / 30.0

    one = System(make_config())
    poses_one = one.track_batch_rgbd(seq.images, seq.depths, ts)

    live = System(make_config())
    sess = live.open_stream("rgbd")
    # feed in ragged pieces that straddle chunk boundaries (incl. size 1)
    cuts = [0, 1, 4, 9, 10, 17, n]
    for a, b in zip(cuts[:-1], cuts[1:]):
        sess.feed((imgs[a:b], deps[a:b]), ts[a:b])
        sess.poll()
    poses_live = sess.finish()

    assert len(poses_live) == n - 1  # first frame initializes
    # identical chunking math => identical trajectories
    np.testing.assert_allclose(poses_live, poses_one[: n - 1], atol=1e-5)
    assert live.state == 1
    ate = ate_rmse(np.asarray(poses_live), seq.poses_gt[1:n])
    assert ate < 0.05


@pytest.mark.slow
def test_session_multiple_sequential_sessions(seq):
    """Sessions can be opened back-to-back on one System (a paused and
    resumed stream); trajectory bookkeeping accumulates across them."""
    imgs, deps = _to_u8(seq)
    n = len(imgs)
    ts = np.arange(n) / 30.0
    slam = System(make_config())
    s1 = slam.open_stream("rgbd")
    s1.feed((imgs[:12], deps[:12]), ts[:12])
    p1 = s1.finish()
    s2 = slam.open_stream("rgbd")
    s2.feed((imgs[12:], deps[12:]), ts[12:])
    p2 = s2.finish()
    assert len(p1) == 11 and len(p2) == n - 12
    t_all, poses = slam.get_trajectory()
    assert len(t_all) == n
    assert ate_rmse(poses, seq.poses_gt[:n]) < 0.05
