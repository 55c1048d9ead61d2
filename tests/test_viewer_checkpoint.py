import numpy as np
import pytest

from self_commit_orb_slam2_tpu.models.system import STATE_LOST, System
from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence
from self_commit_orb_slam2_tpu.utils.viewer import draw_frame, draw_map_topdown, render_system
from tests.test_slam_rgbd import make_config


@pytest.fixture(scope="module")
def mapped_system():
    seq = generate_sequence(n_frames=10, width=320, height=240, seed=5)
    slam = System(make_config())
    for i in range(10):
        slam.track_rgbd(seq.images[i], seq.depths[i], float(i) / 30.0)
    return slam, seq


def test_draw_frame(mapped_system, rng):
    slam, seq = mapped_system
    f = slam.carry.last_frame
    img = draw_frame(seq.images[-1], np.asarray(f.xy), np.asarray(f.valid),
                     np.asarray(slam.carry.last_obs_pt) >= 0)
    assert img.shape == (240, 320, 3) and img.dtype == np.uint8
    # overlay actually drew colored pixels
    assert (img[:, :, 1].astype(int) - img[:, :, 0].astype(int) > 50).sum() > 50


def test_render_map(mapped_system):
    slam, _ = mapped_system
    img = render_system(slam)
    assert img.shape == (512, 512, 3)
    assert (img > 0).any(), "empty map render"


def test_map_checkpoint_roundtrip(mapped_system, tmp_path):
    slam, seq = mapped_system
    path = str(tmp_path / "map.npz")
    slam.save_map(path)

    slam2 = System(slam.config)
    slam2.load_map(path)
    assert slam2.n_keyframes() == slam.n_keyframes()
    assert slam2.n_points() == slam.n_points()
    assert slam2.state == STATE_LOST
    np.testing.assert_array_equal(
        np.asarray(slam2.map.pt_pos), np.asarray(slam.map.pt_pos)
    )
