"""Streaming driver: the reference's ROS-node parity (input transport)."""

import io

import numpy as np

from self_commit_orb_slam2_tpu import stream_slam
from self_commit_orb_slam2_tpu.models.system import STATE_OK, System
from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence

from test_slam_rgbd import make_config


def test_stream_roundtrip_serialization():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (48, 64)).astype(np.float32)
    dep = rng.uniform(0.5, 5.0, (48, 64)).astype(np.float32)
    buf = io.BytesIO()
    stream_slam.write_frame(buf, "rgbd", 1.25, img, dep)
    stream_slam.write_frame(buf, "stereo", 2.5, img, img)
    stream_slam.write_frame(buf, "mono", 3.75, img)
    buf.seek(0)
    s, ts, arrays = stream_slam.read_frame(buf)
    assert (s, ts) == ("rgbd", 1.25)
    np.testing.assert_array_equal(
        arrays[0], np.clip(img, 0, 255).astype(np.uint8).astype(np.float32))
    assert np.abs(arrays[1] - dep).max() < 1e-3  # mm quantization
    s, ts, arrays = stream_slam.read_frame(buf)
    assert (s, ts, len(arrays)) == ("stereo", 2.5, 2)
    s, ts, arrays = stream_slam.read_frame(buf)
    assert (s, ts, len(arrays)) == ("mono", 3.75, 1)
    assert stream_slam.read_frame(buf) is None


def test_stream_serve_tracks_frames():
    n = 6
    seq = generate_sequence(n_frames=n, width=320, height=240, seed=5)
    frames = io.BytesIO()
    for i in range(n):
        stream_slam.write_frame(frames, "rgbd", float(seq.timestamps[i]),
                                seq.images[i], seq.depths[i])
    frames.seek(0)
    poses = io.BytesIO()
    slam = System(make_config())
    n_tracked = stream_slam.serve(slam, frames, poses)
    assert n_tracked == n
    assert slam.state == STATE_OK
    poses.seek(0)
    recs = []
    while True:
        r = stream_slam.read_pose(poses)
        if r is None:
            break
        recs.append(r)
    assert len(recs) == n
    ts, state, Tcw = recs[-1]
    assert state == STATE_OK
    assert np.all(np.isfinite(Tcw))


def test_stream_serve_stereo_with_rectifier():
    """serve() with a StereoRectifier (identity maps) matches plain stereo —
    the reference ros_stereo.cc do_rectify mode."""
    from test_slam_stereo import make_stereo_config

    from self_commit_orb_slam2_tpu.utils.rectify import StereoRectifier

    n = 5
    seq = generate_sequence(n_frames=n, width=320, height=240, seed=5,
                            stereo_baseline=0.1)
    frames = io.BytesIO()
    for i in range(n):
        stream_slam.write_frame(frames, "stereo", float(seq.timestamps[i]),
                                seq.images[i], seq.right_images[i])
    frames.seek(0)
    K = np.array([[260.0, 0, 160], [0, 260.0, 120], [0, 0, 1]])
    P = np.concatenate([K, np.zeros((3, 1))], 1)
    ident = {"K": K, "D": np.zeros(4), "R": np.eye(3), "P": P}
    rect = StereoRectifier(ident, ident, 320, 240)
    slam = System(make_stereo_config())
    n_tracked = stream_slam.serve(slam, frames, rectifier=rect)
    assert n_tracked == n
    assert slam.state == STATE_OK
