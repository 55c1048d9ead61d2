"""Stereo undistort-rectify maps: golden checks against the defining
equations (cv::initUndistortRectifyMap semantics, used by the reference's
EuRoC stereo driver, Examples/Stereo/stereo_euroc.cc)."""

import numpy as np

from self_commit_orb_slam2_tpu.utils.rectify import (
    StereoRectifier, init_undistort_rectify_map, radtan_distort,
    remap_bilinear,
)


def test_identity_map_no_distortion():
    K = np.array([[300.0, 0, 64], [0, 300.0, 48], [0, 0, 1]])
    D = np.zeros(4)
    mx, my = init_undistort_rectify_map(K, D, np.eye(3), K, 128, 96)
    u, v = np.meshgrid(np.arange(128.0), np.arange(96.0))
    np.testing.assert_allclose(mx, u, atol=1e-4)
    np.testing.assert_allclose(my, v, atol=1e-4)


def test_map_satisfies_defining_equation(rng):
    """Round trip: map value (raw pixel) --undistort--> raw normalized
    --R--> rectified normalized --P--> must land back on the dst pixel."""
    K = np.array([[458.654, 0, 367.215], [0, 457.296, 248.375], [0, 0, 1]])
    D = np.array([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05])
    # small rectifying rotation
    a = 0.03
    R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                  [-np.sin(a), 0, np.cos(a)]])
    P = np.array([[435.2, 0, 367.45, 0], [0, 435.2, 252.2, 0], [0, 0, 1, 0]])
    W, H = 752, 480
    mx, my = init_undistort_rectify_map(K, D, R, P, W, H)

    for _ in range(20):
        u = int(rng.integers(100, W - 100))
        v = int(rng.integers(100, H - 100))
        # invert the distortion at the map's raw pixel by Newton iteration
        xd = (mx[v, u] - K[0, 2]) / K[0, 0]
        yd = (my[v, u] - K[1, 2]) / K[1, 1]
        x, y = xd, yd
        for _ in range(50):
            xe, ye = radtan_distort(np.float64(x), np.float64(y), D)
            x, y = x - (xe - xd), y - (ye - yd)
        xr = R @ np.array([x, y, 1.0])
        u_back = P[0, 0] * xr[0] / xr[2] + P[0, 2]
        v_back = P[1, 1] * xr[1] / xr[2] + P[1, 2]
        assert abs(u_back - u) < 1e-3 and abs(v_back - v) < 1e-3


def test_remap_bilinear_translation():
    img = np.arange(20, dtype=np.float32).reshape(4, 5).repeat(2, 0)
    u, v = np.meshgrid(np.arange(5.0, dtype=np.float32),
                       np.arange(8.0, dtype=np.float32))
    out = remap_bilinear(img, u + 0.5, v)
    inner = out[:, :-1]
    expected = (img[:, :-1] + img[:, 1:]) / 2
    np.testing.assert_allclose(inner, expected[:, : inner.shape[1]], atol=1e-5)


def test_remap_border_zero():
    img = np.ones((6, 6), np.float32) * 7
    u, v = np.meshgrid(np.arange(6.0), np.arange(6.0))
    out = remap_bilinear(img, u + 100.0, v)
    assert np.all(out == 0)


def test_stereo_rectifier_rows_align(rng):
    """After rectification a world point must land on the same row in both
    cameras (the property stereo matching relies on)."""
    K = np.array([[400.0, 0, 160], [0, 400.0, 120], [0, 0, 1]])
    D = np.array([-0.2, 0.05, 0.0, 0.0])
    a = 0.02
    Rl = np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0],
                   [0, 0, 1]])
    Rr = Rl.T
    P = np.array([[380.0, 0, 160, 0], [0, 380.0, 120, 0], [0, 0, 1, 0]])
    W, H = 320, 240
    rect = StereoRectifier({"K": K, "D": D, "R": Rl, "P": P},
                           {"K": K, "D": D, "R": Rr, "P": P}, W, H)
    assert rect.m1l.shape == (H, W) and rect.m1r.shape == (H, W)
    img = rng.uniform(0, 255, (H, W)).astype(np.float32)
    out_l, out_r = rect.rectify(img, img)
    assert out_l.shape == (H, W) and np.isfinite(out_l).all()
    assert out_r.shape == (H, W) and np.isfinite(out_r).all()


def test_load_rectification_yaml(tmp_path):
    yaml_text = """%YAML:1.0
LEFT.width: 32
LEFT.height: 24
LEFT.K: !!opencv-matrix
  rows: 3
  cols: 3
  dt: d
  data: [300.0, 0.0, 16.0, 0.0, 300.0, 12.0, 0.0, 0.0, 1.0]
LEFT.D: !!opencv-matrix
  rows: 1
  cols: 4
  dt: d
  data: [0.0, 0.0, 0.0, 0.0]
LEFT.R: !!opencv-matrix
  rows: 3
  cols: 3
  dt: d
  data: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
LEFT.P: !!opencv-matrix
  rows: 3
  cols: 4
  dt: d
  data: [300.0, 0.0, 16.0, 0.0, 0.0, 300.0, 12.0, 0.0, 0.0, 0.0, 1.0, 0.0]
RIGHT.width: 32
RIGHT.height: 24
RIGHT.K: !!opencv-matrix
  rows: 3
  cols: 3
  dt: d
  data: [300.0, 0.0, 16.0, 0.0, 300.0, 12.0, 0.0, 0.0, 1.0]
RIGHT.D: !!opencv-matrix
  rows: 1
  cols: 4
  dt: d
  data: [0.0, 0.0, 0.0, 0.0]
RIGHT.R: !!opencv-matrix
  rows: 3
  cols: 3
  dt: d
  data: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
RIGHT.P: !!opencv-matrix
  rows: 3
  cols: 4
  dt: d
  data: [300.0, 0.0, 16.0, 0.0, 0.0, 300.0, 12.0, 0.0, 0.0, 0.0, 1.0, 0.0]
"""
    p = tmp_path / "euroc.yaml"
    p.write_text(yaml_text)
    from self_commit_orb_slam2_tpu.utils.rectify import (
        load_rectification_from_settings,
    )

    rect = load_rectification_from_settings(str(p))
    assert rect is not None
    img = np.ones((24, 32), np.float32)
    out_l, out_r = rect.rectify(img, img)
    np.testing.assert_allclose(out_l[1:-1, 1:-1], 1.0, atol=1e-4)


def test_on_device_rectified_stereo_tracking():
    """rect_maps in SlamConfig: both RAW eyes carry a small mounting
    rotation; the on-device remap (models/frame._rectify_pair) must recover
    the ideal row-aligned pair and the full stereo pipeline must track it
    (the reference's EuRoC preprocessing, stereo_euroc.cc:45-80 region,
    moved into the jitted frame path)."""
    import numpy as np

    from self_commit_orb_slam2_tpu.models.config import (
        Capacities, SlamConfig, TrackingConfig,
    )
    from self_commit_orb_slam2_tpu.models.system import System
    from self_commit_orb_slam2_tpu.ops.camera import CameraParams
    from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig
    from self_commit_orb_slam2_tpu.utils.evaluation import ate_rmse
    from self_commit_orb_slam2_tpu.utils.rectify import (
        init_undistort_rectify_map,
    )
    from self_commit_orb_slam2_tpu.utils.synthetic import (
        lookat_trajectory, make_room,
    )

    W, H, FX, BASELINE, N = 320, 240, 260.0, 0.1, 14

    def rotvec(v):
        th = np.linalg.norm(v)
        k = np.asarray(v) / th
        Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]],
                       [-k[1], k[0], 0]])
        return np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx

    rng = np.random.default_rng(7)
    scene = make_room(rng)
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    poses = lookat_trajectory(N)
    R_l = rotvec([0.006, -0.012, 0.004])
    R_r = rotvec([-0.008, 0.009, -0.003])
    T_l, T_r, T_rl = np.eye(4), np.eye(4), np.eye(4)
    T_l[:3, :3], T_r[:3, :3], T_rl[0, 3] = R_l, R_r, -BASELINE
    il, ir = [], []
    for i in range(N):
        il.append(scene.render(K, T_l @ poses[i], W, H)[0])
        ir.append(scene.render(K, T_r @ T_rl @ poses[i], W, H)[0])
    D = np.zeros(4)
    maps = (*init_undistort_rectify_map(K, D, R_l.T, K, W, H),
            *init_undistort_rectify_map(K, D, R_r.T, K, W, H))
    rect_maps = (maps[0], maps[1], maps[2], maps[3])

    cam = CameraParams.create(fx=FX, fy=FX, cx=W / 2, cy=H / 2,
                              bf=FX * BASELINE, width=W, height=H)
    cfg = SlamConfig(
        camera=cam, orb=OrbConfig(n_features=500),
        caps=Capacities(max_keyframes=32, max_points=8192,
                        local_points=512),
        tracking=TrackingConfig(max_frames_between_kf=6),
        sensor="stereo", rect_maps=rect_maps,
    )
    slam = System(cfg)
    slam.track_batch_stereo(np.stack(il), np.stack(ir),
                            np.arange(N) / 20.0)
    assert slam.state == 1, "tracking lost on rectified stereo"
    _, est = slam.get_trajectory()
    ate = ate_rmse(est, poses[: len(est)])
    print(f"on-device-rectified stereo ATE: {ate*100:.2f} cm")
    assert ate < 0.05
