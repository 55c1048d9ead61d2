"""Dataset loaders tested against generated fixtures in the real formats."""

import os

import numpy as np
import pytest

from self_commit_orb_slam2_tpu.utils.datasets import (
    EurocDataset, KittiOdometryDataset, TumRgbdDataset,
)


def _save_png(path, arr, mode="L"):
    from PIL import Image

    Image.fromarray(arr, mode=mode).save(path)


@pytest.fixture
def tum_dir(tmp_path, rng):
    root = tmp_path / "tum"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    rgb_lines, dep_lines = [], []
    for i in range(4):
        t = 1000.0 + i / 30.0
        img = rng.integers(0, 255, (48, 64), dtype=np.uint8)
        dep = (rng.uniform(0.5, 4.0, (48, 64)) * 5000).astype(np.uint16)
        _save_png(str(root / "rgb" / f"{t:.6f}.png"), img)
        _save_png(str(root / "depth" / f"{t+0.005:.6f}.png"), dep, mode="I;16")
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        dep_lines.append(f"{t+0.005:.6f} depth/{t+0.005:.6f}.png")
    (root / "rgb.txt").write_text("# comment\n" + "\n".join(rgb_lines))
    (root / "depth.txt").write_text("\n".join(dep_lines))
    return str(root)


def test_tum_loader(tum_dir):
    ds = TumRgbdDataset(tum_dir)
    assert len(ds) == 4
    f = ds[0]
    assert f.image.shape == (48, 64)
    assert f.depth.shape == (48, 64)
    assert 0.4 < np.median(f.depth[f.depth > 0]) < 4.2  # meters after /5000
    assert abs(f.timestamp - 1000.0) < 1e-6


@pytest.fixture
def kitti_dir(tmp_path, rng):
    root = tmp_path / "kitti" / "00"
    (root / "image_0").mkdir(parents=True)
    (root / "image_1").mkdir()
    for i in range(3):
        for d in ("image_0", "image_1"):
            _save_png(str(root / d / f"{i:06d}.png"),
                      rng.integers(0, 255, (37, 120), dtype=np.uint8))
    (root / "times.txt").write_text("\n".join(f"{i*0.1:.6f}" for i in range(3)))
    (root / "calib.txt").write_text(
        "P0: 718.856 0 607.19 0 0 718.856 185.2 0 0 0 1 0\n"
        "P1: 718.856 0 607.19 -386.14 0 718.856 185.2 0 0 0 1 0\n"
    )
    return str(root)


def test_kitti_loader(kitti_dir):
    ds = KittiOdometryDataset(kitti_dir)
    assert len(ds) == 3
    f = ds[1]
    assert f.left.shape == (37, 120) and f.right.shape == (37, 120)
    assert abs(f.timestamp - 0.1) < 1e-6
    cp = ds.camera_params
    assert abs(cp["fx"] - 718.856) < 1e-3
    assert abs(cp["bf"] - 386.14) < 1e-3


@pytest.fixture
def euroc_dir(tmp_path, rng):
    root = tmp_path / "euroc"
    for cam in ("cam0", "cam1"):
        (root / "mav0" / cam / "data").mkdir(parents=True)
        lines = ["#timestamp [ns],filename"]
        for i in range(3):
            ts = 1403636579763555584 + i * 50_000_000
            name = f"{ts}.png"
            _save_png(str(root / "mav0" / cam / "data" / name),
                      rng.integers(0, 255, (30, 47), dtype=np.uint8))
            lines.append(f"{ts},{name}")
        (root / "mav0" / cam / "data.csv").write_text("\n".join(lines))
    return str(root)


def test_euroc_loader(euroc_dir):
    ds = EurocDataset(euroc_dir)
    assert len(ds) == 3
    f = ds[0]
    assert f.left.shape == (30, 47)
    assert f.timestamp > 1.4e9  # seconds


def test_settings_loader(tmp_path):
    from self_commit_orb_slam2_tpu.utils.config_io import load_settings

    yaml_text = """%YAML:1.0
Camera.fx: 517.306408
Camera.fy: 516.469215
Camera.cx: 318.643040
Camera.cy: 255.313989
Camera.k1: 0.262383
Camera.k2: -0.953104
Camera.p1: -0.005358
Camera.p2: 0.002628
Camera.k3: 1.163314
Camera.width: 640
Camera.height: 480
Camera.fps: 30.0
Camera.bf: 40.0
ThDepth: 40.0
DepthMapFactor: 5000.0
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""
    p = tmp_path / "TUM1.yaml"
    p.write_text(yaml_text)
    cfg = load_settings(str(p), sensor="rgbd")
    assert abs(cfg.camera.fx - 517.306408) < 1e-5
    assert cfg.camera.has_distortion
    assert cfg.orb.n_features == 1000
    assert cfg.tracking.max_frames_between_kf == 30
    assert abs(cfg.th_depth - 40.0 / 517.306408 * 40.0) < 1e-3
    assert abs(cfg.depth_map_factor - 1 / 5000.0) < 1e-9
