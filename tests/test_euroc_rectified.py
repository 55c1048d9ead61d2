"""End-to-end EuRoC-format stereo run with undistort-rectification.

Synthesizes a stereo sequence, warps it through a known radial distortion
(the inverse of the rectification map), writes it to disk in EuRoC layout
(mav0/cam{0,1}/data + data.csv) with a reference-style settings YAML carrying
LEFT.*/RIGHT.* blocks, and drives the real CLI (run_slam) over it — the same
path a user takes for EuRoC MH01 (reference Examples/Stereo/stereo_euroc.cc).
"""

import os

import numpy as np
import pytest

from self_commit_orb_slam2_tpu.utils.rectify import (
    radtan_distort, remap_bilinear,
)
from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence

W, H, FX, BASELINE = 320, 240, 260.0, 0.1
D = np.array([-0.15, 0.03, 0.0, 0.0])


def _distort_image(pinhole: np.ndarray, K: np.ndarray) -> np.ndarray:
    """Synthesize the RAW (distorted) image: raw[p] = pinhole[K.undist(K^-1 p)].

    The inverse warp of rectification, so rectifying the result recovers the
    pinhole image up to interpolation error."""
    u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                       np.arange(H, dtype=np.float64))
    xd = (u - K[0, 2]) / K[0, 0]
    yd = (v - K[1, 2]) / K[1, 1]
    x, y = xd.copy(), yd.copy()
    for _ in range(25):
        xe, ye = radtan_distort(x, y, D)
        x, y = x - (xe - xd), y - (ye - yd)
    mx = (K[0, 0] * x + K[0, 2]).astype(np.float32)
    my = (K[1, 1] * y + K[1, 2]).astype(np.float32)
    return remap_bilinear(pinhole, mx, my)


def _mat_yaml(name, M):
    M = np.asarray(M, np.float64)
    vals = ", ".join(f"{x:.10f}" for x in M.reshape(-1))
    return (f"{name}: !!opencv-matrix\n  rows: {M.shape[0]}\n"
            f"  cols: {M.shape[1]}\n  dt: d\n  data: [{vals}]\n")


@pytest.mark.slow
def test_euroc_rectified_end_to_end(tmp_path):
    from self_commit_orb_slam2_tpu.utils.viewer import save_png

    seq = generate_sequence(n_frames=16, width=W, height=H, fx=FX, seed=7,
                            stereo_baseline=BASELINE)
    K = seq.K.astype(np.float64)
    root = tmp_path / "mav0"
    for cam, stack in (("cam0", seq.images), ("cam1", seq.right_images)):
        d = root / cam / "data"
        os.makedirs(d)
        lines = ["#timestamp [ns],filename"]
        for i in range(len(stack)):
            ts = int(seq.timestamps[i] * 1e9)
            name = f"{ts}.png"
            raw = _distort_image(stack[i], K)
            save_png(str(d / name), raw.astype(np.uint8))
            lines.append(f"{ts},{name}")
        (root / cam / "data.csv").write_text("\n".join(lines) + "\n")

    P = np.array([[K[0, 0], 0, K[0, 2], 0], [0, K[1, 1], K[1, 2], 0],
                  [0, 0, 1, 0]])
    settings = (
        "%YAML:1.0\n"
        f"Camera.fx: {K[0,0]}\nCamera.fy: {K[1,1]}\n"
        f"Camera.cx: {K[0,2]}\nCamera.cy: {K[1,2]}\n"
        "Camera.k1: 0.0\nCamera.k2: 0.0\nCamera.p1: 0.0\nCamera.p2: 0.0\n"
        f"Camera.bf: {K[0,0] * BASELINE}\n"
        f"Camera.width: {W}\nCamera.height: {H}\nCamera.fps: 30.0\n"
        "ThDepth: 35.0\nORBextractor.nFeatures: 500\n"
        f"LEFT.width: {W}\nLEFT.height: {H}\n"
        f"RIGHT.width: {W}\nRIGHT.height: {H}\n"
        + _mat_yaml("LEFT.K", K) + _mat_yaml("LEFT.D", D.reshape(1, 4))
        + _mat_yaml("LEFT.R", np.eye(3)) + _mat_yaml("LEFT.P", P)
        + _mat_yaml("RIGHT.K", K) + _mat_yaml("RIGHT.D", D.reshape(1, 4))
        + _mat_yaml("RIGHT.R", np.eye(3)) + _mat_yaml("RIGHT.P", P)
    )
    yaml_path = tmp_path / "settings.yaml"
    yaml_path.write_text(settings)

    out = tmp_path / "traj.txt"
    from self_commit_orb_slam2_tpu.run_slam import main

    rc = main(["--dataset", "euroc", "--path", str(tmp_path),
               "--settings", str(yaml_path), "--no-vocab",
               "--output", str(out)])
    assert rc == 0
    from self_commit_orb_slam2_tpu.utils.evaluation import ate_rmse
    from self_commit_orb_slam2_tpu.utils.trajectory import load_tum

    ts, Twc = load_tum(str(out))
    assert len(ts) >= 14, "tracking lost on rectified sequence"
    est_cw = np.stack([np.linalg.inv(T) for T in Twc])
    ate = ate_rmse(est_cw, seq.poses_gt[: len(est_cw)])
    print(f"euroc-rectified ATE: {ate*100:.2f} cm")
    assert ate < 0.05
