"""Native C++ IO runtime vs PIL reference."""

import numpy as np
import pytest

from self_commit_orb_slam2_tpu.utils import native_io


pytestmark = pytest.mark.skipif(not native_io.available(),
                                reason="native toolchain unavailable")


def _png(path, arr, mode):
    from PIL import Image

    Image.fromarray(arr, mode=mode).save(path)


def test_png_8bit_gray(tmp_path, rng):
    arr = rng.integers(0, 255, (37, 53), dtype=np.uint8)
    p = str(tmp_path / "g8.png")
    _png(p, arr, "L")
    out = native_io.load_gray(p)
    np.testing.assert_array_equal(out, arr.astype(np.float32))


def test_png_16bit_gray(tmp_path, rng):
    arr = rng.integers(0, 65535, (24, 31), dtype=np.uint16)
    p = str(tmp_path / "g16.png")
    _png(p, arr.astype(np.int32), "I")  # PIL writes 32->16? use I;16 below
    from PIL import Image

    Image.fromarray(arr, mode="I;16").save(p)
    out = native_io.load_gray(p)
    np.testing.assert_array_equal(out, arr.astype(np.float32))


def test_png_rgb_luma(tmp_path, rng):
    arr = rng.integers(0, 255, (16, 20, 3), dtype=np.uint8)
    p = str(tmp_path / "rgb.png")
    _png(p, arr, "RGB")
    out = native_io.load_gray(p)
    luma = 0.299 * arr[..., 0] + 0.587 * arr[..., 1] + 0.114 * arr[..., 2]
    np.testing.assert_allclose(out, luma, atol=0.51)


def test_pgm(tmp_path, rng):
    arr = rng.integers(0, 255, (12, 17), dtype=np.uint8)
    p = str(tmp_path / "img.pgm")
    with open(p, "wb") as f:
        f.write(b"P5\n17 12\n255\n")
        f.write(arr.tobytes())
    out = native_io.load_gray(p)
    np.testing.assert_array_equal(out, arr.astype(np.float32))


def test_prefetcher(tmp_path, rng):
    paths = []
    arrays = []
    for i in range(6):
        arr = rng.integers(0, 255, (10, 11), dtype=np.uint8)
        p = str(tmp_path / f"f{i}.png")
        _png(p, arr, "L")
        paths.append(p)
        arrays.append(arr)
    pf = native_io.Prefetcher(paths, capacity=2)
    outs = list(pf)
    pf.close()
    assert len(outs) == 6
    for got, want in zip(outs, arrays):
        np.testing.assert_array_equal(got, want.astype(np.float32))
