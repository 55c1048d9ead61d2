"""Pallas FAST+NMS kernel vs the XLA formulation (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from self_commit_orb_slam2_tpu.ops.orb import fast, fast_pallas


@pytest.mark.parametrize("shape", [(64, 128), (96, 256)])
def test_fast_pallas_matches_xla(rng, shape):
    h, w = shape
    img = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        hi_p, lo_p = fast_pallas.fast_nms_hi_lo(img, 20.0, 7.0)
    hi_x = fast.nms3x3(fast.fast_response(img, 20.0))
    lo_x = fast.nms3x3(fast.fast_response(img, 7.0))
    # the kernel masks a 4px border (keypoints carry a 16px margin anyway);
    # compare with one extra pixel of slack for NMS neighbours of that band
    m = np.zeros((h, w), bool)
    m[6:-6, 6:-6] = True
    np.testing.assert_allclose(np.asarray(hi_p)[m], np.asarray(hi_x)[m], atol=1e-3)
    np.testing.assert_allclose(np.asarray(lo_p)[m], np.asarray(lo_x)[m], atol=1e-3)
    assert (np.asarray(lo_p)[m] > 0).sum() > 50  # corners actually found
