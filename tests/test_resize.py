"""Parity tests: ops.resize vs torch.nn.functional.interpolate.

The reference mixes align_corners conventions (SURVEY.md "hard parts" (c));
these tests pin our resampling to PyTorch bit-for-bit (float32 tolerance).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from monodepth_tpu.ops.resize import resize_bilinear, resize_nearest, upsample2x_nearest

SIZES = [
    ((7, 9), (14, 18)),
    ((14, 15), (28, 30)),
    ((224, 240), (384, 512)),
    ((100, 130), (224, 224)),   # downsample (encoder input path)
    ((384, 512), (224, 224)),
    ((5, 5), (3, 3)),
    ((1, 1), (4, 4)),
]


@pytest.mark.parametrize("in_size,out_size", SIZES)
@pytest.mark.parametrize("align_corners", [False, True])
def test_bilinear_matches_torch(rng, in_size, out_size, align_corners):
    x = rng.standard_normal((2, *in_size, 3), dtype=np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_size, align_corners))
    want = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=out_size,
            mode="bilinear",
            align_corners=align_corners,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    # Our resize is separable (two fp32 passes); torch fuses the 4 taps in one
    # expression, so intermediate rounding differs by <= ~4e-5.  The parity
    # budget for the full model is 1e-3 (BASELINE.md), so 1e-4 here is strict.
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("in_size,out_size", SIZES)
def test_nearest_matches_torch(rng, in_size, out_size):
    x = rng.standard_normal((2, *in_size, 3), dtype=np.float32)
    got = np.asarray(resize_nearest(jnp.asarray(x), out_size))
    want = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=out_size, mode="nearest"
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_array_equal(got, want)


def test_upsample2x_nearest_matches_torch(rng):
    x = rng.standard_normal((2, 13, 17, 4), dtype=np.float32)
    got = np.asarray(upsample2x_nearest(jnp.asarray(x)))
    want = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2, mode="nearest")
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_array_equal(got, want)


def test_hwc_and_hw_inputs(rng):
    x = rng.standard_normal((10, 12, 3), dtype=np.float32)
    out = resize_bilinear(jnp.asarray(x), (20, 24))
    assert out.shape == (20, 24, 3)
    x2 = rng.standard_normal((10, 12), dtype=np.float32)
    out2 = resize_bilinear(jnp.asarray(x2), (5, 6))
    assert out2.shape == (5, 6)


@pytest.mark.parametrize("align_corners", [False, True])
def test_gather_path_matches_matmul(rng, align_corners):
    """The gather fallback (used for very large axes) equals the matmul path."""
    x = rng.standard_normal((1, 30, 40, 2), dtype=np.float32)
    a = np.asarray(resize_bilinear(jnp.asarray(x), (77, 91), align_corners,
                                   method="matmul"))
    b = np.asarray(resize_bilinear(jnp.asarray(x), (77, 91), align_corners,
                                   method="gather"))
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)
