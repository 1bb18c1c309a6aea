"""Refinement library tests: guided filter, hole filling, learnable modules."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monodepth_tpu.models.refinement import (
    DepthQualityEnhancement,
    MultiScaleDepthFusion,
    TextureAwareRefinementModule,
    guided_filter,
    multi_scale_fusion_refine,
)


def test_guided_filter_preserves_constant():
    x = np.full((32, 32), 3.0, dtype=np.float32)
    out = guided_filter(x, x, radius=4, eps=0.01)
    np.testing.assert_allclose(out, 3.0, atol=1e-5)


def test_guided_filter_smooths_noise(rng):
    clean = np.linspace(0, 1, 64)[None, :].repeat(64, 0).astype(np.float32)
    noisy = clean + rng.standard_normal((64, 64)).astype(np.float32) * 0.1
    out = guided_filter(clean, noisy, radius=8, eps=0.01)
    assert np.abs(out - clean).mean() < np.abs(noisy - clean).mean()


def test_fast_guided_filter_matches_exact_bounded(rng):
    """VERDICT r2 item 2: the fast guided filter (He & Sun 2015, subsample
    s) must stay within a stated bound of the exact full-resolution filter
    on smooth-structure inputs (the depth-map regime it is used in)."""
    from monodepth_tpu.models.refinement import fast_guided_filter

    # depth-like smooth field + noise, RGB-luma-like guide
    yy, xx = np.mgrid[0:128, 0:128] / 128.0
    src = (2.0 + yy * 3 + np.sin(xx * 6) * 0.5
           + rng.standard_normal((128, 128)) * 0.05).astype(np.float32)
    guide = (0.5 + 0.3 * np.sin(yy * 9) + 0.2 * xx
             + rng.standard_normal((128, 128)) * 0.02).astype(np.float32)
    exact = guided_filter(guide, src, radius=8, eps=0.1)
    for s, tol in ((2, 0.05), (4, 0.10)):
        fast = fast_guided_filter(guide, src, radius=8, eps=0.1, subsample=s)
        assert np.abs(fast - exact).max() < tol, (s, np.abs(fast - exact).max())
    # s=1 is exactly the full-res filter
    np.testing.assert_allclose(
        fast_guided_filter(guide, src, radius=8, eps=0.1, subsample=1),
        exact, atol=1e-6)


def test_fast_guided_filter_preserves_constant():
    from monodepth_tpu.models.refinement import fast_guided_filter

    x = np.full((64, 64), 3.0, dtype=np.float32)
    out = fast_guided_filter(x, x, radius=8, eps=0.01, subsample=4)
    np.testing.assert_allclose(out, 3.0, atol=1e-5)


def test_batched_smooth_fast_vs_exact_bounded(rng):
    """The production batched path (subsample=4) vs the exact filter on the
    normalized-depth pipeline it actually runs."""
    from monodepth_tpu.models.refinement import batched_smooth

    yy = np.linspace(0, 3, 96, dtype=np.float32)
    depth = (1.0 + yy[None, :, None] + yy[None, None, :]
             + rng.standard_normal((2, 96, 96)).astype(np.float32) * 0.1)
    guide = rng.random((2, 96, 96), dtype=np.float32)
    exact = np.asarray(batched_smooth(jnp.asarray(depth), jnp.asarray(guide),
                                      radius=6, eps=0.1, subsample=1))
    fast = np.asarray(batched_smooth(jnp.asarray(depth), jnp.asarray(guide),
                                     radius=6, eps=0.1, subsample=4))
    scale = depth.max() - depth.min()
    assert np.abs(fast - exact).max() / scale < 0.05


def test_fill_depth_holes(rng):
    depth = rng.random((32, 32)).astype(np.float32) + 1.0
    depth[10:13, 10:13] = np.nan
    depth[20, 20] = -1.0
    filled = DepthQualityEnhancement.fill_depth_holes(depth)
    assert np.isfinite(filled).all()
    assert (filled > 0).all()


def test_fill_depth_holes_skips_large(rng):
    depth = rng.random((64, 64)).astype(np.float32) + 1.0
    depth[:40, :40] = np.nan  # hole of 1600 px > max_hole_size^2
    filled = DepthQualityEnhancement.fill_depth_holes(depth, max_hole_size=10)
    assert np.isfinite(filled).all()  # median-blur fallback still patches NaNs


def test_temporal_consistency():
    a = np.ones((8, 8), np.float32)
    b = np.full((8, 8), 3.0, np.float32)
    out = DepthQualityEnhancement.temporal_consistency_filter([a, b])
    np.testing.assert_allclose(out, 2.0)
    out_w = DepthQualityEnhancement.temporal_consistency_filter([a, b], weights=[3, 1])
    np.testing.assert_allclose(out_w, 1.5)
    assert DepthQualityEnhancement.temporal_consistency_filter([]) is None
    np.testing.assert_allclose(
        DepthQualityEnhancement.temporal_consistency_filter([b]), 3.0
    )


def test_bilateral_and_edge_preserving(rng):
    depth = (rng.random((48, 48)) * 5 + 1).astype(np.float32)
    rgb = rng.random((48, 48, 3)).astype(np.float32)
    out1 = DepthQualityEnhancement.bilateral_depth_filter(depth, rgb)
    out2 = DepthQualityEnhancement.bilateral_depth_filter(depth)
    out3 = DepthQualityEnhancement.edge_preserving_smoothing(depth, rgb)
    for out in (out1, out2, out3):
        assert out.shape == depth.shape
        assert np.isfinite(out).all()
        # smoothing keeps the overall range
        assert out.min() >= depth.min() - 1 and out.max() <= depth.max() + 1


def test_multi_scale_fusion_refine_pipeline(rng):
    depth = (rng.random((40, 40)) * 5 + 1).astype(np.float32)
    depth[5, 5] = np.nan
    rgb = rng.random((40, 40, 3)).astype(np.float32)
    out = multi_scale_fusion_refine(depth, rgb)
    assert out.shape == depth.shape
    assert np.isfinite(out).all()


def test_texture_aware_refinement_module(rng):
    mod = TextureAwareRefinementModule(features=16)
    depth = jnp.asarray(rng.random((1, 24, 24, 1), dtype=np.float32))
    rgb = jnp.asarray(rng.random((1, 48, 48, 3), dtype=np.float32))  # resized inside
    params = mod.init(jax.random.PRNGKey(0), depth, rgb)
    out = mod.apply(params, depth, rgb)
    assert out.shape == (1, 24, 24, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_multi_scale_depth_fusion_module(rng):
    mod = MultiScaleDepthFusion(scales=(0, 1, 2, 3))
    scales = {
        ("disp", s): jnp.asarray(
            rng.random((1, 32 >> s, 32 >> s, 1), dtype=np.float32)
        )
        for s in range(4)
    }
    params = mod.init(jax.random.PRNGKey(0), scales)
    out = mod.apply(params, scales)
    assert out.shape == (1, 32, 32, 1)
    assert np.isfinite(np.asarray(out)).all()
