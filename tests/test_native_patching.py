"""Native-resolution mode: ViT at native grid with interpolated pos-embeds
(the performance path; SURVEY.md §3.6 'native_patching')."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monodepth_tpu.models import DepthAnything
from monodepth_tpu.models.vit import VisionTransformer


def test_vit_nonsquare_native_grid(rng):
    vit = VisionTransformer()
    x224 = jnp.asarray(rng.random((1, 224, 224, 3), dtype=np.float32))
    params = vit.init(jax.random.PRNGKey(0), x224)["params"]
    # same params, different input size: pos-embeds resampled
    x = jnp.asarray(rng.random((1, 96, 128, 3), dtype=np.float32))
    taps = vit.apply({"params": params}, x)
    assert len(taps) == 4
    n_tokens = (96 // 16) * (128 // 16) + 1
    assert all(t.shape == (1, n_tokens, 768) for t in taps)


def test_vit_224_unchanged_by_native_support(rng):
    """At exactly 224x224 the pos-embed path is the identity (no resample)."""
    vit = VisionTransformer()
    x = jnp.asarray(rng.random((1, 224, 224, 3), dtype=np.float32))
    params = vit.init(jax.random.PRNGKey(0), x)["params"]
    taps = vit.apply({"params": params}, x)
    assert taps[0].shape == (1, 197, 768)


def test_native_patching_model_forward(rng):
    model = DepthAnything(native_patching=True)
    x = jnp.asarray(rng.random((1, 96, 128, 3), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x, 1.0)
    d0 = out[("disp", 0)]
    assert d0.shape == (1, 96, 128, 1)
    assert np.isfinite(np.asarray(d0)).all()
    # native grid is (6, 8): decoder levels double it -> effective detail is
    # finer than the parity path's fixed 14x15 for large inputs
    assert (np.asarray(d0) >= 0).all() and (np.asarray(d0) <= 1).all()


def test_native_patching_shares_params_with_parity(rng):
    """Both modes use the same parameter tree (pretrained weights serve both)."""
    x = jnp.asarray(rng.random((1, 96, 128, 3), dtype=np.float32))
    parity = DepthAnything(native_patching=False)
    native = DepthAnything(native_patching=True)
    v_parity = parity.init(jax.random.PRNGKey(0), x)
    # applying native mode with parity-initialized params must work
    out = native.apply(v_parity, x, 1.0)
    assert np.isfinite(np.asarray(out[("disp", 0)])).all()
