"""End-to-end numeric parity: JAX models vs the torch oracle with shared weights.

The oracle (tests/torch_oracle.py) restates the reference's math in
torch-functional form; weights flow through models/weights.py conversion.
Target: AbsRel/δ1-level parity within 1e-3 (BASELINE.md); these tests assert
much tighter elementwise tolerances.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from monodepth_tpu.models import DepthAnything, EnhancedDepthAnything
from monodepth_tpu.models.weights import (
    convert_reference_state_dict,
    convert_vit_state_dict,
)

from tests import torch_oracle as oracle


def _to_jax_input(x_torch):
    return jnp.asarray(x_torch.numpy().transpose(0, 2, 3, 1))


def _assert_close(got_nhwc, want_nchw, atol, key=None):
    want = want_nchw.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(
        np.asarray(got_nhwc), want, atol=atol, rtol=1e-3,
        err_msg=f"mismatch for {key}",
    )


@pytest.fixture(scope="module")
def vit_sd():
    gen = torch.Generator().manual_seed(7)
    return oracle.make_vit_state_dict(gen)


@pytest.fixture(scope="module")
def model_sd():
    gen = torch.Generator().manual_seed(11)
    return oracle.make_model_state_dict(gen)


@pytest.fixture(scope="module")
def enhanced_sd():
    gen = torch.Generator().manual_seed(13)
    return oracle.make_model_state_dict(gen, enhanced=True)


def test_vit_parity(vit_sd):
    """Converted ViT weights reproduce the torch ViT's tapped activations."""
    from monodepth_tpu.models.vit import VisionTransformer

    gen = torch.Generator().manual_seed(0)
    x = torch.randn(2, 3, 224, 224, generator=gen)
    with torch.no_grad():
        want = oracle.vit_forward(vit_sd, x)

    params = convert_vit_state_dict(vit_sd)
    vit = VisionTransformer()
    got = vit.apply({"params": params}, _to_jax_input(x))
    assert len(got) == 4
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w.numpy(), atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("size", [(224, 224), (96, 112), (200, 260)])
def test_standard_model_parity(model_sd, size):
    """Full standard model (incl. the 14x15 CLS-grid quirk) matches torch."""
    gen = torch.Generator().manual_seed(1)
    x = torch.rand(1, 3, *size, generator=gen)
    with torch.no_grad():
        want = oracle.model_forward(model_sd, x, disp_scale=0.5)

    params, stats = convert_reference_state_dict(model_sd)
    model = DepthAnything()
    got = model.apply({"params": params, "batch_stats": stats}, _to_jax_input(x), 0.5)
    assert set(got.keys()) == set(want.keys())
    for key in want:
        _assert_close(got[key], want[key], atol=5e-4, key=key)


def test_enhanced_model_parity(enhanced_sd):
    gen = torch.Generator().manual_seed(2)
    x = torch.rand(1, 3, 96, 112, generator=gen)
    with torch.no_grad():
        want = oracle.enhanced_forward(enhanced_sd, x, disp_scale=2.0)

    params, stats = convert_reference_state_dict(enhanced_sd, enhanced=True)
    model = EnhancedDepthAnything()
    got = model.apply({"params": params, "batch_stats": stats}, _to_jax_input(x), 2.0)
    assert set(got.keys()) == set(want.keys())
    for key in sorted(want.keys()):
        # depth = 1/disp amplifies small absolute errors where disp ~ 0.01;
        # keep a tighter budget on disparities than on depths.
        atol = 5e-3 if key[0] == "depth" else 5e-4
        _assert_close(got[key], want[key], atol=atol, key=key)


def test_jit_forward_and_batch(model_sd):
    """Jitted forward works and is batch-consistent."""
    params, stats = convert_reference_state_dict(model_sd)
    model = DepthAnything()

    @jax.jit
    def fwd(variables, x, scale):
        return model.apply(variables, x, scale)

    variables = {"params": params, "batch_stats": stats}
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 96, 112, 3), dtype=np.float32))
    out = fwd(variables, x, jnp.asarray([1.0, 0.01]))
    d0 = out[("disp", 0)]
    assert d0.shape == (2, 96, 112, 1)
    # per-sample scale applied: second sample scaled by 0.01
    out_unit = fwd(variables, x, jnp.asarray([1.0, 1.0]))
    np.testing.assert_allclose(
        np.asarray(d0[1]), np.asarray(out_unit[("disp", 0)][1]) * 0.01, rtol=1e-5
    )


def test_absrel_delta1_parity_budget(model_sd):
    """BASELINE.md acceptance: AbsRel / δ1 between our depth and the torch
    reference's depth within 1e-3 (treating the oracle output as GT)."""
    from monodepth_tpu.layers import compute_depth_errors

    gen = torch.Generator().manual_seed(5)
    x = torch.rand(1, 3, 200, 260, generator=gen)
    with torch.no_grad():
        want = oracle.model_forward(model_sd, x, disp_scale=1.0)
    gt_disp = want[("disp", 0)].numpy()[0, 0]
    gt_depth = 1.0 / np.clip(gt_disp, 1e-6, None)

    params, stats = convert_reference_state_dict(model_sd)
    model = DepthAnything()
    got = model.apply({"params": params, "batch_stats": stats}, _to_jax_input(x), 1.0)
    pred_disp = np.asarray(got[("disp", 0)][0, ..., 0])
    pred_depth = 1.0 / np.clip(pred_disp, 1e-6, None)

    abs_rel, _, _, _, a1, _, _ = compute_depth_errors(
        jnp.asarray(gt_depth), jnp.asarray(pred_depth)
    )
    assert float(abs_rel) < 1e-3, f"AbsRel {float(abs_rel)} exceeds 1e-3"
    assert float(a1) == 1.0


def test_enhanced_light_outputs(enhanced_sd, rng=np.random.default_rng(4)):
    """light_outputs serves the same ("disp",0)/("uncertainty",0)/("depth",0)
    values as the full output contract."""
    params, stats = convert_reference_state_dict(enhanced_sd, enhanced=True)
    x = jnp.asarray(rng.random((1, 96, 112, 3), dtype=np.float32))
    full = EnhancedDepthAnything().apply(
        {"params": params, "batch_stats": stats}, x, 1.0)
    light = EnhancedDepthAnything(light_outputs=True).apply(
        {"params": params, "batch_stats": stats}, x, 1.0)
    assert set(light) == {("disp", 0), ("uncertainty", 0), ("depth", 0)}
    for key in light:
        np.testing.assert_allclose(
            np.asarray(light[key]), np.asarray(full[key]), atol=1e-6)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_seq_pad_preserves_outputs(model_sd, impl):
    """seq_pad_multiple pads tokens with masked attention — real-token
    outputs are unchanged (both attention impls)."""
    params, stats = convert_reference_state_dict(model_sd)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.random((1, 96, 112, 3), dtype=np.float32))
    base = DepthAnything(attn_impl=impl)
    padded = DepthAnything(attn_impl=impl, seq_pad_multiple=128)
    variables = {"params": params, "batch_stats": stats}
    want = np.asarray(base.apply(variables, x, 1.0)[("disp", 0)])
    got = np.asarray(padded.apply(variables, x, 1.0)[("disp", 0)])
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
