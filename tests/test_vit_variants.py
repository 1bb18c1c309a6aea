"""ViT backbone size variants (small/base/large, models/encoder.py
VIT_VARIANTS).  The reference hard-codes torchvision vit_b_16
(encoder.py:29-35); the variants reuse the same encoder contract — four
256-channel feature maps — so the decoder and every head are untouched."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monodepth_tpu.models.encoder import VIT_VARIANTS, DepthAnythingEncoder


@pytest.mark.parametrize("variant", ["small", "base", "large"])
def test_encoder_variant_shapes(rng, variant):
    """Every variant inits, forwards (native mode, tiny grid), and exposes
    the variant's width/depth in its param tree; outputs stay 4 x 256ch."""
    spec = VIT_VARIANTS[variant]
    enc = DepthAnythingEncoder(vit_variant=variant, native_patching=True)
    x = jnp.asarray(rng.standard_normal((1, 32, 48, 3), dtype=np.float32))
    variables = enc.init(jax.random.PRNGKey(0), x)
    feats = enc.apply(variables, x)

    assert len(feats) == 4
    for f in feats:
        assert f.shape == (1, 2, 3, 256)  # 32/16 x 48/16 grid, 256ch

    vit = variables["params"]["vit"]
    blocks = [k for k in vit if k.startswith("block_")]
    assert len(blocks) == spec["num_layers"]
    d = spec["hidden_dim"]
    assert vit["cls_token"].shape[-1] == d
    assert vit["block_0"]["qkv"]["kernel"].shape == (d, 3 * d)
    assert vit["block_0"]["mlp"]["fc1"]["kernel"].shape == (d, spec["mlp_dim"])
    # taps must exist and fit inside the tower
    assert max(spec["tap_indices"]) < spec["num_layers"]


def test_variant_taps_quarter_points():
    for spec in VIT_VARIANTS.values():
        L = spec["num_layers"]
        assert spec["tap_indices"] == tuple(L // 4 * k - 1 for k in (1, 2, 3, 4))


def test_parity_model_small_variant_contract(rng):
    """The full standard model runs with a non-base backbone and keeps the
    reference output contract (all four disp scales at input size)."""
    from monodepth_tpu.models import DepthAnything

    model = DepthAnything(vit_variant="small")
    x = jnp.asarray(rng.random((1, 64, 48, 3), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    for s in range(4):
        assert out[("disp", s)].shape == (1, 64, 48, 1)
        v = np.asarray(out[("disp", s)])
        assert np.isfinite(v).all() and (v >= 0).all() and (v <= 1).all()


def test_vit_l_state_dict_roundtrip(rng):
    """torchvision vit_l_16-shaped weights convert with NO extra args (layer
    count inferred from the keys) and export back to identical tensors."""
    from monodepth_tpu.models.weights import (
        convert_vit_state_dict, export_vit_state_dict,
    )

    enc = DepthAnythingEncoder(vit_variant="large", native_patching=True)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3), dtype=np.float32))
    params = enc.init(jax.random.PRNGKey(1), x)["params"]["vit"]

    sd = export_vit_state_dict(params, num_layers=24)
    assert "encoder.layers.encoder_layer_23.ln_1.weight" in sd
    back = convert_vit_state_dict({k: np.asarray(v) for k, v in sd.items()})

    flat_a = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(params)}
    flat_b = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(back)}
    assert set(flat_a) == set(flat_b)
    for k, va in flat_a.items():
        np.testing.assert_array_equal(np.asarray(va), np.asarray(flat_b[k]),
                                      err_msg=k)


def test_vit_checkpoint_variant_guard(rng):
    """vit_params_compatible refuses a base-width checkpoint for a small
    backbone (shape graft would only explode at the first jitted apply)."""
    from monodepth_tpu.models.weights import vit_params_compatible

    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3), dtype=np.float32))

    def vit_params(variant):
        enc = DepthAnythingEncoder(vit_variant=variant, native_patching=True)
        return enc.init(jax.random.PRNGKey(0), x)["params"]["vit"]

    base, small = vit_params("base"), vit_params("small")
    assert vit_params_compatible(base, base)
    assert not vit_params_compatible(base, small)
    assert not vit_params_compatible(small, base)
