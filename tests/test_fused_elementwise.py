"""Fused residual-add + LayerNorm kernel (ops/pallas/elementwise.py):
interpret-mode parity with the jnp reference, flax-LayerNorm agreement,
gradient correctness of the custom VJP, and odd-row padding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monodepth_tpu.ops.pallas.elementwise import add_ln_reference, fused_add_ln


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(2, 64, 768), (1, 197, 768), (3, 9, 256)])
def test_fused_matches_reference(dtype, shape):
    rng = np.random.default_rng(0)
    d = shape[-1]
    x = jnp.asarray(rng.standard_normal(shape), dtype)
    y = jnp.asarray(rng.standard_normal(shape), dtype)
    gamma = jnp.asarray(rng.standard_normal((d,)), jnp.float32)
    beta = jnp.asarray(rng.standard_normal((d,)), jnp.float32)

    x2_ref, ln_ref = add_ln_reference(x, y, gamma, beta)
    x2, ln = fused_add_ln(x, y, gamma, beta, interpret=True)
    assert x2.dtype == dtype and ln.dtype == dtype
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(x2, np.float32),
                               np.asarray(x2_ref, np.float32), atol=tol)
    np.testing.assert_allclose(np.asarray(ln, np.float32),
                               np.asarray(ln_ref, np.float32), atol=tol)


def test_fused_matches_flax_layernorm():
    """The composed op must equal add -> flax nn.LayerNorm(eps=1e-6) — the
    exact chain it replaces in EncoderBlock (models/vit.py:109-111)."""
    import flax.linen as nn

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 33, 128)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, 33, 128)), jnp.float32)
    ln_mod = nn.LayerNorm(epsilon=1e-6)
    variables = ln_mod.init(jax.random.PRNGKey(0), x)
    gamma = variables["params"]["scale"]
    beta = variables["params"]["bias"]

    expected = ln_mod.apply(variables, x + y)
    _, ln = fused_add_ln(x, y, gamma, beta, interpret=True)
    np.testing.assert_allclose(np.asarray(ln), np.asarray(expected),
                               atol=1e-5)


def test_fused_row_padding():
    """Row counts not divisible by block_rows pad internally and slice back."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 7, 256)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((1, 7, 256)), jnp.float32)
    gamma = jnp.ones((256,), jnp.float32)
    beta = jnp.zeros((256,), jnp.float32)
    x2_ref, ln_ref = add_ln_reference(x, y, gamma, beta)
    x2, ln = fused_add_ln(x, y, gamma, beta, block_rows=4, interpret=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x2_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ln), np.asarray(ln_ref), atol=1e-6)


def test_custom_vjp_matches_reference_grads():
    """Gradients through the fused op equal gradients through the jnp
    reference for every input, including both outputs contributing."""
    rng = np.random.default_rng(3)
    shape, d = (2, 9, 128), 128
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    y = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal((d,)), jnp.float32)
    beta = jnp.asarray(rng.standard_normal((d,)), jnp.float32)
    wx2 = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    wln = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    def loss_fused(x, y, g, b):
        x2, ln = fused_add_ln(x, y, g, b, 1e-6, 512, True)
        return jnp.sum(x2 * wx2) + jnp.sum(ln * wln)

    def loss_ref(x, y, g, b):
        x2, ln = add_ln_reference(x, y, g, b)
        return jnp.sum(x2 * wx2) + jnp.sum(ln * wln)

    grads_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, y, gamma, beta)
    grads_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, y, gamma, beta)
    for gf, gr in zip(grads_f, grads_r):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=2e-4, rtol=2e-4)
