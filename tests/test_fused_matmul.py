"""Fused Dense + GELU kernel (ops/pallas/matmul.py): interpret-mode parity
with the jnp reference, agreement with the flax MlpBlock fc1 chain it would
replace, gradient correctness of the custom VJP, N-blocking, odd-M padding,
and the tanh-approximation bound."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monodepth_tpu.ops.pallas.matmul import (
    dense_gelu_reference, fused_dense_gelu, gelu_f32,
)


def _data(m_shape, k, n, dtype, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((*m_shape, k)), dtype)
    w = jnp.asarray(rng.standard_normal((k, n)) / np.sqrt(k), jnp.float32)
    b = jnp.asarray(rng.standard_normal((n,)) * 0.1, jnp.float32)
    return x, w, b


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("gelu_impl", ["erf", "tanh"])
def test_fused_matches_reference(dtype, gelu_impl):
    x, w, b = _data((2, 33), 128, 256, dtype)
    ref = dense_gelu_reference(x, w.astype(dtype), b, gelu_impl)
    out = fused_dense_gelu(x, w, b, gelu_impl, 512, 256, True)
    assert out.dtype == dtype and out.shape == (2, 33, 256)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=tol)


def test_n_blocking_and_m_padding():
    """Multiple N blocks + an M that is not a block multiple."""
    x, w, b = _data((3, 41), 64, 512, jnp.float32)
    ref = dense_gelu_reference(x, w, b)
    out = fused_dense_gelu(x, w, b, "erf", 16, 128, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_matches_flax_fc1_chain():
    """Equals Dense(name='fc1') -> nn.gelu(approximate=False) — the exact
    chain in MlpBlock (models/vit.py) — within one extra bf16 rounding (the
    fused kernel rounds once AFTER the f32 gelu; flax rounds the matmul
    output first)."""
    import flax.linen as nn

    x, w, b = _data((2, 17), 96, 192, jnp.float32)
    dense = nn.Dense(192, dtype=jnp.float32)
    variables = {"params": {"kernel": w, "bias": b}}
    ref = nn.gelu(dense.apply(variables, x), approximate=False)
    out = fused_dense_gelu(x, w, b, "erf", 512, 192, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gradients_match_reference():
    x, w, b = _data((2, 9), 32, 64, jnp.float32)

    def loss_fused(x, w, b):
        return jnp.sum(fused_dense_gelu(x, w, b, "erf", 512, 64, True) ** 2)

    def loss_ref(x, w, b):
        return jnp.sum(dense_gelu_reference(x, w, b) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


def test_tanh_approximation_bound():
    """The tanh form's deviation from exact erf GELU must stay of the order
    of bf16 rounding (the basis for offering it as a measured serving knob:
    max |Δ| ~1e-3 absolute over the activation range)."""
    z = jnp.linspace(-8.0, 8.0, 20001, dtype=jnp.float32)
    d = np.abs(np.asarray(gelu_f32(z, "tanh") - gelu_f32(z, "erf")))
    assert d.max() < 2e-3, d.max()


def test_kernel_erf_approximation_accuracy():
    """Mosaic cannot lower lax.erf (NotImplementedError on real TPU,
    round-4 probe), so inside the kernel 'erf' uses the A&S 7.1.26 form.
    Its mathematical bound is |err| <= 1.5e-7, but evaluating the
    polynomial in f32 adds its own rounding (measured max ~4.6e-7 over
    [-6, 6]); the bound asserted here is the f32-evaluation one — still
    four orders below one bf16 output rounding (~4e-3)."""
    from monodepth_tpu.ops.pallas.matmul import _erf_as7126_f32

    x = jnp.linspace(-6.0, 6.0, 50001, dtype=jnp.float32)
    d_erf = np.abs(np.asarray(_erf_as7126_f32(x) - jax.lax.erf(x)))
    assert d_erf.max() < 1e-6, d_erf.max()
    d_gelu = np.abs(np.asarray(gelu_f32(x, "erf", in_kernel=True)
                               - gelu_f32(x, "erf")))
    assert d_gelu.max() < 3e-6, d_gelu.max()


def test_mlp_impl_xla_tanh_matches_xla_within_tanh_bound():
    """mlp_impl='xla_tanh' shares the param tree with 'xla' and deviates
    only by the tanh-vs-erf GELU bound (the measured cheap serving win:
    tower 52.9 -> 32.7 ms on-chip, round 4)."""
    from monodepth_tpu.models import DepthAnything

    xla = DepthAnything(dtype=jnp.bfloat16, scales=(0,), output_scales=(0,))
    tanh = DepthAnything(dtype=jnp.bfloat16, scales=(0,), output_scales=(0,),
                         mlp_impl="xla_tanh")
    x = jnp.asarray(np.random.default_rng(1).uniform(size=(1, 64, 64, 3)),
                    jnp.float32)
    variables = xla.init(jax.random.PRNGKey(0), x)
    v2 = tanh.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(v2)
    out_x = np.asarray(xla.apply(variables, x)[("disp", 0)], np.float32)
    out_t = np.asarray(tanh.apply(variables, x)[("disp", 0)], np.float32)
    np.testing.assert_allclose(out_x, out_t, atol=2e-2)
    assert np.mean(np.abs(out_x - out_t)) < 3e-3


def test_jit_compiles_interpret():
    x, w, b = _data((2, 13), 32, 64, jnp.bfloat16)
    f = jax.jit(lambda x, w, b: fused_dense_gelu(x, w, b, "erf", 8, 64, True))
    out = f(x, w, b)
    ref = dense_gelu_reference(x, w.astype(jnp.bfloat16), b)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)


def test_model_level_fused_mlp_matches_xla():
    """DepthAnything with mlp_impl='fused' shares the param tree with 'xla'
    and computes the same disparities within bf16 tolerance (interpret mode
    on CPU)."""
    from monodepth_tpu.models import DepthAnything

    xla = DepthAnything(dtype=jnp.bfloat16, scales=(0,), output_scales=(0,))
    fused = DepthAnything(dtype=jnp.bfloat16, scales=(0,), output_scales=(0,),
                          mlp_impl="fused")
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 64, 64, 3)),
                    jnp.float32)
    variables = xla.init(jax.random.PRNGKey(0), x)
    v2 = fused.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(v2)
    out_x = xla.apply(variables, x)[("disp", 0)]
    out_f = fused.apply(variables, x)[("disp", 0)]
    np.testing.assert_allclose(np.asarray(out_x, np.float32),
                               np.asarray(out_f, np.float32), atol=2e-2)
    assert np.mean(np.abs(np.asarray(out_x, np.float32)
                          - np.asarray(out_f, np.float32))) < 3e-3


def test_mlp_impl_auto_resolution():
    """'auto' (the ModelConfig default) resolves to tanh GELU ONLY on the
    bf16 native serving path; the f32 parity path and training configs
    (native_patching=False) keep the torch-exact erf (round-5 on-chip A/B:
    84.0 vs 69.6 img/s native, tanh deviation == bf16-rounding order)."""
    from monodepth_tpu.config import ModelConfig
    from monodepth_tpu.models import _resolve_mlp_impl

    assert ModelConfig().mlp_impl == "auto"
    assert _resolve_mlp_impl(ModelConfig(
        native_patching=True, dtype="bfloat16")) == "xla_tanh"
    assert _resolve_mlp_impl(ModelConfig()) == "xla"                # parity
    assert _resolve_mlp_impl(ModelConfig(dtype="bfloat16")) == "xla"
    assert _resolve_mlp_impl(ModelConfig(native_patching=True)) == "xla"
    assert _resolve_mlp_impl(ModelConfig(
        native_patching=True, dtype="bfloat16",
        mlp_impl="fused")) == "fused"                               # explicit wins
