"""Int8 quantized matmul path (ops/quant.py, ModelConfig.quantize='int8').

Bounds the quantization error at the op level and end-to-end: the serving
knob must keep disparities close to the f32 path (the parity contract itself
stays on the unquantized path, which these tests also pin as bit-identical
when quantize='').
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monodepth_tpu.ops.quant import QuantDense, int8_dense, quantize_symmetric


def test_quantize_symmetric_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
    q, scale = quantize_symmetric(x, axis=-1)
    assert q.dtype == jnp.int8
    err = np.abs(np.asarray(q, np.float32) * np.asarray(scale) - np.asarray(x))
    # max error is half an LSB = scale/2 per row
    assert (err <= np.asarray(scale) * 0.5 + 1e-7).all()


def test_quantize_symmetric_zero_rows_safe():
    x = jnp.zeros((4, 16))
    q, scale = quantize_symmetric(x, axis=-1)
    assert np.isfinite(np.asarray(scale)).all()
    assert (np.asarray(q) == 0).all()


def test_int8_dense_matches_f32_within_quant_noise(rng):
    x = jnp.asarray(rng.standard_normal((8, 197, 768)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((768, 3072)) * 0.02).astype(np.float32))
    b = jnp.asarray((rng.standard_normal(3072) * 0.01).astype(np.float32))
    exact = x @ w + b
    quant = int8_dense(x, w, b)
    denom = np.abs(np.asarray(exact)) + 1e-3
    rel = np.abs(np.asarray(quant) - np.asarray(exact)) / denom
    # per-token + per-channel int8: typical rel error ~0.3-1%
    assert float(np.median(rel)) < 0.02
    assert float(np.mean(rel)) < 0.05


def test_quant_dense_param_tree_matches_nn_dense(rng):
    import flax.linen as nn

    x = jnp.asarray(rng.standard_normal((2, 5, 32)).astype(np.float32))
    ref = nn.Dense(64, name="fc").init(jax.random.PRNGKey(0), x)
    quant = QuantDense(64, name="fc").init(jax.random.PRNGKey(0), x)
    ref_shapes = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), ref)
    quant_shapes = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), quant)
    assert ref_shapes == quant_shapes


@pytest.mark.parametrize("enhanced", [False, True])
def test_model_int8_close_to_f32(rng, enhanced):
    from monodepth_tpu.models import DepthAnything, EnhancedDepthAnything

    cls = EnhancedDepthAnything if enhanced else DepthAnything
    x = jnp.asarray(rng.random((1, 96, 112, 3), dtype=np.float32))
    base = cls()
    variables = base.init(jax.random.PRNGKey(0), x)
    quant = cls(quantize="int8")

    disp_f32 = np.asarray(base.apply(variables, x)[("disp", 0)])
    disp_int8 = np.asarray(quant.apply(variables, x)[("disp", 0)])

    assert np.isfinite(disp_int8).all()
    # sigmoid-bounded disparities: quantization shifts them only slightly
    assert float(np.abs(disp_int8 - disp_f32).max()) < 5e-2
    assert float(np.abs(disp_int8 - disp_f32).mean()) < 1e-2


def test_quantize_off_is_default_and_identical(rng):
    from monodepth_tpu.models import DepthAnything

    x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    base = DepthAnything()
    variables = base.init(jax.random.PRNGKey(0), x)
    again = np.asarray(DepthAnything(quantize="").apply(variables, x)[("disp", 0)])
    ref = np.asarray(base.apply(variables, x)[("disp", 0)])
    np.testing.assert_array_equal(again, ref)


def test_estimator_accepts_quantize_flag():
    from monodepth_tpu.config import ModelConfig
    from monodepth_tpu.inference import MarsDepthEstimator

    est = MarsDepthEstimator(ModelConfig(pretrained=False, quantize="int8"))
    out = est.predict(np.random.default_rng(0).random((64, 80, 3),
                                                      dtype=np.float32))
    assert out["disp"].shape == (64, 80)
    assert np.isfinite(out["disp"]).all()


@pytest.mark.parametrize("transform", ["none", "ln", "gelu"])
def test_fused_quant_matmul_matches_reference(rng, transform):
    """Pallas fused (transform + quantize + int8 dot) kernel, interpret mode."""
    from monodepth_tpu.ops.pallas.quant_matmul import fused_quant_matmul

    m, k, n = 416, 256, 512
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((k, n)) * 0.02).astype(np.float32))
    b = jnp.asarray((rng.standard_normal(n) * 0.01).astype(np.float32))
    ln_s = jnp.asarray(1 + rng.standard_normal(k).astype(np.float32) * 0.1)
    ln_b = jnp.asarray(rng.standard_normal(k).astype(np.float32) * 0.1)

    got = np.asarray(fused_quant_matmul(
        x, *quantize_to_cols(w), b, transform=transform,
        ln_scale=ln_s, ln_bias=ln_b, interpret=True))

    xf = np.asarray(x, np.float64)
    if transform == "ln":
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        xf = (xf - mu) / np.sqrt(var + 1e-6) * np.asarray(ln_s) + np.asarray(ln_b)
    elif transform == "gelu":
        from scipy.special import erf

        xf = xf * 0.5 * (1 + erf(xf / np.sqrt(2)))
    ref = xf @ np.asarray(w, np.float64) + np.asarray(b)
    rel = np.abs(got - ref) / (np.abs(ref) + 1e-3)
    assert float(np.median(rel)) < 0.03
    assert float(np.mean(rel)) < 0.08


def quantize_to_cols(w):
    q, scale = quantize_symmetric(w, axis=0)
    return q, scale.reshape(-1)


def test_fused_quant_matmul_odd_m_padding(rng):
    from monodepth_tpu.ops.pallas.quant_matmul import fused_quant_matmul

    x = jnp.asarray(rng.standard_normal((397, 256)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((256, 512)) * 0.02).astype(np.float32))
    b = jnp.zeros((512,), jnp.float32)
    out = fused_quant_matmul(x, *quantize_to_cols(w), b, interpret=True)
    assert out.shape == (397, 512)
    assert np.isfinite(np.asarray(out)).all()
