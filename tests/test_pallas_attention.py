"""Pallas kernel validation in interpret mode vs jnp references
(SURVEY.md §4 item 5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monodepth_tpu.ops.attention import _mha_xla, spatial_self_attention
from monodepth_tpu.ops.pallas.attention import fused_mha, fused_spatial_attention


@pytest.mark.parametrize("s", [197, 128, 260])
def test_fused_mha_matches_xla(rng, s):
    b, dim, heads = 2, 768, 12
    q = jnp.asarray(rng.standard_normal((b, s, dim), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, dim), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, dim), dtype=np.float32))
    want = np.asarray(_mha_xla(q, k, v, heads))
    got = np.asarray(fused_mha(q, k, v, num_heads=heads, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_fused_mha_padding_mask_correct(rng):
    """Padding tokens must not leak into attention (s=197 -> pad 256)."""
    b, dim, heads = 1, 64, 4
    s = 130  # forces padding to 256
    q = jnp.asarray(rng.standard_normal((b, s, dim), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, dim), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, dim), dtype=np.float32))
    want = np.asarray(_mha_xla(q, k, v, heads))
    got = np.asarray(fused_mha(q, k, v, num_heads=heads, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_fused_mha_long_sequence_8k(rng):
    """K/V-blocked online softmax: VMEM use is O(block) so >=8k tokens work
    (VERDICT r1 item 1).  Interpret mode, small head count to keep CPU cost
    sane; an odd length exercises both q- and k-padding."""
    b, s, dim, heads = 1, 8195, 64, 1
    q = jnp.asarray(rng.standard_normal((b, s, dim), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, dim), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, dim), dtype=np.float32))
    want = np.asarray(_mha_xla(q, k, v, heads))
    got = np.asarray(fused_mha(q, k, v, num_heads=heads, interpret=True))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_fused_spatial_attention_matches_xla(rng):
    b, h, w, c = 2, 14, 15, 256
    cq = c // 8
    q = jnp.asarray(rng.standard_normal((b, h, w, cq), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, w, cq), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, w, c), dtype=np.float32))
    x = jnp.asarray(rng.standard_normal((b, h, w, c), dtype=np.float32))
    gamma = jnp.float32(0.7)

    want = np.asarray(spatial_self_attention(q, k, v, x, gamma, impl="xla"))
    n = h * w
    got_attn = fused_spatial_attention(
        q.reshape(b, n, cq), k.reshape(b, n, cq), v.reshape(b, n, c),
        interpret=True,
    ).reshape(b, h, w, c)
    got = np.asarray(gamma * got_attn + x)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("kw", [
    dict(full_kv=True),
    dict(full_kv=False, block_q=128, block_k=128),
    dict(full_kv=False, block_q=64, block_k=256),
])
def test_fused_spatial_attention_block_overrides(rng, kw):
    """full_kv / block-size overrides (the dev_spatial_ablate A/B space)
    stay numerically identical to the XLA reference."""
    b, n, c = 2, 300, 256
    cq = c // 8
    q = jnp.asarray(rng.standard_normal((b, n, cq), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, n, cq), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, n, c), dtype=np.float32))
    e = jnp.einsum("bic,bjc->bij", q, k)
    want = np.asarray(jnp.einsum("bij,bjc->bic", jax.nn.softmax(e, -1), v))
    got = np.asarray(fused_spatial_attention(q, k, v, interpret=True, **kw))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_fused_mha_bf16(rng):
    b, s, dim, heads = 1, 197, 768, 12
    q = jnp.asarray(rng.standard_normal((b, s, dim), dtype=np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, dim), dtype=np.float32)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, dim), dtype=np.float32)).astype(jnp.bfloat16)
    want = np.asarray(_mha_xla(q, k, v, heads)).astype(np.float32)
    got = np.asarray(fused_mha(q, k, v, num_heads=heads, interpret=True)).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=0.06, rtol=0.05)


def test_full_model_with_pallas_attention(rng):
    """Standard + enhanced models produce identical outputs with the Pallas
    attention path (interpret mode) vs the XLA path."""
    from monodepth_tpu.models import DepthAnything, EnhancedDepthAnything

    x = jnp.asarray(rng.random((1, 64, 80, 3), dtype=np.float32))
    for cls in (DepthAnything, EnhancedDepthAnything):
        m_xla = cls(attn_impl="xla")
        m_pls = cls(attn_impl="pallas")
        variables = m_xla.init(jax.random.PRNGKey(0), x)
        want = m_xla.apply(variables, x, 1.0)
        got = m_pls.apply(variables, x, 1.0)
        for key in want:
            np.testing.assert_allclose(
                np.asarray(got[key]), np.asarray(want[key]),
                atol=3e-5, rtol=1e-4, err_msg=f"{cls.__name__} {key}",
            )


@pytest.mark.parametrize("s,valid", [(208, 197), (197, None), (128, None)])
def test_fused_mha_short_matches_xla(rng, s, valid):
    """Short-sequence packed-head kernel (parity path, VERDICT r1 item 2)."""
    from monodepth_tpu.ops.pallas.attention import fused_mha_short

    b, dim, heads = 2, 768, 12
    q = jnp.asarray(rng.standard_normal((b, s, dim), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, dim), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, dim), dtype=np.float32))
    want = np.asarray(_mha_xla(q, k, v, heads, valid_len=valid))
    got = np.asarray(fused_mha_short(q, k, v, num_heads=heads,
                                     valid_len=valid, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_fused_mha_short_bf16(rng):
    from monodepth_tpu.ops.pallas.attention import fused_mha_short

    b, s, dim, heads = 1, 208, 384, 6
    mk = lambda: jnp.asarray(
        rng.standard_normal((b, s, dim), dtype=np.float32)).astype(jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    want = np.asarray(_mha_xla(q, k, v, heads, valid_len=197), np.float32)
    got = np.asarray(fused_mha_short(q, k, v, num_heads=heads, valid_len=197,
                                     interpret=True), np.float32)
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)


def test_pallas_impl_pooled_kv_cross_length(rng):
    """SRA-pooled K/V (Sq != Sk) through impl='pallas' must route to the
    flash kernel and match XLA — the short kernel mis-sliced unequal
    lengths (produced NaNs on the real chip before the guard)."""
    from monodepth_tpu.ops.attention import multi_head_attention

    b, sq, sk, dim, heads = 1, 513, 129, 768, 12
    q = jnp.asarray(rng.standard_normal((b, sq, dim), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, sk, dim), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, sk, dim), dtype=np.float32))
    want = np.asarray(_mha_xla(q, k, v, heads))
    got = np.asarray(multi_head_attention(q, k, v, num_heads=heads,
                                          impl="pallas"))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_native_sra_pallas_model_finite(rng):
    """Full model: native + window + SRA + pallas impl (the exact config
    that NaN'd on the TPU) stays finite."""
    from monodepth_tpu.models import DepthAnything

    model = DepthAnything(native_patching=True, attn_window=4,
                          attn_global_pool=2, attn_impl="pallas",
                          dtype=jnp.bfloat16, seq_pad_multiple=1,
                          output_scales=(0,))
    x = jnp.asarray(rng.random((1, 128, 192, 3), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    disp = np.asarray(model.apply(variables, x)[("disp", 0)], np.float32)
    assert disp.shape == (1, 128, 192, 1)
    assert np.isfinite(disp).all()
