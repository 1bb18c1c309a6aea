"""Fused (LayerNorm | GELU | identity) + int8-quantize + int8 MXU matmul.

Why this kernel exists (measured on v5e, scripts/dev_peak_probe.py):
- practical bf16 matmul peak through this stack is ~150 T/s; XLA already
  runs the ViT tower's dense matmuls at ~96% of that — no bf16 headroom;
- the int8 MXU path is genuinely faster (203 T/s @4096^3, 271 T/s @8192^3);
- but XLA's int8 dot with an *in-graph* dynamic quantization chain loses the
  entire advantage to the unfused amax/round/clip passes (measured parity
  with bf16 in dev_mxu_probe2).

So the quantization must live INSIDE the matmul kernel: each grid program
loads an activation row-block once, applies the input transform (LayerNorm
for qkv/fc1, exact-erf GELU for fc2, identity for out_proj), computes the
per-token max-abs scale, quantizes to int8 in VMEM, runs the int8*int8->int32
MXU dot against resident pre-quantized weights, and dequantizes on the way
out — one HBM read of x, one write of y, weights stay in VMEM across the
whole M sweep.

Weights quantize per-output-channel (symmetric max-abs / 127) — done once
outside (see monodepth_tpu.ops.quant.quantize_symmetric); activations
per-token symmetric.

Production status: this is the measured fused ALTERNATIVE that did not beat
the XLA path at ViT-B shapes (106-117 T/s vs 97-127 for XLA bf16 LN+dense —
at K=768 the VPU quantize/dequant epilogue eats the int8 MXU gain; see
docs/PERF_STUDY.md "Why int8 doesn't save the parity path").  The serving
knob `ModelConfig.quantize='int8'` therefore routes through the XLA
int8_dense/QuantDense path; this kernel is retained for benchmarking and as
the template for >=4096-wide contractions where the int8 advantage is real.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_quant_matmul"]


def _transform(x, transform, ln_scale, ln_bias):
    if transform == "ln":
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + 1e-6)
        return x * ln_scale + ln_bias
    if transform == "gelu":
        # torch.nn.GELU default: exact erf form
        return x * 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(2.0).astype(x.dtype)))
    assert transform == "none", transform
    return x


def _qmm_kernel(x_ref, wq_ref, wscale_ref, bias_ref, ln_s_ref, ln_b_ref,
                o_ref, *, transform: str):
    x = x_ref[...].astype(jnp.float32)                      # [bm, K]
    ln_s = ln_s_ref[...].astype(jnp.float32) if ln_s_ref is not None else None
    ln_b = ln_b_ref[...].astype(jnp.float32) if ln_b_ref is not None else None
    x = _transform(x, transform, ln_s, ln_b)

    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)      # [bm, 1]
    xscale = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(x / xscale), -127, 127).astype(jnp.int8)

    acc = jax.lax.dot_general(
        xq, wq_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                       # [bm, N] int32
    y = acc.astype(jnp.float32) * xscale * wscale_ref[...].astype(jnp.float32)
    y = y + bias_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def fused_quant_matmul(x, w_q, w_scale, bias, *, transform: str = "none",
                       ln_scale=None, ln_bias=None, block_m: int = 512,
                       out_dtype=None, interpret: bool = False):
    """y = transform(x) @ (w_q * w_scale) + bias via the int8 MXU.

    x: [M, K] bf16/f32; w_q: [K, N] int8; w_scale: [N] f32 (per out channel);
    bias: [N] f32; transform: 'none' | 'ln' (needs ln_scale/ln_bias [K]) |
    'gelu'.  Returns [M, N] in out_dtype (default x.dtype).
    """
    m, k = x.shape
    _, n = w_q.shape
    out_dtype = out_dtype or x.dtype
    assert transform in ("none", "ln", "gelu")
    if transform == "ln":
        assert ln_scale is not None and ln_bias is not None
    else:
        ln_scale = jnp.zeros((k,), jnp.float32) if ln_scale is None else ln_scale
        ln_bias = jnp.zeros((k,), jnp.float32) if ln_bias is None else ln_bias

    block_m = min(block_m, ((m + 7) // 8) * 8)
    m_pad = ((m + block_m - 1) // block_m) * block_m
    if m_pad != m:
        x = jnp.pad(x, [(0, m_pad - m), (0, 0)])

    kernel = functools.partial(_qmm_kernel, transform=transform)
    out = pl.pallas_call(
        kernel,
        grid=(m_pad // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        interpret=interpret,
    )(x, w_q, w_scale.reshape(1, n).astype(jnp.float32),
      bias.reshape(1, n).astype(jnp.float32),
      ln_scale.reshape(1, k).astype(jnp.float32),
      ln_bias.reshape(1, k).astype(jnp.float32))
    return out[:m]
