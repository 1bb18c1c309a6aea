"""Fused attention Pallas TPU kernels.

Two kernels, both with jnp reference implementations in
`monodepth_tpu.ops.attention` used for validation (interpret mode on CPU):

- `fused_mha(q, k, v, num_heads)` — multi-head attention for the ViT
  (197 tokens in parity mode, up to 4096 in native-resolution mode).
  Grid over (batch*heads, q-blocks); each program holds its full K/V in VMEM
  (4096 x 64 bf16 = 512 KB, well within the ~16 MB budget), computes the
  masked q-block logits, a numerically-stable softmax, and the PV matmul in
  one fused pass — the [S, S] attention matrix never touches HBM.
- `fused_spatial_attention(q, k, v)` — the enhanced model's HWxHW non-local
  attention (reference enhanced_model.py:24-33): same structure over
  (batch, q-blocks) with channel-major value contraction.

Both keep f32 accumulation (preferred_element_type) regardless of input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_mha", "fused_spatial_attention"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, s_real: int, scale: float):
    """One q-block vs full K/V: masked softmax attention.

    q_ref: [BQ, D]; k_ref/v_ref: [S_pad, D]; o_ref: [BQ, D].
    """
    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, S_pad]
    s_pad = logits.shape[-1]
    if s_pad != s_real:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < s_real, logits, -jnp.inf)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    v = v_ref[0].astype(jnp.float32)
    out = jnp.dot(p, v, preferred_element_type=jnp.float32) / denom
    o_ref[0] = out.astype(o_ref.dtype)


def _flash_attention(q, k, v, *, scale: float, block_q: int = 128,
                     interpret: bool = False, valid_len: int = None):
    """q, k, v: [G, S, D] (G = batch*heads) -> [G, S, D]."""
    g, s, d = q.shape
    if valid_len is None:
        valid_len = s
    s_pad = _round_up(s, block_q)
    if s_pad != s:
        pad = [(0, 0), (0, s_pad - s), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    kernel = functools.partial(_attention_kernel, s_real=valid_len, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(g, s_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, s_pad, d), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out[:, :s, :]


def fused_mha(q, k, v, *, num_heads: int, interpret: bool = False,
              valid_len=None):
    """Multi-head attention over [B, S, D] q/k/v (already projected).

    Equivalent to ops.attention._mha_xla; softmax scale 1/sqrt(head_dim).
    valid_len masks keys beyond that index (pre-padded sequences).
    """
    b, s, dim = q.shape
    hd = dim // num_heads

    def split(x):
        return (x.reshape(b, s, num_heads, hd)
                 .transpose(0, 2, 1, 3)
                 .reshape(b * num_heads, s, hd))

    scale = float(1.0 / (hd ** 0.5))
    out = _flash_attention(split(q), split(k), split(v), scale=scale,
                           interpret=interpret,
                           valid_len=valid_len if valid_len is not None else s)
    return (out.reshape(b, num_heads, s, hd)
               .transpose(0, 2, 1, 3)
               .reshape(b, s, dim))


def _spatial_kernel(q_ref, k_ref, v_ref, o_ref, *, n_real: int):
    """Unscaled softmax(Q K^T) V for the HWxHW spatial attention."""
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if logits.shape[-1] != n_real:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < n_real, logits, -jnp.inf)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    v = v_ref[0].astype(jnp.float32)
    out = jnp.dot(p, v, preferred_element_type=jnp.float32) / denom
    o_ref[0] = out.astype(o_ref.dtype)


def fused_spatial_attention(q, k, v, *, block_q: int = 128,
                            interpret: bool = False):
    """Spatial non-local attention: q, k [B, N, Cq], v [B, N, C] -> [B, N, C].

    out_i = sum_j softmax_j(<q_i, k_j>) v_j  (no scaling, matching the
    reference SelfAttentionBlock, enhanced_model.py:24-33).
    """
    b, n, cq = q.shape
    c = v.shape[-1]
    n_pad = _round_up(n, block_q)
    if n_pad != n:
        q = jnp.pad(q, [(0, 0), (0, n_pad - n), (0, 0)])
        k = jnp.pad(k, [(0, 0), (0, n_pad - n), (0, 0)])
        v = jnp.pad(v, [(0, 0), (0, n_pad - n), (0, 0)])

    kernel = functools.partial(_spatial_kernel, n_real=n)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, cq), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, cq), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c), v.dtype),
        interpret=interpret,
    )(q, k, v)
    return out[:, :n, :]
