"""Multi-head attention with selectable implementation (XLA jnp or Pallas TPU).

The jnp path is the numeric reference (matches torch.nn.MultiheadAttention with
packed qkv, softmax over keys, 1/sqrt(head_dim) scaling).  The Pallas path
(`monodepth_tpu.ops.pallas.attention`) is the fused TPU kernel used on the
performance path; it is validated against the jnp path in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import nn as jnn

__all__ = ["multi_head_attention", "spatial_self_attention", "windowed_mha"]


def _mha_xla(q, k, v, num_heads: int, valid_len=None):
    b, sq, d = q.shape
    sk = k.shape[1]
    head_dim = d // num_heads

    def split(x):
        return x.reshape(b, x.shape[1], num_heads, head_dim).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, dtype=jnp.float32)).astype(q.dtype)
    # preferred_element_type only sets the ACCUMULATOR dtype; on TPU the
    # operands of an f32 matmul are still truncated to bf16 unless
    # Precision.HIGHEST is requested — required for the f32 parity path
    # (and for this function's role as the kernels' numeric reference).
    prec = jax.lax.Precision.HIGHEST if qh.dtype == jnp.float32 else None
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh * scale, kh,
                        preferred_element_type=jnp.float32, precision=prec)
    if valid_len is not None and valid_len < sk:
        # mask padded keys (sequence padded for MXU-friendly shapes)
        key_idx = jnp.arange(sk)
        logits = jnp.where(key_idx[None, None, None, :] < valid_len, logits, -jnp.inf)
    weights = jnn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, vh,
                     preferred_element_type=jnp.float32, precision=prec)
    return out.astype(q.dtype).transpose(0, 2, 1, 3).reshape(b, sq, d)


def multi_head_attention(q, k, v, *, num_heads: int, impl: str = "xla",
                         valid_len=None):
    """Scaled dot-product MHA over [B, S, D] tensors (already q/k/v projected).

    impl: 'xla' (jnp reference) or 'pallas' (fused TPU kernel).
    valid_len: number of real (unpadded) key tokens; keys beyond it are
    masked out (static int).
    """
    if impl == "pallas":
        from monodepth_tpu.ops.pallas.attention import fused_mha, fused_mha_short

        interpret = jax.default_backend() == "cpu"
        if q.shape[1] <= 1024 and q.shape[1] == k.shape[1]:
            # short equal-length sequences: whole-K/V packed-head kernel (no
            # transposes, no HBM logits) beats the K/V-blocked flash variant
            return fused_mha_short(q, k, v, num_heads=num_heads,
                                   valid_len=valid_len, interpret=interpret)
        # flash handles Sq != Sk (pooled-KV / cross-attention)
        return fused_mha(q, k, v, num_heads=num_heads, valid_len=valid_len,
                         interpret=interpret)
    return _mha_xla(q, k, v, num_heads, valid_len=valid_len)


def windowed_mha(q, k, v, *, num_heads: int, grid_hw, window: int,
                 impl: str = "xla"):
    """Window-local MHA for native-resolution ViT blocks (quality/perf mode).

    ViTDet-style (Li et al. 2022, "Exploring Plain Vision Transformer
    Backbones"): grid tokens attend only within non-overlapping
    `window` x `window` patch windows; the CLS token attends globally over
    the full sequence.  Grid tokens do not attend to CLS in windowed blocks
    (they regain global context in the global blocks at the tap indices).
    Cost is O(S * window^2) instead of O(S^2) — at 4096 tokens with
    window=16 that is a 16x attention-FLOP reduction.

    Args:
      q, k, v: [B, 1 + H*W, D] projected tokens, CLS first.
      grid_hw: (H, W) patch-grid shape; both must be divisible by `window`.
      window: window side length in patches.

    Returns [B, 1 + H*W, D].
    """
    b, s, d = q.shape
    nh, nw = grid_hw
    assert s == 1 + nh * nw, f"sequence {s} != 1 + {nh}*{nw}"
    assert nh % window == 0 and nw % window == 0, (
        f"grid {nh}x{nw} not divisible by window {window}"
    )
    gh, gw = nh // window, nw // window

    # CLS query attends over the full (CLS + grid) sequence: 1 x S, cheap.
    cls_out = _mha_xla(q[:, :1], k, v, num_heads)

    if impl == "pallas":
        from monodepth_tpu.ops.pallas.attention import fused_window_mha

        # window-direct kernel: the BlockSpec reads each window straight out
        # of the [B, nh, nw, D] token grid — no 6-D HBM transpose on either
        # side (the packed-head short kernel over to_windows() output spent
        # most of its 2.5 ms/layer on exactly that traffic)
        grid_out = fused_window_mha(q[:, 1:], k[:, 1:], v[:, 1:],
                                    num_heads=num_heads, grid_hw=grid_hw,
                                    window=window,
                                    interpret=jax.default_backend() == "cpu")
    else:
        def to_windows(x):
            xg = x[:, 1:].reshape(b, gh, window, gw, window, d)
            return (xg.transpose(0, 1, 3, 2, 4, 5)
                      .reshape(b * gh * gw, window * window, d))

        ow = _mha_xla(to_windows(q), to_windows(k), to_windows(v), num_heads)
        grid_out = (ow.reshape(b, gh, gw, window, window, d)
                      .transpose(0, 1, 3, 2, 4, 5)
                      .reshape(b, nh * nw, d))
    return jnp.concatenate([cls_out, grid_out], axis=1)


def spatial_self_attention(query, key, value, x, gamma, *, impl: str = "xla"):
    """Non-local HWxHW spatial attention (reference enhanced_model.py:11-39).

    Args:
      query: [B, H, W, Cq] 1x1-projected queries.
      key:   [B, H, W, Cq] 1x1-projected keys.
      value: [B, H, W, C]  1x1-projected values.
      x:     [B, H, W, C]  residual input.
      gamma: scalar learnable residual weight.

    Returns gamma * attn(value) + x, where attn = softmax(Q K^T) over keys.
    """
    b, h, w, cq = query.shape
    c = value.shape[-1]
    n = h * w
    q2 = query.reshape(b, n, cq)
    k2 = key.reshape(b, n, cq)
    v2 = value.reshape(b, n, c)
    if impl == "pallas":
        from monodepth_tpu.ops.pallas.attention import fused_spatial_attention

        out = fused_spatial_attention(q2, k2, v2,
                                      interpret=jax.default_backend() == "cpu")
    else:
        # energy[b, i, j] = <q_i, k_j>; softmax over j (reference :28-29).
        prec = (jax.lax.Precision.HIGHEST
                if q2.dtype == jnp.float32 else None)
        energy = jnp.einsum("bic,bjc->bij", q2, k2,
                            preferred_element_type=jnp.float32, precision=prec)
        attn = jnn.softmax(energy, axis=-1).astype(value.dtype)
        # out_i = sum_j attn[i, j] * v_j   (reference :32-33 computes
        # V @ attn^T in channel-major layout; identical contraction).
        out = jnp.einsum("bij,bjc->bic", attn, v2,
                         preferred_element_type=jnp.float32, precision=prec)
    out = out.astype(value.dtype).reshape(b, h, w, c)
    return gamma * out + x
