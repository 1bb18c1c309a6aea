"""ViT-B/16 backbone (flax.linen, NHWC) with intermediate feature taps.

Semantics mirror torchvision's `vit_b_16` (the reference's pretraining source,
reference encoder.py:29-35) so converted IMAGENET1K_V1 weights reproduce it:

- 16x16 conv patch embed, CLS token, learned position embedding (197, 768)
- pre-LN transformer blocks: LN -> MHA -> +res -> LN -> MLP(GELU exact) -> +res
- LayerNorm eps 1e-6, attention scale 1/sqrt(head_dim)
- the reference's forward hooks on blocks [2, 5, 8, 11] (encoder.py:44-50)
  become explicitly returned intermediate activations — the JAX-idiomatic
  replacement for hooks.  Tapped values are the block outputs *before* the
  final encoder LayerNorm, exactly what a torchvision forward hook captures.

The attention can route through a fused Pallas TPU kernel
(`monodepth_tpu.ops.pallas.attention`) selected by `attn_impl`.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from monodepth_tpu.ops.attention import multi_head_attention, windowed_mha

__all__ = ["VisionTransformer"]


def _pool_kv_grid(x, grid_hw, pool: int):
    """Average-pool the grid part of a [B, 1 + H*W, D] token sequence by
    `pool` x `pool`; the CLS token passes through.  Requires H, W divisible
    by pool (native-mode grids are)."""
    b, s, d = x.shape
    nh, nw = grid_hw
    assert s == 1 + nh * nw and nh % pool == 0 and nw % pool == 0, (
        s, grid_hw, pool)
    grid = x[:, 1:].reshape(b, nh // pool, pool, nw // pool, pool, d)
    pooled = grid.mean(axis=(2, 4)).reshape(b, (nh // pool) * (nw // pool), d)
    return jnp.concatenate([x[:, :1], pooled], axis=1)


def _dense_cls(quantize: str):
    """nn.Dense or its int8-MXU drop-in (same param names/shapes)."""
    if quantize == "int8":
        from monodepth_tpu.ops.quant import QuantDense

        return QuantDense
    assert not quantize, f"unknown quantize mode {quantize!r}"
    return nn.Dense


class FusedDenseGelu(nn.Module):
    """Drop-in for Dense(name=...) -> nn.gelu via the fused Pallas kernel
    (ops/pallas/matmul.py): GELU runs in the matmul's f32 epilogue while the
    block is still in VMEM.  Param tree (kernel/bias, f32 storage) is
    identical to nn.Dense, so checkpoints and TP rules are unchanged."""

    features: int
    dtype: jnp.dtype = jnp.float32
    gelu_impl: str = "erf"

    @nn.compact
    def __call__(self, x):
        import jax

        from monodepth_tpu.ops.pallas.matmul import fused_dense_gelu

        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        return fused_dense_gelu(
            x.astype(self.dtype), kernel, bias, self.gelu_impl,
            interpret=jax.default_backend() == "cpu")


class MlpBlock(nn.Module):
    hidden_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32
    quantize: str = ""
    # 'xla' | 'xla_tanh' (plain XLA, tanh GELU approximation — the measured
    # cheap win: the exact-erf VPU pass dominates the MLP epilogue cost) |
    # 'fused' (Pallas matmul + erf GELU epilogue) | 'fused_tanh' (Pallas +
    # tanh).  Non-erf forms are quality-gated serving knobs, never silent
    # defaults.
    mlp_impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        dense = _dense_cls(self.quantize)
        if self.mlp_impl.startswith("fused") and not self.quantize:
            impl = "tanh" if self.mlp_impl == "fused_tanh" else "erf"
            x = FusedDenseGelu(self.hidden_dim, dtype=self.dtype,
                               gelu_impl=impl, name="fc1")(x)
        else:
            x = dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
            # torch.nn.GELU default is the exact erf formulation; 'xla_tanh'
            # opts into the approximate form.
            x = nn.gelu(x, approximate=(self.mlp_impl == "xla_tanh"))
        x = dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        return x


class EncoderBlock(nn.Module):
    num_heads: int
    mlp_dim: int
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    valid_len: int = None  # real tokens when the sequence is padded
    # Window-local attention (native-resolution mode): side length in
    # patches; 0 = global.  Requires grid_hw and an unpadded sequence.
    window: int = 0
    grid_hw: tuple = None
    quantize: str = ""  # '' (off) or 'int8' (quantized MXU matmuls)
    mlp_impl: str = "xla"  # see MlpBlock
    # Native-mode global blocks only: average-pool the K/V grid tokens by
    # this factor before attention (PVT-style spatial-reduction attention,
    # Wang et al. 2021).  Queries stay full resolution, so the output keeps
    # per-token detail while the S x S logits shrink by pool^2.  0/1 = off.
    global_pool: int = 0

    @nn.compact
    def __call__(self, x):
        dense = _dense_cls(self.quantize)
        # Pre-LN attention with residual.
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_1")(x)
        dim = y.shape[-1]
        qkv = dense(3 * dim, dtype=self.dtype, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if self.window:
            attn_out = windowed_mha(
                q, k, v, num_heads=self.num_heads,
                grid_hw=self.grid_hw, window=self.window,
                impl=self.attn_impl,
            )
        else:
            if self.global_pool and self.global_pool > 1 and self.grid_hw:
                k = _pool_kv_grid(k, self.grid_hw, self.global_pool)
                v = _pool_kv_grid(v, self.grid_hw, self.global_pool)
            attn_out = multi_head_attention(
                q, k, v, num_heads=self.num_heads, impl=self.attn_impl,
                valid_len=self.valid_len,
            )
        attn_out = dense(dim, dtype=self.dtype, name="out_proj")(attn_out)
        x = x + attn_out
        # Pre-LN MLP with residual.
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_2")(x)
        y = MlpBlock(self.mlp_dim, dim, dtype=self.dtype,
                     quantize=self.quantize, mlp_impl=self.mlp_impl,
                     name="mlp")(y)
        return x + y


class VisionTransformer(nn.Module):
    """ViT backbone returning tapped intermediate token sequences.

    Args to `__call__`:
      x: [B, H, W, 3] image, H == W == `image_size`.

    Returns:
      list of [B, 1 + (H/16)*(W/16), C] token tensors, one per entry of
      `tap_indices` (block outputs, pre-final-LN), in ascending block order.
    """

    image_size: int = 224
    patch_size: int = 16
    hidden_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    tap_indices: Sequence[int] = (2, 5, 8, 11)
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    # Rematerialize each transformer block on the backward pass — trades
    # ~30% extra forward FLOPs for O(1) activation memory per block, the
    # standard jax.checkpoint recipe for fitting larger fine-tuning batches
    # in HBM.
    remat: bool = False
    # Pad the token sequence to a multiple of this (e.g. 128) with masked
    # attention keys — MXU-tile-friendly shapes for the 197-token parity
    # path.  Real-token outputs are mathematically unchanged (pad keys are
    # masked; LN/MLP are per-token).  1 disables padding.
    seq_pad_multiple: int = 1
    # Native-resolution quality/perf mode: window-local attention (ViTDet
    # recipe) with this window side (in patches) in every block EXCEPT the
    # `global_attn_indices` ones (default: the tap blocks), which stay
    # global.  0 = global attention everywhere.  Ignored (global fallback)
    # when the patch grid is not divisible by the window.
    attn_window: int = 0
    global_attn_indices: Sequence[int] = None
    # Global blocks: average-pool K/V grid tokens by this factor (PVT-style
    # spatial-reduction attention) — shrinks the S x S logits pool^2-fold.
    # Only applied to unpadded grid sequences (native mode); 0 = off.
    attn_global_pool: int = 0
    # '' or 'int8': route the block matmuls (qkv/out/fc1/fc2) through the
    # int8 MXU path (2x bf16 peak on v5e) with per-channel weight and
    # per-token activation scales.  Params stay f32 — checkpoints and TP
    # rules unchanged.  Serving-only knob; accuracy bounds in test_quant.py.
    quantize: str = ""
    # 'xla' | 'fused' | 'fused_tanh': fc1 + GELU fusion (see MlpBlock).
    mlp_impl: str = "xla"

    @nn.compact
    def __call__(self, x, token_mask=None):
        """token_mask: optional [B, (H/16)*(W/16)] {0,1} mask for masked-
        image-modeling pretraining (train/pretrain.py SimMIM): masked patch
        embeddings are replaced by a learned mask token BEFORE the position
        embedding is added (Xie et al. 2022).  The `mask_token` param is
        only created when a mask is passed, so inference/fine-tune param
        trees are unchanged; the pretrainer strips it on export."""
        b, h, w, _ = x.shape
        assert h % self.patch_size == 0 and w % self.patch_size == 0, (
            f"ViT input must be /{self.patch_size}, got {h}x{w}"
        )
        n_h = h // self.patch_size
        n_w = w // self.patch_size
        # The position-embedding parameter is always the pretrained grid's
        # (14x14 + CLS for ViT-B/16 @ 224) so converted torchvision weights
        # load directly; other grids (native-resolution mode) bilinearly
        # resample it at apply time — the standard ViT pos-embed
        # interpolation recipe.
        base_grid = self.image_size // self.patch_size
        seq_len = base_grid * base_grid + 1

        # Patch embedding: 16x16 conv, stride 16 (NHWC, HWIO kernel).
        x = nn.Conv(
            self.hidden_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        x = x.reshape(b, n_h * n_w, self.hidden_dim)

        if token_mask is not None:
            mask_token = self.param(
                "mask_token",
                nn.initializers.normal(stddev=0.02),
                (1, 1, self.hidden_dim),
                jnp.float32,
            )
            m = token_mask[..., None].astype(x.dtype)
            x = x * (1.0 - m) + mask_token.astype(x.dtype) * m

        cls_token = self.param(
            "cls_token",
            nn.initializers.zeros_init(),
            (1, 1, self.hidden_dim),
            jnp.float32,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (b, 1, self.hidden_dim)).astype(x.dtype), x],
            axis=1,
        )

        pos_embedding = self.param(
            "pos_embedding",
            nn.initializers.normal(stddev=0.02),
            (1, seq_len, self.hidden_dim),
            jnp.float32,
        )
        if (n_h, n_w) != (base_grid, base_grid):
            from monodepth_tpu.ops.resize import resize_bilinear

            cls_pos = pos_embedding[:, :1, :]
            grid_pos = pos_embedding[:, 1:, :].reshape(
                1, base_grid, base_grid, self.hidden_dim
            )
            grid_pos = resize_bilinear(grid_pos, (n_h, n_w), align_corners=False)
            pos_embedding = jnp.concatenate(
                [cls_pos, grid_pos.reshape(1, n_h * n_w, self.hidden_dim)], axis=1
            )
        x = x + pos_embedding.astype(x.dtype)

        # Windowed attention needs an unpadded CLS+grid sequence and a
        # window-divisible grid; otherwise fall back to global everywhere.
        window = self.attn_window
        if window and (n_h % window or n_w % window):
            window = 0
        global_set = set(self.global_attn_indices
                         if self.global_attn_indices is not None
                         else self.tap_indices)

        seq = x.shape[1]
        valid_len = None
        # attn_global_pool (SRA) needs the unpadded CLS+grid sequence (K/V
        # pooling is over the grid tokens); padding would silently disable it
        # (ADVICE r2), so pooled global attention skips the pad like the
        # windowed path does.
        skip_pad = bool(window) or bool(self.attn_global_pool)
        if not skip_pad and self.seq_pad_multiple > 1 and seq % self.seq_pad_multiple:
            padded = ((seq + self.seq_pad_multiple - 1)
                      // self.seq_pad_multiple) * self.seq_pad_multiple
            x = jnp.pad(x, [(0, 0), (0, padded - seq), (0, 0)])
            valid_len = seq
        taps = []
        tap_set = set(self.tap_indices)
        max_tap = max(tap_set)
        block_cls = nn.remat(EncoderBlock) if self.remat else EncoderBlock
        # NOTE: a split (cls, grid) sequence representation for windowed
        # blocks (no per-layer [:, 1:] slices around the window kernel) was
        # built and A/B'd within one run on the real chip: 111.9 ms vs
        # 110.6 ms whole — reproducibly ~1% SLOWER.  XLA already elides the
        # slice/concat traffic by fusing it into the qkv split copies, and
        # the split CLS attention costs more than the saving.  Removed;
        # measurement recorded in docs/PERF_STUDY.md.
        for i in range(self.num_layers):
            x = block_cls(
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                valid_len=valid_len,
                window=0 if i in global_set else window,
                grid_hw=(n_h, n_w),
                # skip_pad above guarantees valid_len is None whenever
                # pooling is requested (SRA needs the unpadded CLS+grid
                # sequence); the guard is defensive, and seq == 1 + n_h*n_w
                # holds by construction of the CLS+grid assembly
                global_pool=(self.attn_global_pool
                             if valid_len is None else 0),
                quantize=self.quantize,
                mlp_impl=self.mlp_impl,
                name=f"block_{i}",
            )(x)
            if i in tap_set:
                taps.append(x[:, :seq, :] if valid_len is not None else x)
            if i == max_tap and len(taps) == len(tap_set):
                # Remaining blocks (and the final LN) don't feed the decoder;
                # skip them to save compute.  With taps=(2,5,8,11) nothing is
                # skipped for ViT-B/12 except the final LayerNorm, matching
                # the reference's hook semantics (hooks fire pre-encoder.ln).
                break
        return taps
