"""Depth-Anything-style ViT feature encoder (flax.linen, NHWC).

Mirrors the reference `DepthAnythingEncoder` (encoder.py:16-187):

- BatchNorm over the 3 input channels (encoder.py:58, 129)
- range normalization to [-1, 1] with the reference's data-dependent rules
  (encoder.py:131-135), implemented with traced scalar conditions
- bilinear resize to 224x224 before the ViT (encoder.py:140-144) in parity
  mode; `native_patching=True` runs the ViT at native resolution with
  interpolated position embeddings (the TPU performance path, SURVEY.md §3.6)
- taps at transformer blocks [2, 5, 8, 11] (encoder.py:44-50)
- token->grid reshape reproducing the reference's 14x15 CLS+zero-pad quirk
  exactly (encoder.py:69-110; SURVEY.md §3.6): for any input whose
  (H/16, W/16) grid doesn't match the 197-token sequence, the CLS token is
  kept as grid cell (0,0) and the sequence is zero-padded to 14x15
- per-tap 1x1 channel reduction 768->256 + instance norm (encoder.py:156-174)

num_ch_enc = [256, 256, 256, 256] (encoder.py:26).
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from monodepth_tpu.models.vit import VisionTransformer
from monodepth_tpu.ops.resize import resize_bilinear

__all__ = ["DepthAnythingEncoder", "NUM_CH_ENC", "VIT_VARIANTS"]

NUM_CH_ENC = (256, 256, 256, 256)

# ViT backbone size variants (torchvision vit_{s,b,l}_16 dims; patch 16,
# 224 parity input -> 197 tokens for all of them).  The reference hard-codes
# vit_b_16 (encoder.py:29-35); 'base' is the parity default.  Taps stay the
# reference's evenly-spaced quarter points (blocks [L/4*k - 1 + offset]):
# [2, 5, 8, 11] for 12 layers, [5, 11, 17, 23] for 24.  The channel_reduce
# convs map any hidden width to the decoder's fixed 256, so the decoder and
# every downstream head are variant-independent.
VIT_VARIANTS = {
    "small": dict(hidden_dim=384, num_layers=12, num_heads=6,
                  mlp_dim=1536, tap_indices=(2, 5, 8, 11)),
    "base": dict(hidden_dim=768, num_layers=12, num_heads=12,
                 mlp_dim=3072, tap_indices=(2, 5, 8, 11)),
    "large": dict(hidden_dim=1024, num_layers=24, num_heads=16,
                  mlp_dim=4096, tap_indices=(5, 11, 17, 23)),
}


def _instance_norm(x, eps: float = 1e-5):
    """F.instance_norm equivalent: per-sample per-channel over H, W; no affine.

    Statistics in float32 for bf16 safety.
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    return ((x32 - mean) / jnp.sqrt(var + eps)).astype(x.dtype)


def _range_normalize(x):
    """Reference encoder.py:131-135: conditional /255 then [0,1] -> [-1,1].

    The conditions are data-dependent scalars; under jit they become traced
    selects over the whole array (cheap, fused by XLA).
    """
    xmax = jnp.max(x)
    x = jnp.where(xmax > 1.0, x / 255.0, x)
    xmin2 = jnp.min(x)
    xmax2 = jnp.max(x)
    in_unit = jnp.logical_and(xmin2 >= 0.0, xmax2 <= 1.0)
    return jnp.where(in_unit, 2.0 * x - 1.0, x)


def token_grid_shape(tokens: int, feature_h: int, feature_w: int):
    """Static computation of the reference's token->grid shape logic.

    Returns (grid_h, grid_w, strip_cls, pad_tokens).  Reproduces
    encoder.py:69-110: strip CLS only when tokens == h*w + 1, otherwise keep
    CLS in the grid and zero-pad to the derived (new_h, new_w).
    """
    if tokens == feature_h * feature_w + 1:
        return feature_h, feature_w, True, 0
    if tokens == feature_h * feature_w:
        return feature_h, feature_w, False, 0
    new_h = int(math.isqrt(tokens))
    new_w = tokens // new_h
    if new_h * new_w < tokens:
        new_w += 1
    pad = new_h * new_w - tokens
    return new_h, new_w, False, pad


class DepthAnythingEncoder(nn.Module):
    """ViT feature encoder producing 4 NHWC feature maps of 256 channels."""

    # None = the variant's default taps (VIT_VARIANTS); a tuple overrides.
    tap_indices: Sequence[int] = None
    vit_variant: str = "base"
    vit_image_size: int = 224
    native_patching: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    remat: bool = False
    seq_pad_multiple: int = 1
    # Native mode only: window-local attention side (patches) in non-tap
    # blocks (ViTDet recipe); 0 = global everywhere.
    attn_window: int = 0
    # Native mode: pool global-block K/V by this factor (SRA); 0 = off.
    attn_global_pool: int = 0
    # '' or 'int8': quantized MXU matmuls in the ViT blocks (serving knob).
    quantize: str = ""
    # 'xla' | 'fused' | 'fused_tanh': fc1 + GELU fusion (models/vit.py
    # MlpBlock; measured lever for the native mode, docs/PERF_STUDY.md §00).
    mlp_impl: str = "xla"

    @property
    def num_ch_enc(self):
        return NUM_CH_ENC

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, _ = x.shape

        # Input BatchNorm over 3 channels (reference encoder.py:58, 129).
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            name="normalize",
        )(x)
        x = _range_normalize(x).astype(self.dtype)

        spec = VIT_VARIANTS[self.vit_variant]
        taps_idx = (tuple(self.tap_indices) if self.tap_indices is not None
                    else tuple(spec["tap_indices"]))
        vit = VisionTransformer(
            image_size=self.vit_image_size,
            hidden_dim=spec["hidden_dim"],
            num_layers=spec["num_layers"],
            num_heads=spec["num_heads"],
            mlp_dim=spec["mlp_dim"],
            tap_indices=taps_idx,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            remat=self.remat,
            seq_pad_multiple=self.seq_pad_multiple,
            attn_window=self.attn_window if self.native_patching else 0,
            attn_global_pool=(self.attn_global_pool
                              if self.native_patching else 0),
            quantize=self.quantize,
            mlp_impl=self.mlp_impl,
            name="vit",
        )

        if self.native_patching:
            # Performance mode: run the ViT at native (padded) resolution —
            # the position embedding is resampled inside VisionTransformer —
            # producing clean CLS-stripped (H/16, W/16) grids.  At 1024px
            # this is 4096 tokens; use attn_impl='pallas' for the fused
            # blockwise attention.  Not the parity path (SURVEY.md §3.6).
            taps = vit(x)
            grid_h, grid_w = h // 16, w // 16
            strip_cls, pad = True, 0
        else:
            if (h, w) != (self.vit_image_size, self.vit_image_size):
                x_vit = resize_bilinear(
                    x, (self.vit_image_size, self.vit_image_size), align_corners=False
                )
            else:
                x_vit = x
            taps = vit(x_vit)
            tokens = taps[0].shape[1]
            # Reference grid expectation comes from the *original* (padded)
            # input size, not the 224 resize (encoder.py:151-153).
            grid_h, grid_w, strip_cls, pad = token_grid_shape(tokens, h // 16, w // 16)

        features = []
        for i, tok in enumerate(taps):
            if strip_cls:
                tok = tok[:, 1:, :]
            if pad:
                tok = jnp.concatenate(
                    [tok, jnp.zeros((b, pad, tok.shape[-1]), tok.dtype)], axis=1
                )
            grid = tok.reshape(b, grid_h, grid_w, tok.shape[-1])
            reduced = nn.Conv(
                NUM_CH_ENC[i],
                kernel_size=(1, 1),
                dtype=self.dtype,
                name=f"channel_reduce_{i}",
            )(grid)
            features.append(_instance_norm(reduced))
        return features


