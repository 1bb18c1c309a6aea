"""Enhanced DepthAnything: self-attention + uncertainty + refinement + fusion.

Mirrors the reference `models/enhanced_model.py`:

- `SelfAttentionBlock` (:11-39): 1x1 q/k (C/8) and v (C) projections, HWxHW
  softmax attention, learnable gamma residual (init 0).  The attention
  contraction routes through `ops.attention.spatial_self_attention`
  (XLA or fused Pallas).
- `UncertaintyModule` (:41-54): two 3x3 convs + ELU then 1x1 conv + sigmoid.
- `MultiScaleFeatureFusion` (:56-82): learnable softmax scale weights,
  resize-to-target (align_corners=False) + weighted sum.  Note the target
  is scale 0 — the *coarsest* disparity (SURVEY.md §3.2).
- `TextureAwareRefinement` (:84-113): concat depth-features + RGB, 3 convs,
  residual disparity refinement.
- `EnhancedDepthAnything` (:115-279) with the exact operation ordering:
  attention(feat 1,2) -> decode -> uncertainty(feat 0) -> refine disp0
  (saving ("disp_unrefined", 0)) -> metadata scaling of ("disp", s) only ->
  fuse disp 0-2 into ("disp_fused", 0) which overwrites ("disp", 0) ->
  resize ALL outputs -> disp_to_depth(0.1, 100) per ("disp", s) key.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from monodepth_tpu.layers import disp_to_depth
from monodepth_tpu.models.decoder import DepthAnythingDecoder
from monodepth_tpu.models.encoder import NUM_CH_ENC, DepthAnythingEncoder
from monodepth_tpu.models.model import (_broadcast_scale,
                                         pad_to_multiple_of_16,
                                         resize_for_native_grid)
from monodepth_tpu.ops.attention import spatial_self_attention
from monodepth_tpu.ops.resize import resize_bilinear

__all__ = [
    "SelfAttentionBlock",
    "UncertaintyModule",
    "MultiScaleFeatureFusion",
    "TextureAwareRefinement",
    "EnhancedDepthAnything",
    "MIN_DEPTH",
    "MAX_DEPTH",
]

# disp_to_depth range used by the enhanced model (reference enhanced_model.py:276).
MIN_DEPTH = 0.1
MAX_DEPTH = 100.0


class SelfAttentionBlock(nn.Module):
    """Non-local spatial self-attention with learnable residual gate."""

    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        cq = c // 8
        q = nn.Conv(cq, kernel_size=(1, 1), dtype=self.dtype, name="query")(x)
        k = nn.Conv(cq, kernel_size=(1, 1), dtype=self.dtype, name="key")(x)
        v = nn.Conv(c, kernel_size=(1, 1), dtype=self.dtype, name="value")(x)
        gamma = self.param("gamma", nn.initializers.zeros_init(), (1,), jnp.float32)
        return spatial_self_attention(
            q, k, v, x, gamma.astype(x.dtype), impl=self.attn_impl
        )


class UncertaintyModule(nn.Module):
    """Per-pixel uncertainty in [0, 1] from encoder features."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = nn.elu(nn.Conv(c // 2, (3, 3), padding=1, dtype=self.dtype, name="conv1")(x))
        x = nn.elu(nn.Conv(c // 2, (3, 3), padding=1, dtype=self.dtype, name="conv2")(x))
        return nn.sigmoid(nn.Conv(1, (1, 1), dtype=self.dtype, name="conv3")(x))


class MultiScaleFeatureFusion(nn.Module):
    """Learnable softmax-weighted fusion of multi-scale disparity maps."""

    scales: Sequence[int] = (0, 1, 2)

    @nn.compact
    def __call__(self, features_dict):
        weights = self.param(
            "weights",
            lambda key, shape: jnp.full(shape, 1.0 / len(self.scales)),
            (len(self.scales),),
        )
        softmax_w = nn.softmax(weights, axis=0)
        target_scale = min(self.scales)
        target_size = features_dict[target_scale].shape[1:3]

        fused = None
        for i, scale in enumerate(self.scales):
            if scale not in features_dict:
                continue
            feat = features_dict[scale]
            if feat.shape[1:3] != target_size:
                feat = resize_bilinear(feat, target_size, align_corners=False)
            term = softmax_w[i].astype(feat.dtype) * feat
            fused = term if fused is None else fused + term
        return fused


class TextureAwareRefinement(nn.Module):
    """Residual disparity refinement from depth features + RGB texture."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, depth_features, rgb_image):
        c = depth_features.shape[-1]
        if rgb_image.shape[1:3] != depth_features.shape[1:3]:
            rgb_image = resize_bilinear(
                rgb_image, depth_features.shape[1:3], align_corners=False
            )
        x = jnp.concatenate([depth_features, rgb_image.astype(depth_features.dtype)], axis=-1)
        x = nn.elu(nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name="conv1")(x))
        x = nn.elu(nn.Conv(c // 2, (3, 3), padding=1, dtype=self.dtype, name="conv2")(x))
        return nn.Conv(1, (1, 1), dtype=self.dtype, name="conv3")(x)


class EnhancedDepthAnything(nn.Module):
    """Enhanced model: returns disp/uncertainty/fused/unrefined/depth outputs.

    Output keys (all [B, H, W, 1], resized to the input size):
      ("disp", 0..3)        — ("disp", 0) is the fused map
      ("disp_unrefined", 0) — pre-refinement disparity
      ("disp_fused", 0)     — fusion result (same tensor as ("disp", 0))
      ("uncertainty", 0)    — sigmoid uncertainty
      ("depth", 0..3)       — disp_to_depth(0.1, 100) of ("disp", s)
    """

    scales: Sequence[int] = (0, 1, 2, 3)
    native_patching: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    remat: bool = False
    seq_pad_multiple: int = 1
    # Native mode: ViTDet-style window-local attention (0 = global).
    attn_window: int = 0
    # Native mode: pool global-block K/V by this factor (SRA); 0 = off.
    attn_global_pool: int = 0
    # '' or 'int8': quantized MXU matmuls in the ViT blocks (serving knob).
    quantize: str = ""
    # 'xla' | 'fused' | 'fused_tanh': fc1 + GELU fusion (models/vit.py).
    mlp_impl: str = "xla"
    # ViT backbone size: 'small' | 'base' (reference parity) | 'large'.
    vit_variant: str = "base"
    # Perf knob: serve only ("disp", 0) / ("uncertainty", 0) / ("depth", 0)
    # — skips eight full-resolution output resizes the CLI never reads.
    # False preserves the reference's full 11-key output contract.
    light_outputs: bool = False
    # Serving knob: skip the final resize-to-input-size and the ("depth", s)
    # keys (the reference computes depth from the RESIZED disparity,
    # enhanced_model.py:265-277, so depth must be derived after the caller's
    # host-side upsample).  Returns decoder-resolution maps; see
    # models/model.py `resize_outputs` for why.
    resize_outputs: bool = True

    @nn.compact
    def __call__(self, x, disp_scale=None, train: bool = False):
        original_size = x.shape[1:3]
        if self.native_patching and self.attn_window:
            x = resize_for_native_grid(x, self.attn_window)
        else:
            x = pad_to_multiple_of_16(x)

        encoder_features = DepthAnythingEncoder(
            native_patching=self.native_patching,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            remat=self.remat,
            seq_pad_multiple=self.seq_pad_multiple,
            attn_window=self.attn_window,
            attn_global_pool=self.attn_global_pool,
            quantize=self.quantize,
            mlp_impl=self.mlp_impl,
            vit_variant=self.vit_variant,
            name="encoder",
        )(x, train=train)

        # Self-attention on mid/high-level features (reference :135-138, 183-186).
        enhanced = list(encoder_features)
        for i in (1, 2):
            enhanced[i] = SelfAttentionBlock(
                dtype=self.dtype, attn_impl=self.attn_impl, name=f"attention_{i}"
            )(encoder_features[i])

        outputs = dict(
            DepthAnythingDecoder(
                num_ch_enc=NUM_CH_ENC,
                scales=tuple(self.scales),
                dtype=self.dtype,
                name="decoder",
            )(enhanced, train=train)
        )

        # Uncertainty from the raw (non-attended) first feature map (:191-193).
        outputs[("uncertainty", 0)] = UncertaintyModule(
            dtype=self.dtype, name="uncertainty_module"
        )(encoder_features[0])

        # Texture-aware refinement of the scale-0 disparity (:196-215).
        refinement = TextureAwareRefinement(dtype=self.dtype, name="refinement")(
            encoder_features[0], x
        )
        if ("disp", 0) in outputs:
            disp0 = outputs[("disp", 0)]
            if refinement.shape[1:3] != disp0.shape[1:3]:
                refinement = resize_bilinear(
                    refinement, disp0.shape[1:3], align_corners=False
                )
            outputs[("disp_unrefined", 0)] = disp0
            outputs[("disp", 0)] = disp0 + refinement

        # Metadata scaling of ("disp", s) keys only (:217-247).
        scale = _broadcast_scale(disp_scale, x.shape[0], x.dtype)
        if scale is not None:
            for key in list(outputs.keys()):
                if key[0] == "disp":
                    outputs[key] = outputs[key] * scale

        # Multi-scale fusion -> ("disp_fused", 0), overwriting ("disp", 0) (:250-263).
        if all(("disp", s) in outputs for s in (0, 1, 2)):
            disp_features = {s: outputs[("disp", s)] for s in range(3)}
            fused = MultiScaleFeatureFusion(scales=(0, 1, 2), name="feature_fusion")(
                disp_features
            )
            outputs[("disp_fused", 0)] = fused
            outputs[("disp", 0)] = fused

        if self.light_outputs:
            outputs = {k: v for k, v in outputs.items()
                       if k in (("disp", 0), ("uncertainty", 0))}

        if not self.resize_outputs:
            return outputs

        # Resize ALL outputs to the original size (:265-271).
        for key in list(outputs.keys()):
            if outputs[key].shape[1:3] != original_size:
                outputs[key] = resize_bilinear(
                    outputs[key], original_size, align_corners=False
                )

        # Disparity -> depth for ("disp", s) keys (:273-277).
        for key in list(outputs.keys()):
            if key[0] == "disp":
                _, depth = disp_to_depth(outputs[key], MIN_DEPTH, MAX_DEPTH)
                outputs[("depth", key[1])] = depth

        return outputs
