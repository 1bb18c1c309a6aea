"""Standard DepthAnything assembly (flax.linen, NHWC).

Mirrors the reference `DepthAnything` (model.py:12-102):

- pad input to a multiple of 16 via bilinear resize (model.py:51-54)
- encoder -> decoder (model.py:57-60)
- source-specific disparity scaling (model.py:63-92) — the metadata->scale
  rule is host-side (`disp_scale_factor`); the scale enters the jitted
  forward as a traced scalar or per-sample [B] vector
- resize all ("disp", s) outputs to the original input size, bilinear
  align_corners=False (model.py:95-100)
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from monodepth_tpu.models.decoder import DepthAnythingDecoder
from monodepth_tpu.models.encoder import NUM_CH_ENC, DepthAnythingEncoder
from monodepth_tpu.ops.resize import resize_bilinear

__all__ = ["DepthAnything", "disp_scale_factor", "pad_to_multiple_of_16",
           "resize_for_native_grid"]


def disp_scale_factor(metadata: Optional[Mapping]) -> float:
    """Source-specific disparity scale (reference model.py:63-92).

    rover: 2.0 / max(height, 0.1) if height given else 1.0
    ingenuity: 10.0 / max(altitude, 1.0) if altitude given else 0.5
    satellite: 0.01; anything else: 1.0.
    """
    if metadata is None or "source" not in metadata:
        return 1.0
    source = metadata["source"]
    if source == "rover":
        if "height" in metadata:
            return 2.0 / max(metadata["height"], 0.1)
        return 1.0
    if source == "ingenuity":
        if "altitude" in metadata:
            return 10.0 / max(metadata["altitude"], 1.0)
        return 0.5
    if source == "satellite":
        return 0.01
    return 1.0


def pad_to_multiple_of_16(x):
    """Reference model.py:51-54: bilinear-resize up to the next /16 size.

    Note the reference's `(dim // 16 + 1) * 16` rounds *up past* exact
    multiples only when not already a multiple (guarded by the modulo check).
    """
    h, w = x.shape[1], x.shape[2]
    if h % 16 != 0 or w % 16 != 0:
        new_h = (h // 16 + 1) * 16
        new_w = (w // 16 + 1) * 16
        x = resize_bilinear(x, (new_h, new_w), align_corners=False)
    return x


def resize_for_native_grid(x, window: int):
    """Native+windowed mode: bilinear-resize to the nearest size whose
    patch grid is divisible by `window` (granularity 16*window px, min one
    window).  Without this, any non-divisible input silently fell back to
    global attention (~2x slower at 1024px); resizing — the reference's own
    /16 mechanism, just coarser — keeps the ViTDet window path engaged for
    arbitrary aspect ratios at a bounded (<=window/2 patches) scale change.
    """
    h, w = x.shape[1], x.shape[2]
    gran = 16 * window

    def snap(d):
        return max(gran, int(round(d / gran)) * gran)

    new_h, new_w = snap(h), snap(w)
    if (new_h, new_w) != (h, w):
        x = resize_bilinear(x, (new_h, new_w), align_corners=False)
    return x


def _broadcast_scale(disp_scale, batch: int, dtype):
    if disp_scale is None:
        return None
    scale = jnp.asarray(disp_scale, dtype=dtype)
    if scale.ndim == 0:
        return scale
    return scale.reshape(batch, 1, 1, 1)


class DepthAnything(nn.Module):
    """Standard Mars depth model.

    `__call__(x, disp_scale=None, train=False)`:
      x: [B, H, W, 3] image in [0, 1] (or [0, 255]; the encoder's range
         normalization handles both, reference encoder.py:131-135).
      disp_scale: scalar or [B] per-sample disparity scale from
         `disp_scale_factor` (None = no scaling, matching metadata=None).

    Returns {("disp", s): [B, H, W, 1]} for s in scales.
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
    # ViT backbone size: 'small' | 'base' (reference parity) | 'large'
    # (models/encoder.py VIT_VARIANTS).
    vit_variant: str = "base"
    # Perf knob: when set, only these ("disp", s) keys are resized to input
    # size and returned (the CLI consumes only scale 0; skipping the other
    # three full-resolution resizes saves most of the output bandwidth).
    # None preserves the reference's full output contract.
    output_scales: Optional[Sequence[int]] = None
    # Serving knob: skip the final resize-to-input-size entirely and return
    # the decoder-resolution disparity maps (e.g. 28x30 for a 448x480
    # input).  The caller upsamples on HOST (ops/resize.py numpy twin) —
    # shipping the coarse map instead of the full-resolution one cuts
    # device->host bytes ~300x, which is the serving bottleneck through a
    # tunneled runtime (see inference.MarsDepthEstimator host_upsample).
    resize_outputs: bool = True

    @nn.compact
    def __call__(self, x, disp_scale=None, train: bool = False):
        original_size = x.shape[1:3]
        if self.native_patching and self.attn_window:
            x = resize_for_native_grid(x, self.attn_window)
        else:
            x = pad_to_multiple_of_16(x)

        features = DepthAnythingEncoder(
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

        # restrict the DECODER's scales too — the decoder early-breaks past
        # the last requested scale (decoder.py:118-127), so output_scales=(0,)
        # actually drops the three finest decoder levels instead of just
        # skipping their output resizes
        dec_scales = tuple(
            s for s in self.scales
            if self.output_scales is None or s in self.output_scales
        ) or tuple(self.scales)
        outputs = DepthAnythingDecoder(
            num_ch_enc=NUM_CH_ENC,
            scales=dec_scales,
            dtype=self.dtype,
            name="decoder",
        )(features, train=train)

        scale = _broadcast_scale(disp_scale, x.shape[0], x.dtype)
        if scale is not None:
            outputs = {k: v * scale for k, v in outputs.items()}

        resized = {}
        for key, v in outputs.items():
            if self.output_scales is not None and key[1] not in self.output_scales:
                continue
            if (self.resize_outputs and key[0] == "disp"
                    and v.shape[1:3] != original_size):
                v = resize_bilinear(v, original_size, align_corners=False)
            resized[key] = v
        return resized
