"""Skip-connection depth decoder (flax.linen, NHWC).

Mirrors the reference `DepthAnythingDecoder` (decoder.py:37-173):

- channel schedule num_ch_dec = [256, 128, 64, 32, 16] (decoder.py:49)
- ConvBlock = reflect-pad 3x3 conv + BatchNorm + ELU (decoder.py:22-34)
- init_conv on the coarsest encoder feature, then 4 levels of:
  upconv_i_0 -> x2 bilinear upsample (align_corners=True, decoder.py:118-120)
  -> skip concat (levels 0-2, with align_corners=True size fixup,
  decoder.py:126-151) -> upconv_i_1
- mars_adapt ConvBlock at the last level (decoder.py:159-161)
- per-scale zero-pad 3x3 dispconv + sigmoid (decoder.py:163-168)

Scale-index semantics preserved: ("disp", 0) is emitted at the *coarsest*
level (SURVEY.md §3.1 quirk).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from monodepth_tpu.ops.resize import resize_bilinear

__all__ = ["DepthAnythingDecoder", "ConvBlock", "NUM_CH_DEC"]

NUM_CH_DEC = (256, 128, 64, 32, 16)


class Conv3x3(nn.Module):
    """Reflect-pad 3x3 conv (reference decoder.py:8-19)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
        return nn.Conv(
            self.out_channels, kernel_size=(3, 3), padding="VALID",
            dtype=self.dtype, name="conv",
        )(x)


class ConvBlock(nn.Module):
    """Conv3x3 + BatchNorm + ELU (reference decoder.py:22-34)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv3x3(self.out_channels, dtype=self.dtype, name="conv3x3")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="bn",
        )(x)
        return nn.elu(x)


class DepthAnythingDecoder(nn.Module):
    """Multi-scale disparity decoder.

    `__call__(features, train)` takes the encoder's 4 NHWC feature maps and
    returns {("disp", s): [B, h_s, w_s, 1]} with sigmoid disparities.
    """

    num_ch_enc: Sequence[int] = (256, 256, 256, 256)
    scales: Sequence[int] = (0, 1, 2, 3)
    num_output_channels: int = 1
    use_skips: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_features, train: bool = False):
        outputs = {}
        num_ch_dec = NUM_CH_DEC
        n_enc = len(self.num_ch_enc)

        x = input_features[-1]
        x = ConvBlock(num_ch_dec[0], dtype=self.dtype, name="init_conv")(x, train)

        for i in range(4):
            x = ConvBlock(num_ch_dec[i + 1], dtype=self.dtype, name=f"upconv_{i}_0")(
                x, train
            )
            h, w = x.shape[1], x.shape[2]
            x = resize_bilinear(x, (h * 2, w * 2), align_corners=True)

            if self.use_skips and i < n_enc - 1:
                skip_idx = min(i + 2, len(input_features))
                skip_feats = input_features[-skip_idx]
                skip = ConvBlock(
                    num_ch_dec[i + 1], dtype=self.dtype, name=f"skip_{i}"
                )(skip_feats, train)
                if skip.shape[1:3] != x.shape[1:3]:
                    skip = resize_bilinear(skip, x.shape[1:3], align_corners=True)
                x = jnp.concatenate([x, skip], axis=-1)

            x = ConvBlock(num_ch_dec[i + 1], dtype=self.dtype, name=f"upconv_{i}_1")(
                x, train
            )

            if i == 3:
                x = ConvBlock(num_ch_dec[-1], dtype=self.dtype, name="mars_adapt")(
                    x, train
                )

            if i in self.scales and i < len(num_ch_dec) - 1:
                disp = nn.Conv(
                    self.num_output_channels, kernel_size=(3, 3), padding=1,
                    dtype=self.dtype, name=f"dispconv_{i}",
                )(x)
                outputs[("disp", i)] = nn.sigmoid(disp)

            if self.scales and i >= max(self.scales):
                # Levels beyond the last requested scale feed no output —
                # the reference decoder runs them unconditionally
                # (decoder.py:106-171), but they only produce deeper-scale
                # disparities.  Skipping them is output-identical and saves
                # the largest convs (each level doubles spatial resolution):
                # with output_scales=(0,) at 1024px native this drops the
                # 256/512/1024-px ConvBlocks entirely.  Full reference
                # checkpoints still load: flax ignores the unused params.
                break

        return outputs
