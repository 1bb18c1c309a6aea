"""Pose network for sequence self-supervised training (flax.linen, NHWC).

The reference ships the full monodepth2 pose machinery —
`transformation_from_parameters` / `rot_from_axisangle` /
`get_translation_matrix` (reference layers.py:28-103) and the
`BackprojectDepth` / `Project3D` reprojection pair (layers.py:139-193) —
but never a network that *produces* poses, so its self-supervised loss
degenerates to a jittered-L1 placeholder (mars_adapter.py:237-242).  This
module supplies the missing piece: a small conv net that regresses the
relative camera motion between two frames, enabling the standard
monodepth2 objective (depth + pose -> reprojection -> photometric error)
on real image sequences (`TrainConfig.loss_mode='sequence'`).

TPU-first design notes:
- One fused 6-channel input (target | source frames stacked on channels),
  exactly the monodepth2 pose-encoder trick — one conv tower instead of a
  siamese pair, and the first conv's 7x7xC6 kernel still lands on the MXU.
- GroupNorm instead of BatchNorm: no mutable batch_stats collection to
  thread through jit, no cross-batch state, and pose regression is
  batch-size-independent (important when ragged mesh batches trim rows).
- Strided convs only (no pooling ops), static shapes throughout; the
  6-vector head is a 1x1 conv + global mean, all XLA-fusable.
- Outputs are scaled by 0.01 (the monodepth2 convention) so the randomly
  initialized net starts near the identity transform — large random poses
  would put every reprojection off-image and kill the photometric
  gradient.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["PoseNet"]


class PoseNet(nn.Module):
    """[B, H, W, 6] frame pair -> (axisangle [B, 1, 3], translation [B, 1, 3]).

    The outputs plug directly into `layers.transformation_from_parameters`
    (reference layers.py:28-45) to form the target->source SE(3) transform
    used by the reprojection warp.
    """

    widths: Tuple[int, ...] = (16, 32, 64, 128, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pair: jnp.ndarray):
        assert pair.ndim == 4 and pair.shape[-1] == 6, (
            f"PoseNet expects [B, H, W, 6] stacked frame pairs, got {pair.shape}")
        x = pair.astype(self.dtype)
        for i, width in enumerate(self.widths):
            x = nn.Conv(width, kernel_size=(7, 7) if i == 0 else (3, 3),
                        strides=(2, 2), dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=min(8, width), dtype=jnp.float32,
                             name=f"gn{i}")(x)
            x = nn.relu(x)
        x = nn.Conv(self.widths[-1], kernel_size=(1, 1), dtype=self.dtype,
                    name="squeeze")(x)
        x = nn.relu(x)
        x = nn.Conv(6, kernel_size=(1, 1), dtype=self.dtype, name="pose")(x)
        # Global mean over the spatial map, then the 0.01 near-identity
        # scaling (monodepth2 PoseDecoder convention).
        out = 0.01 * jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # [B, 6]
        axisangle = out[:, None, :3]
        translation = out[:, None, 3:]
        return axisangle, translation
