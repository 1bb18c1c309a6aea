"""Training losses (capability of reference train/mars_adapter.py:209-247).

- edge-aware disparity smoothness (weight 0.001) via `layers.get_smooth_loss`
- the reference's self-supervised placeholder "depth" loss (weight 1.0):
  L1 between disp and a detached, multiplicatively jittered copy
  (target = stop_gradient(disp) * (0.9 + 0.2 * U[0,1])), reproduced
  faithfully — it is the documented supervision contract pending real GT.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from monodepth_tpu.layers import disp_to_depth, get_smooth_loss

__all__ = ["compute_losses"]


def compute_losses(
    images: jnp.ndarray,
    outputs: Dict,
    rng: jax.Array,
    depth_weight: float = 1.0,
    smoothness_weight: float = 0.001,
    min_depth: float = 0.1,
    max_depth: float = 100.0,
) -> Dict[str, jnp.ndarray]:
    """images [B, H, W, 3], outputs from the model -> {'total', 'depth', 'smoothness'}."""
    disp = outputs[("disp", 0)]
    # depth is computed for parity with the reference's flow (:226); only the
    # disparity enters the losses below.
    _, _depth = disp_to_depth(disp, min_depth, max_depth)

    smoothness = get_smooth_loss(disp, images)

    jitter = 0.9 + 0.2 * jax.random.uniform(rng, disp.shape, disp.dtype)
    target_disp = jax.lax.stop_gradient(disp) * jitter
    depth_loss = jnp.mean(jnp.abs(disp - target_disp))

    losses = {
        "smoothness": smoothness_weight * smoothness,
        "depth": depth_weight * depth_loss,
    }
    losses["total"] = losses["depth"] + losses["smoothness"]
    return losses


def flip_consistency_loss(disp: jnp.ndarray, disp_flipped: jnp.ndarray):
    """Left-right flip consistency: the disparity of a mirrored image should
    be the mirror of the disparity (a real self-supervision signal, unlike
    the reference's jittered-L1 placeholder — see docs/ROADMAP.md).

    Args:
      disp:         [B, H, W, 1] disparity of the original images.
      disp_flipped: [B, H, W, 1] disparity of the horizontally flipped images.
    """
    return jnp.mean(jnp.abs(disp - disp_flipped[:, :, ::-1, :]))


def compute_losses_flip(
    images: jnp.ndarray,
    disp: jnp.ndarray,
    disp_flipped: jnp.ndarray,
    depth_weight: float = 1.0,
    smoothness_weight: float = 0.001,
):
    """Flip-consistency training objective (TrainConfig.loss_mode='flip').

    total = depth_weight * flip_consistency + smoothness_weight * smoothness.
    """
    losses = {
        "smoothness": smoothness_weight * get_smooth_loss(disp, images),
        "depth": depth_weight * flip_consistency_loss(disp, disp_flipped),
    }
    losses["total"] = losses["depth"] + losses["smoothness"]
    return losses
