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

from monodepth_tpu.layers import (
    backproject_depth,
    bilinear_sample,
    default_intrinsics,
    disp_to_depth,
    get_smooth_loss,
    project_3d,
    ssim,
    transformation_from_parameters,
)

__all__ = ["compute_losses", "compute_losses_flip", "compute_losses_photometric",
           "compute_losses_sequence", "compute_losses_supervised",
           "photometric_error", "synthetic_pair"]


def compute_losses(
    images: jnp.ndarray,
    outputs: Dict,
    rng: jax.Array,
    depth_weight: float = 1.0,
    smoothness_weight: float = 0.001,
    min_depth: float = 0.1,
    max_depth: float = 100.0,
    scale: int = 0,
) -> Dict[str, jnp.ndarray]:
    """images [B, H, W, 3], outputs from the model -> {'total', 'depth', 'smoothness'}."""
    disp = outputs[("disp", scale)]
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


def photometric_error(pred: jnp.ndarray, target: jnp.ndarray,
                      alpha: float = 0.85) -> jnp.ndarray:
    """monodepth2 photometric error: alpha*SSIM + (1-alpha)*L1, per pixel.

    The reference ships the SSIM module (layers.py:218-248) as declared
    intent but never wires it into a loss; this is the wiring.
    """
    l1 = jnp.mean(jnp.abs(pred - target), axis=-1, keepdims=True)
    return alpha * jnp.mean(ssim(pred, target), axis=-1, keepdims=True) + (1 - alpha) * l1


def _sample_pose(rng, batch: int, max_rot: float, max_trans: float, dtype):
    """Small random camera motion: axis-angle + translation -> (T, T_inv),
    both [B, 4, 4].  z-translation is zeroed so a fronto-parallel plane has
    the same depth in both frames (synthetic_pair exactness)."""
    r_rng, t_rng = jax.random.split(rng)
    axisangle = jax.random.uniform(
        r_rng, (batch, 1, 3), dtype, minval=-max_rot, maxval=max_rot)
    translation = jax.random.uniform(
        t_rng, (batch, 1, 3), dtype, minval=-max_trans, maxval=max_trans)
    translation = translation.at[..., 2].set(0.0)
    T = transformation_from_parameters(axisangle, translation)
    T_inv = transformation_from_parameters(axisangle, translation, invert=True)
    return T, T_inv


def synthetic_pair(images: jnp.ndarray, T_inv: jnp.ndarray, plane_depth: float):
    """Render a synthetic 'source view' of each target image: assume a
    fronto-parallel plane at `plane_depth`, backproject each *source* pixel
    at that depth, map it into the target frame with T_inv (the inverse of
    the target->source pose), and sample the target image there.

    Absent real stereo/sequence pairs (the Mars corpus is unordered single
    frames), this manufactures a geometrically consistent second view: the
    reprojection warp in `compute_losses_photometric` (which uses the
    forward pose T) reconstructs the target image exactly when the
    predicted depth matches the generating plane, so the objective has a
    well-defined optimum and real parallax gradients.  With real pairs the
    same code path (backproject -> transform -> project -> sample) trains
    metric depth; reference layers.py:139-248 intent.
    """
    b, h, w, _ = images.shape
    K, inv_K = default_intrinsics(b, h, w, images.dtype)
    depth = jnp.full((b, h, w), plane_depth, images.dtype)
    pix = project_3d(backproject_depth(depth, inv_K), K, T_inv, h, w)
    return bilinear_sample(images, pix)


def compute_losses_photometric(
    images: jnp.ndarray,
    disp: jnp.ndarray,
    rng: jax.Array,
    depth_weight: float = 1.0,
    smoothness_weight: float = 0.001,
    min_depth: float = 0.1,
    max_depth: float = 100.0,
    plane_depth: float = 1.0,
    max_rot: float = 0.005,
    max_trans: float = 0.02,
) -> Dict[str, jnp.ndarray]:
    """SSIM+L1 photometric reprojection objective
    (TrainConfig.loss_mode='photometric'; VERDICT r1 item 5).

    Per batch: sample a small random camera motion T, render the synthetic
    source view I_src of each image at a reference plane (see
    `synthetic_pair`), then warp I_src back through the *predicted* depth
    and the same T and penalize SSIM+L1 against the original image — the
    standard monodepth2 reprojection loss over
    backproject_depth/project_3d/bilinear_sample, plus edge-aware
    smoothness.
    """
    b, h, w, _ = images.shape
    T, T_inv = _sample_pose(rng, b, max_rot, max_trans, images.dtype)
    src = jax.lax.stop_gradient(synthetic_pair(images, T_inv, plane_depth))

    _, depth = disp_to_depth(disp, min_depth, max_depth)
    K, inv_K = default_intrinsics(b, h, w, images.dtype)
    # Warp the source view back into the target frame via predicted depth:
    # target pixel -> 3-D (pred depth) -> source pixel (pose T) -> sample.
    pix = project_3d(backproject_depth(depth[..., 0], inv_K), K, T, h, w)
    warped = bilinear_sample(src, pix)

    photo = jnp.mean(photometric_error(warped, images))
    losses = {
        "smoothness": smoothness_weight * get_smooth_loss(disp, images),
        "depth": depth_weight * photo,
    }
    losses["total"] = losses["depth"] + losses["smoothness"]
    return losses


def compute_losses_sequence(
    target: jnp.ndarray,
    source: jnp.ndarray,
    disp: jnp.ndarray,
    axisangle: jnp.ndarray,
    translation: jnp.ndarray,
    rng: jax.Array,
    depth_weight: float = 1.0,
    smoothness_weight: float = 0.001,
    min_depth: float = 0.1,
    max_depth: float = 100.0,
    auto_mask: bool = True,
) -> Dict[str, jnp.ndarray]:
    """The real monodepth2 objective over REAL frame pairs
    (TrainConfig.loss_mode='sequence'): predicted depth + predicted pose
    (models/pose.PoseNet) -> reprojection warp -> SSIM+L1 photometric
    error, with monodepth2 automasking and mean-normalized edge-aware
    smoothness.

    This is what the reference's layers.py:28-193 machinery (axisangle ->
    SE(3), BackprojectDepth, Project3D) exists for but is never wired to
    (SURVEY.md §2.4: the pose utilities are dead code upstream).

    Args:
      target: [B, H, W, 3] frame whose depth is being learned.
      source: [B, H, W, 3] temporally adjacent frame.
      disp:   [B, H, W, 1] predicted sigmoid disparity for `target`.
      axisangle, translation: [B, 1, 3] PoseNet outputs — the target->source
        camera motion.
      auto_mask: monodepth2 automasking — per pixel, take
        min(reprojection error, identity error): pixels that the raw source
        frame already explains (static camera, moving objects, sky) carry
        no reprojection gradient instead of dragging depth toward infinity.

    Returns {'total', 'depth', 'smoothness', 'automask_frac'} — the last is
    the fraction of pixels where the warp beats identity (a training-health
    diagnostic: near 0 means the pose/depth warp explains nothing yet).
    """
    b, h, w, _ = target.shape
    T = transformation_from_parameters(axisangle, translation)

    _, depth = disp_to_depth(disp, min_depth, max_depth)
    K, inv_K = default_intrinsics(b, h, w, target.dtype)
    pix = project_3d(backproject_depth(depth[..., 0], inv_K), K, T, h, w)
    warped = bilinear_sample(source, pix)

    reproj = photometric_error(warped, target)           # [B, H, W, 1]
    if auto_mask:
        # identity reprojection error + tiny noise tie-break (monodepth2:
        # without it, static pixels with exactly equal errors flip-flop)
        ident = photometric_error(source, target)
        ident = ident + 1e-5 * jax.random.normal(rng, ident.shape, ident.dtype)
        photo = jnp.mean(jnp.minimum(reproj, ident))
        automask_frac = jnp.mean((reproj < ident).astype(jnp.float32))
    else:
        photo = jnp.mean(reproj)
        automask_frac = jnp.ones((), jnp.float32)

    # monodepth2 smoothness: disparity is mean-normalized first, so the
    # regularizer is scale-invariant and cannot be gamed by shrinking disp.
    norm_disp = disp / (jnp.mean(disp, axis=(1, 2, 3), keepdims=True) + 1e-7)
    losses = {
        "smoothness": smoothness_weight * get_smooth_loss(norm_disp, target),
        "depth": depth_weight * photo,
        "automask_frac": automask_frac,
    }
    losses["total"] = losses["depth"] + losses["smoothness"]
    return losses


def compute_losses_supervised(
    images: jnp.ndarray,
    disp: jnp.ndarray,
    depth_gt: jnp.ndarray,
    depth_weight: float = 1.0,
    smoothness_weight: float = 0.001,
    min_depth: float = 0.1,
    max_depth: float = 100.0,
    si_lambda: float = 0.85,
    grad_weight: float = 0.5,
    gt_mean_target: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """Scale-invariant supervised depth objective
    (TrainConfig.loss_mode='supervised'), for rendered ground truth from
    `data.procedural.MarsRenderedDepthDataset`.

    The Eigen et al. 2014 scale-invariant log loss, per image:
      d = log(pred) - log(gt);  L = mean(d^2) - si_lambda * mean(d)^2
    (si_lambda=0.85, the standard SILog setting).  The ground truth is
    first rescaled PER IMAGE to mean `gt_mean_target` (calibration below):
    SILog's partial scale invariance (si_lambda < 1) still penalizes the
    raw renderer units enough to drag the sigmoid into saturation, so the
    render scale IS calibrated rather than left to the loss.  On top: a
    multi-scale log-gradient matching term (structure supervision that the
    scale term alone leaves loose) and the mean-normalized edge-aware
    smoothness used by the sequence objective.

    Args:
      images:   [B, H, W, 3] rendered inputs (for smoothness edges).
      disp:     [B, H, W, 1] predicted sigmoid disparity.
      depth_gt: [B, H, W, 1] rendered ground-truth depth (raw units).
    """
    # Calibrate the renderer's arbitrary units to the representable range:
    # disp_to_depth(0.1, 100) maps healthy sigmoid activations to depths
    # ~[0.2, 2], while rendered depths run in the 100s — left raw, the
    # si_lambda mean-anchor term drags every prediction toward max_depth
    # and the sigmoid saturates at 0 (measured on the v1 checkpoint:
    # mean disp 0.007 on real frames).  A per-image rescale to mean
    # `gt_mean_target` preserves relative structure exactly (the part the
    # loss supervises) and anchors predictions mid-range instead.
    _, depth = disp_to_depth(disp, min_depth, max_depth)
    gt_mean = jnp.mean(jnp.maximum(depth_gt, 1e-6), axis=(1, 2, 3),
                       keepdims=True)
    depth_gt = depth_gt * (gt_mean_target / gt_mean)
    d = jnp.log(depth) - jnp.log(jnp.maximum(depth_gt, 1e-6))
    d_mean = jnp.mean(d, axis=(1, 2, 3))
    si = jnp.mean(jnp.mean(d * d, axis=(1, 2, 3)) - si_lambda * d_mean * d_mean)

    # log-gradient matching (MiDaS-style, 2 scales): supervises relative
    # structure the scale-invariant term is insensitive to at high freq.
    def grad_term(x):
        gx = jnp.abs(x[:, :, 1:, :] - x[:, :, :-1, :])
        gy = jnp.abs(x[:, 1:, :, :] - x[:, :-1, :, :])
        return jnp.mean(gx) + jnp.mean(gy)

    grads = grad_term(d) + grad_term(d[:, ::2, ::2, :])

    norm_disp = disp / (jnp.mean(disp, axis=(1, 2, 3), keepdims=True) + 1e-7)
    losses = {
        "smoothness": smoothness_weight * get_smooth_loss(norm_disp, images),
        "depth": depth_weight * (si + grad_weight * grads),
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
