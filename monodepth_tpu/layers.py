"""Numeric primitives for depth estimation (pure jnp, NHWC layout).

Capability-equivalent to the reference's `layers.py` (monodepth2-derived):
disparity<->depth conversion, pose utilities, backprojection/projection,
edge-aware smoothness, SSIM, and standard depth error metrics.  Formulas cite
the reference file:line they reproduce; the implementations are fresh JAX.

Layout note: the reference is NCHW; everything here is NHWC with the channel
mean taken over the last axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "disp_to_depth",
    "transformation_from_parameters",
    "get_translation_matrix",
    "rot_from_axisangle",
    "backproject_depth",
    "project_3d",
    "bilinear_sample",
    "default_intrinsics",
    "upsample",
    "get_smooth_loss",
    "ssim",
    "compute_depth_errors",
]


def disp_to_depth(disp, min_depth, max_depth):
    """Convert a sigmoid disparity in [0,1] into (scaled_disp, depth).

    depth = 1 / (1/max_depth + (1/min_depth - 1/max_depth) * disp)
    (reference layers.py:16-25).
    """
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    depth = 1.0 / scaled_disp
    return scaled_disp, depth


def rot_from_axisangle(vec):
    """Axis-angle [B,1,3] -> 4x4 rotation matrices [B,4,4] (reference layers.py:64-103)."""
    angle = jnp.linalg.norm(vec, axis=2, keepdims=True)  # [B,1,1]
    axis = vec / (angle + 1e-7)

    ca = jnp.cos(angle)[:, 0, 0]
    sa = jnp.sin(angle)[:, 0, 0]
    C = 1.0 - ca

    x = axis[:, 0, 0]
    y = axis[:, 0, 1]
    z = axis[:, 0, 2]

    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC

    b = vec.shape[0]
    zeros = jnp.zeros((b,), vec.dtype)
    ones = jnp.ones((b,), vec.dtype)
    rot = jnp.stack(
        [
            x * xC + ca, xyC - zs,     zxC + ys,     zeros,
            xyC + zs,    y * yC + ca,  yzC - xs,     zeros,
            zxC - ys,    yzC + xs,     z * zC + ca,  zeros,
            zeros,       zeros,        zeros,        ones,
        ],
        axis=-1,
    ).reshape(b, 4, 4)
    return rot


def get_translation_matrix(translation_vector):
    """Translation [B,3] (or [B,1,3]) -> 4x4 transform [B,4,4] (reference layers.py:48-61)."""
    t = translation_vector.reshape(-1, 3)
    b = t.shape[0]
    T = jnp.tile(jnp.eye(4, dtype=t.dtype)[None], (b, 1, 1))
    T = T.at[:, :3, 3].set(t)
    return T


def transformation_from_parameters(axisangle, translation, invert=False):
    """(axis-angle, translation) -> 4x4 SE(3) matrix (reference layers.py:28-45)."""
    R = rot_from_axisangle(axisangle)
    t = translation
    if invert:
        R = jnp.swapaxes(R, 1, 2)
        t = -t
    T = get_translation_matrix(t)
    if invert:
        return jnp.matmul(R, T)
    return jnp.matmul(T, R)


def _pixel_grid(height: int, width: int, dtype=jnp.float32):
    """Homogeneous pixel coordinates [3, H*W] (x, y, 1) — reference layers.py:149-161."""
    xs, ys = jnp.meshgrid(
        jnp.arange(width, dtype=dtype), jnp.arange(height, dtype=dtype), indexing="xy"
    )
    ones = jnp.ones((height * width,), dtype)
    return jnp.stack([xs.reshape(-1), ys.reshape(-1), ones], axis=0)


def backproject_depth(depth, inv_K):
    """Depth image -> homogeneous camera-frame point cloud.

    Functional equivalent of `BackprojectDepth.forward` (reference layers.py:139-168).

    Args:
      depth: [B, H, W] or [B, H, W, 1] depth map.
      inv_K: [B, 4, 4] inverse intrinsics.

    Returns:
      cam_points: [B, 4, H*W] homogeneous 3-D points.
    """
    if depth.ndim == 4:
        depth = depth[..., 0]
    b, h, w = depth.shape
    pix = _pixel_grid(h, w, depth.dtype)  # [3, H*W]
    cam_points = jnp.matmul(inv_K[:, :3, :3], jnp.broadcast_to(pix, (b, 3, h * w)))
    cam_points = depth.reshape(b, 1, -1) * cam_points
    ones = jnp.ones((b, 1, h * w), depth.dtype)
    return jnp.concatenate([cam_points, ones], axis=1)


def project_3d(points, K, T, height: int, width: int, eps: float = 1e-7):
    """Project homogeneous 3-D points into normalized pixel coords [-1, 1].

    Functional equivalent of `Project3D.forward` (reference layers.py:171-193).

    Args:
      points: [B, 4, H*W] homogeneous points.
      K, T:   [B, 4, 4] intrinsics and camera pose.

    Returns:
      pix_coords: [B, H, W, 2] in [-1, 1] (grid-sample convention).
    """
    P = jnp.matmul(K, T)[:, :3, :]
    cam_points = jnp.matmul(P, points)
    pix = cam_points[:, :2, :] / (cam_points[:, 2:3, :] + eps)
    b = points.shape[0]
    pix = pix.reshape(b, 2, height, width).transpose(0, 2, 3, 1)
    scale = jnp.asarray([width - 1, height - 1], pix.dtype)
    pix = pix / scale
    return (pix - 0.5) * 2.0


def bilinear_sample(img, pix_coords):
    """Differentiable bilinear sampling (F.grid_sample equivalent:
    align_corners=True, padding_mode='border' — the monodepth2 warp
    convention the reference's Project3D output feeds, layers.py:171-193).

    Args:
      img:        [B, H, W, C] source image.
      pix_coords: [B, Ho, Wo, 2] normalized (x, y) in [-1, 1] as produced
                  by `project_3d`.

    Returns [B, Ho, Wo, C] sampled image.
    """
    b, h, w, c = img.shape
    x = (pix_coords[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (pix_coords[..., 1] + 1.0) * 0.5 * (h - 1)
    x = jnp.clip(x, 0.0, w - 1)
    y = jnp.clip(y, 0.0, h - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    def gather(yi, xi):
        flat = img.reshape(b, h * w, c)
        idx = (yi * w + xi).astype(jnp.int32).reshape(b, -1)
        out = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return out.reshape(*yi.shape, c)

    top = gather(y0, x0) * (1 - wx) + gather(y0, x1) * wx
    bot = gather(y1, x0) * (1 - wx) + gather(y1, x1) * wx
    return top * (1 - wy) + bot * wy


def default_intrinsics(batch: int, height: int, width: int, dtype=jnp.float32):
    """Default pinhole intrinsics: f = 0.7 * max(h, w), principal point at
    the center (the reference's terrain_reconstruction_fixed.py:39-47 rule).

    Returns (K, inv_K) as [B, 4, 4].
    """
    f = 0.7 * max(height, width)
    K = jnp.asarray(
        [[f, 0.0, (width - 1) / 2.0, 0.0],
         [0.0, f, (height - 1) / 2.0, 0.0],
         [0.0, 0.0, 1.0, 0.0],
         [0.0, 0.0, 0.0, 1.0]],
        dtype,
    )
    inv_K = jnp.linalg.inv(K)
    return (jnp.broadcast_to(K, (batch, 4, 4)),
            jnp.broadcast_to(inv_K, (batch, 4, 4)))


def upsample(x):
    """Nearest x2 upsample (reference layers.py:196-199). NHWC."""
    from monodepth_tpu.ops.resize import upsample2x_nearest

    return upsample2x_nearest(x)


def get_smooth_loss(disp, img):
    """Edge-aware first-order disparity smoothness (reference layers.py:202-215).

    Args:
      disp: [B, H, W, 1] disparity.
      img:  [B, H, W, 3] color image used for edge weighting.
    """
    grad_disp_x = jnp.abs(disp[:, :, :-1, :] - disp[:, :, 1:, :])
    grad_disp_y = jnp.abs(disp[:, :-1, :, :] - disp[:, 1:, :, :])

    grad_img_x = jnp.mean(jnp.abs(img[:, :, :-1, :] - img[:, :, 1:, :]), axis=-1, keepdims=True)
    grad_img_y = jnp.mean(jnp.abs(img[:, :-1, :, :] - img[:, 1:, :, :]), axis=-1, keepdims=True)

    grad_disp_x = grad_disp_x * jnp.exp(-grad_img_x)
    grad_disp_y = grad_disp_y * jnp.exp(-grad_img_y)

    return jnp.mean(grad_disp_x) + jnp.mean(grad_disp_y)


def _avg_pool3x3(x):
    """3x3 stride-1 average pool, VALID (after caller pads). NHWC."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "VALID"
    ) / 9.0


def ssim(x, y):
    """SSIM dissimilarity map in [0,1] between two NHWC images.

    Matches the reference `SSIM` module (layers.py:218-248): reflection pad 1,
    3x3 average pooling, C1=0.01^2, C2=0.03^2, output (1-SSIM)/2 clamped.
    """
    pad = [(0, 0), (1, 1), (1, 1), (0, 0)]
    xp = jnp.pad(x, pad, mode="reflect")
    yp = jnp.pad(y, pad, mode="reflect")

    mu_x = _avg_pool3x3(xp)
    mu_y = _avg_pool3x3(yp)

    sigma_x = _avg_pool3x3(xp**2) - mu_x**2
    sigma_y = _avg_pool3x3(yp**2) - mu_y**2
    sigma_xy = _avg_pool3x3(xp * yp) - mu_x * mu_y

    C1 = 0.01**2
    C2 = 0.03**2
    ssim_n = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
    ssim_d = (mu_x**2 + mu_y**2 + C1) * (sigma_x + sigma_y + C2)
    return jnp.clip((1 - ssim_n / ssim_d) / 2, 0.0, 1.0)


def compute_depth_errors(gt, pred):
    """Standard depth error metrics (reference layers.py:251-269).

    Returns (abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3) as scalars.
    """
    thresh = jnp.maximum(gt / pred, pred / gt)
    a1 = jnp.mean((thresh < 1.25).astype(jnp.float32))
    a2 = jnp.mean((thresh < 1.25**2).astype(jnp.float32))
    a3 = jnp.mean((thresh < 1.25**3).astype(jnp.float32))

    rmse = jnp.sqrt(jnp.mean((gt - pred) ** 2))
    rmse_log = jnp.sqrt(jnp.mean((jnp.log(gt) - jnp.log(pred)) ** 2))
    abs_rel = jnp.mean(jnp.abs(gt - pred) / gt)
    sq_rel = jnp.mean((gt - pred) ** 2 / gt)
    return abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3
