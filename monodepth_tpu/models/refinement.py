"""Depth refinement library (capability of reference models/refinement.py).

The reference ships this as dead code (never imported, SURVEY.md §2.4) but
names it as a capability target; here it is live and wired into the CLI's
`--multi_scale_fusion` flag and the training stack.

- `TextureAwareRefinementModule` (reference refinement.py:8-107): learnable
  RGB+depth refinement with frozen Sobel edge gating
  (residual * sigmoid(edge_mag * 5.0)).
- `MultiScaleDepthFusion` (:109-183): per-scale confidence convs,
  normalized confidence-weighted fusion.
- `DepthQualityEnhancement` (:185-388): static post-processing — bilateral /
  joint-bilateral filtering, guided-filter edge-preserving smoothing with
  adaptive radius min(shape)//16, connected-component median hole filling,
  temporal consistency averaging.  cv2.ximgproc is unavailable here, so the
  guided filter is a from-scratch jitted XLA box-filter implementation
  (He et al. 2010) and joint-bilateral uses it with the RGB guide.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from monodepth_tpu.ops.resize import resize_bilinear

__all__ = [
    "TextureAwareRefinementModule",
    "MultiScaleDepthFusion",
    "DepthQualityEnhancement",
    "guided_filter",
    "fast_guided_filter",
    "multi_scale_fusion_refine",
    "multi_scale_fusion_refine_batch",
    "batched_smooth",
    "luma_guide",
]

_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.float32)
_SOBEL_Y = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], dtype=np.float32)


def _sobel_kernel(n_in: int, horizontal: bool) -> jnp.ndarray:
    """Frozen 3x3 Sobel kernel, HWIO, summing over n_in channels / n_in
    (reference refinement.py:40-53)."""
    base = _SOBEL_X if horizontal else _SOBEL_Y
    k = np.broadcast_to(base[:, :, None, None], (3, 3, n_in, 1)) / n_in
    return jnp.asarray(k.copy())


def _edge_magnitude(x: jnp.ndarray) -> jnp.ndarray:
    """|∇x| via frozen Sobel convs (zero pad 1), NHWC -> [B, H, W, 1]."""
    import jax.lax as lax

    n_in = x.shape[-1]
    dn = lax.conv_dimension_numbers(x.shape, (3, 3, n_in, 1), ("NHWC", "HWIO", "NHWC"))
    ex = lax.conv_general_dilated(x, _sobel_kernel(n_in, True), (1, 1),
                                  [(1, 1), (1, 1)], dimension_numbers=dn)
    ey = lax.conv_general_dilated(x, _sobel_kernel(n_in, False), (1, 1),
                                  [(1, 1), (1, 1)], dimension_numbers=dn)
    return jnp.sqrt(ex**2 + ey**2)


class TextureAwareRefinementModule(nn.Module):
    """Edge-gated residual depth refinement from RGB texture cues."""

    features: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, depth_map, rgb_image):
        """depth_map [B,H,W,1], rgb_image [B,H,W,3] -> refined depth [B,H,W,1]."""
        if rgb_image.shape[1:3] != depth_map.shape[1:3]:
            rgb_image = resize_bilinear(rgb_image, depth_map.shape[1:3],
                                        align_corners=False)
        f = self.features
        act = nn.elu
        rgb = act(nn.Conv(f, (3, 3), padding=1, dtype=self.dtype, name="rgb_conv1")(rgb_image))
        rgb = act(nn.Conv(f, (3, 3), padding=1, dtype=self.dtype, name="rgb_conv2")(rgb))
        dep = act(nn.Conv(f, (3, 3), padding=1, dtype=self.dtype, name="depth_conv1")(depth_map))
        dep = act(nn.Conv(f, (3, 3), padding=1, dtype=self.dtype, name="depth_conv2")(dep))

        combined = jnp.concatenate([rgb, dep], axis=-1)
        combined = act(nn.Conv(f, (3, 3), padding=1, dtype=self.dtype, name="combined_conv1")(combined))
        combined = act(nn.Conv(f // 2, (3, 3), padding=1, dtype=self.dtype, name="combined_conv2")(combined))
        residual = nn.Conv(1, (1, 1), dtype=self.dtype, name="output_conv")(combined)

        edge_weight = nn.sigmoid(_edge_magnitude(rgb_image) * 5.0)
        return depth_map + residual * edge_weight


class MultiScaleDepthFusion(nn.Module):
    """Confidence-weighted fusion of multi-scale depth predictions."""

    scales: Sequence[int] = (0, 1, 2, 3)
    num_channels: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, depth_scales):
        """depth_scales: {("disp"|"depth", s): [B,h,w,1]} -> fused [B,H,W,1]."""
        target_scale = min(self.scales)
        target_key = (("disp", target_scale)
                      if ("disp", target_scale) in depth_scales
                      else ("depth", target_scale))
        target_size = depth_scales[target_key].shape[1:3]

        feats, confs = [], []
        for i, scale in enumerate(self.scales):
            key = ("disp", scale) if ("disp", scale) in depth_scales else ("depth", scale)
            if key not in depth_scales:
                continue
            f = depth_scales[key]
            if f.shape[1:3] != target_size:
                f = resize_bilinear(f, target_size, align_corners=False)
            conf = nn.sigmoid(
                nn.Conv(self.num_channels, (3, 3), padding=1, dtype=self.dtype,
                        name=f"confidence_conv_{i}")(f)
            )
            feats.append(f)
            confs.append(conf)

        stacked = jnp.concatenate(feats, axis=-1)
        conf = jnp.concatenate(confs, axis=-1)
        norm_conf = conf / (jnp.sum(conf, axis=-1, keepdims=True) + 1e-8)
        weighted = stacked * norm_conf
        return nn.Conv(self.num_channels, (1, 1), dtype=self.dtype,
                       name="fusion_conv")(weighted)


# --------------------------------------------------------------------------
# Static post-processing.  The guided filter runs on-device as ONE jitted XLA
# program (separable nearest-padded box filters via cumulative sums): the
# numpy/scipy version measured ~0.5 s per 1024px image on host — it capped the
# CLI's --multi_scale_fusion path at ~1 img/s against a ~1900 img/s forward.
# --------------------------------------------------------------------------
def _box_filter_jnp(x, r: int):
    """Mean over a (2r+1)^2 window, edges replicated (uniform_filter
    'nearest' semantics), separable cumsum form: O(H*W) independent of r."""
    import jax.numpy as jnp

    k = 2 * r + 1
    for axis in (0, 1):
        xp = jnp.pad(x, [(r + 1, r) if a == axis else (0, 0)
                         for a in range(x.ndim)], mode="edge")
        # pad left by r+1 so c[i+k] - c[i] sums exactly k entries ending
        # at offset i+r; the extra leading row makes the cumsum exclusive.
        # associative_scan: jnp.cumsum lowers to an O(n * window)
        # reduce_window on some backends (measured 6x slower on CPU).
        c = jax.lax.associative_scan(jnp.add, xp, axis=axis)
        n = x.shape[axis]
        hi = jax.lax.slice_in_dim(c, k, k + n, axis=axis)
        lo = jax.lax.slice_in_dim(c, 0, n, axis=axis)
        x = (hi - lo) / k
    return x


def _guided_coefficients(I, p, radius: int, eps):
    """Smoothed per-pixel affine coefficients (mean_a, mean_b) of the guided
    filter (He et al.) — the one copy of the statistics math shared by the
    exact and fast cores (the fast path is the production default and the
    exact path its regression reference; they must stay algorithmically
    identical)."""
    mean_I = _box_filter_jnp(I, radius)
    mean_p = _box_filter_jnp(p, radius)
    corr_Ip = _box_filter_jnp(I * p, radius)
    corr_II = _box_filter_jnp(I * I, radius)
    var_I = corr_II - mean_I * mean_I
    cov_Ip = corr_Ip - mean_I * mean_p
    a = cov_Ip / (var_I + eps)
    b = mean_p - a * mean_I
    return _box_filter_jnp(a, radius), _box_filter_jnp(b, radius)


def _guided_filter_core(I, p, radius: int, eps):
    I = I.astype(jnp.float32)
    p = p.astype(jnp.float32)
    mean_a, mean_b = _guided_coefficients(I, p, radius, eps)
    return mean_a * I + mean_b


def _fast_guided_filter_core(I, p, radius: int, eps, subsample: int):
    """Fast guided filter (He & Sun 2015): solve the per-pixel affine
    coefficients a, b on an `subsample`-times decimated grid (radius scaled
    to radius//subsample), bilinearly upsample the smoothed coefficient
    maps, and apply `a*I + b` at full resolution.  ~s^2 less box-filter work
    with bounded output change (the coefficients are already low-frequency:
    they come out of a mean filter).  subsample<=1 falls back to the exact
    full-resolution filter."""
    if subsample <= 1:
        return _guided_filter_core(I, p, radius, eps)
    I = I.astype(jnp.float32)
    p = p.astype(jnp.float32)
    h, w = I.shape
    s = subsample
    # average-pool decimation: each low-res pixel is the mean of its s x s
    # cell, which is exactly the geometry align_corners=False upsampling
    # assumes — nearest [::s] decimation is offset by (s-1)/2 px and
    # measured 3x worse vs the exact filter.  Edge-pad to a multiple of s.
    hp, wp = (-h) % s, (-w) % s
    nh, nw = (h + hp) // s, (w + wp) // s
    Il = jnp.pad(I, ((0, hp), (0, wp)), mode="edge").reshape(
        nh, s, nw, s).mean(axis=(1, 3))
    pl = jnp.pad(p, ((0, hp), (0, wp)), mode="edge").reshape(
        nh, s, nw, s).mean(axis=(1, 3))
    rl = max(radius // subsample, 1)
    mean_a, mean_b = _guided_coefficients(Il, pl, rl, eps)
    ab = jnp.stack([mean_a, mean_b], axis=-1)[None]
    ab = resize_bilinear(ab, (h + hp, w + wp), align_corners=False)[0]
    ab = ab[:h, :w]
    return ab[..., 0] * I + ab[..., 1]


_guided_filter_jit = functools.partial(jax.jit, static_argnames=("radius",))(
    _guided_filter_core)

_fast_guided_filter_jit = functools.partial(
    jax.jit, static_argnames=("radius", "subsample"))(_fast_guided_filter_core)


def guided_filter(guide: np.ndarray, src: np.ndarray, radius: int, eps: float) -> np.ndarray:
    """Guided image filter (He et al.), single-channel guide, from scratch."""
    out = _guided_filter_jit(jnp.asarray(guide), jnp.asarray(src),
                             radius, float(eps))
    return np.asarray(out, dtype=np.float32)


def fast_guided_filter(guide: np.ndarray, src: np.ndarray, radius: int,
                       eps: float, subsample: int = 4) -> np.ndarray:
    """Fast guided filter (He & Sun 2015) — the production refinement path;
    `guided_filter` above is the exact reference implementation it is
    regression-bounded against (tests/test_refinement.py)."""
    out = _fast_guided_filter_jit(jnp.asarray(guide), jnp.asarray(src),
                                  radius, float(eps), subsample)
    return np.asarray(out, dtype=np.float32)


class DepthQualityEnhancement:
    """Static post-processing methods for Mars depth maps."""

    @staticmethod
    def _normalize(depth_map):
        depth_map = np.squeeze(np.asarray(depth_map)).astype(np.float32)
        dmin, dmax = float(np.min(depth_map)), float(np.max(depth_map))
        norm = (depth_map - dmin) / (dmax - dmin + 1e-8)
        return depth_map, norm, dmin, dmax

    @staticmethod
    def bilateral_depth_filter(depth_map, rgb_image=None, sigma_space=15,
                               sigma_color=0.05, sigma_depth=0.05):
        """Edge-preserving bilateral smoothing; with an RGB guide this becomes
        a guided (joint) filter (reference refinement.py:191-241 used
        cv2.ximgproc.jointBilateralFilter; unavailable here)."""
        import cv2

        depth_map, norm, dmin, dmax = DepthQualityEnhancement._normalize(depth_map)
        if rgb_image is not None:
            rgb = np.squeeze(np.asarray(rgb_image))
            if rgb.dtype != np.uint8:
                rgb = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
            if rgb.ndim == 3:
                guide = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY).astype(np.float32) / 255.0
            else:
                guide = rgb.astype(np.float32) / 255.0
            filtered = guided_filter(guide, norm, radius=sigma_space // 2,
                                     eps=sigma_color**2)
        else:
            filtered = cv2.bilateralFilter(norm, d=sigma_space,
                                           sigmaColor=sigma_depth,
                                           sigmaSpace=sigma_space)
        return filtered * (dmax - dmin) + dmin

    @staticmethod
    def edge_preserving_smoothing(depth_map, rgb_image=None, lambda_param=0.1):
        """Guided-filter smoothing with adaptive radius min(shape)//16
        (reference refinement.py:244-298)."""
        import cv2

        depth_map, norm, dmin, dmax = DepthQualityEnhancement._normalize(depth_map)
        radius = max(1, min(depth_map.shape) // 16)
        if rgb_image is not None:
            rgb = np.squeeze(np.asarray(rgb_image))
            if rgb.dtype != np.uint8:
                rgb = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
            guide = (cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY).astype(np.float32) / 255.0
                     if rgb.ndim == 3 else rgb.astype(np.float32) / 255.0)
        else:
            guide = norm
        smoothed = guided_filter(guide, norm, radius=radius, eps=lambda_param)
        return smoothed * (dmax - dmin) + dmin

    @staticmethod
    def fill_depth_holes(depth_map, max_hole_size=10):
        """Median-fill small invalid regions (reference refinement.py:301-353)."""
        import cv2
        import scipy.ndimage as ndi

        depth_map = np.squeeze(np.asarray(depth_map)).astype(np.float32)
        invalid = ~np.isfinite(depth_map) | (depth_map <= 0)
        if not invalid.any():
            return depth_map  # nothing to fill (the common serving case)
        filled = depth_map.copy()
        filled[~np.isfinite(filled)] = 0.0

        labeled, num = ndi.label(invalid)
        for i in range(1, num + 1):
            component = labeled == i
            if component.sum() > max_hole_size * max_hole_size:
                continue
            dilated = ndi.binary_dilation(component, iterations=3)
            neighbors = dilated & ~component & ~invalid
            if neighbors.any():
                filled[component] = np.median(depth_map[neighbors])

        smoothed = cv2.medianBlur(filled, 3)
        filled[invalid] = smoothed[invalid]
        return filled

    @staticmethod
    def temporal_consistency_filter(depth_maps, weights=None):
        """Weighted average over sequential frames (reference :356-388)."""
        if len(depth_maps) == 0:
            return None
        if len(depth_maps) == 1:
            return np.squeeze(np.asarray(depth_maps[0]))
        maps = [np.squeeze(np.asarray(d)) for d in depth_maps]
        if weights is None:
            weights = np.ones(len(maps)) / len(maps)
        else:
            weights = np.asarray(weights, dtype=np.float64)
            weights = weights / weights.sum()
        stacked = np.stack(maps, axis=0)
        return np.sum(stacked * weights[:, None, None], axis=0)


def multi_scale_fusion_refine(depth: np.ndarray, rgb: Optional[np.ndarray] = None):
    """CLI `--multi_scale_fusion` pass: edge-preserving smoothing + hole fill.

    The deterministic quality pipeline (the learnable fusion/refinement
    modules above are training-time components).
    """
    depth = DepthQualityEnhancement.fill_depth_holes(depth)
    return DepthQualityEnhancement.edge_preserving_smoothing(depth, rgb)


def batched_smooth(depth, guide, radius: int, eps, subsample: int = 4):
    """Normalize + guided-filter a [B, H, W] stack (pure jnp — composable
    inside a larger jitted program, e.g. fused with the model forward so
    refined depth never round-trips to the host).

    `subsample=4` uses the fast guided filter (He & Sun 2015) — the
    production default; pass 1 for the exact full-resolution filter
    (regression-bounded against each other in tests/test_refinement.py)."""

    def one(d, g):
        dmin = jnp.min(d)
        dmax = jnp.max(d)
        norm = (d - dmin) / (dmax - dmin + 1e-8)
        return _fast_guided_filter_core(g, norm, radius, eps, subsample) \
            * (dmax - dmin) + dmin

    return jax.vmap(one)(depth, guide)


def luma_guide(rgb):
    """uint8-quantized BT.601 luma guide from [..., H, W, 3] float RGB in
    [0,1] — matches the host batch path's quantization exactly: each channel
    is first truncated to the uint8 grid ((clip*255).astype(uint8) ==
    floor for non-negative values), THEN the luma weights apply, then the
    result rounds.  Skipping the per-channel truncation differed from the
    host guide by 1/255 on ~half the pixels of generic float RGB."""
    q = jnp.floor(jnp.clip(rgb, 0.0, 1.0) * 255.0)
    luma = 0.299 * q[..., 0] + 0.587 * q[..., 1] + 0.114 * q[..., 2]
    return jnp.round(luma) / 255.0


_batched_smooth_jit = functools.partial(
    jax.jit, static_argnames=("radius", "subsample"))(batched_smooth)


def multi_scale_fusion_refine_batch(depths: np.ndarray,
                                    rgbs: Optional[np.ndarray] = None,
                                    subsample: int = 4):
    """Batched `multi_scale_fusion_refine` over [B, H, W] (+ [B, H, W, 3]).

    Hole filling runs on host only for frames that actually contain invalid
    pixels (data-dependent connected components); the edge-preserving
    smoothing — the dominant cost — runs as one jitted, vmapped device
    program per batch instead of B separate host round-trips.  `subsample=4`
    selects the fast guided filter (production default); 1 = exact.
    """
    depths = np.asarray(depths, dtype=np.float32)
    out = depths.copy()
    for i in range(out.shape[0]):
        invalid = ~np.isfinite(out[i]) | (out[i] <= 0)
        if invalid.any():
            out[i] = DepthQualityEnhancement.fill_depth_holes(out[i])
    radius = max(1, min(out.shape[1:3]) // 16)
    if rgbs is None:
        dmin = out.min(axis=(1, 2), keepdims=True)
        dmax = out.max(axis=(1, 2), keepdims=True)
        guide = (out - dmin) / (dmax - dmin + 1e-8)
    else:
        rgbs = np.asarray(rgbs)
        if rgbs.dtype != np.uint8:
            rgbs = (np.clip(rgbs, 0, 1) * 255).astype(np.uint8)
        # ITU-R BT.601 luma, rounded through uint8 — matches the per-image
        # path's cv2.cvtColor(RGB2GRAY) on uint8 input bit-for-bit.
        luma = (0.299 * rgbs[..., 0] + 0.587 * rgbs[..., 1]
                + 0.114 * rgbs[..., 2])
        guide = np.round(luma).astype(np.uint8).astype(np.float32) / 255.0
    return np.asarray(
        _batched_smooth_jit(jnp.asarray(out), jnp.asarray(guide),
                            radius, 0.1, subsample),
        dtype=np.float32)
