"""Procedurally rendered Mars terrain with ground-truth depth.

Why this exists: no depth ground truth can enter this environment (zero
egress), and both in-environment self-supervised objectives have measured
failure modes on the real corpus — the photometric objective's synthetic
source views are rendered at a constant-depth plane whose global optimum is
a collapsed constant map, and the sequence objective's automask starves
gradient on screenshot-style pairs (train/pretrain.py module docstring
records both).  Supervised training needs (image, depth) pairs; this module
*renders* them.

The renderer synthesizes oblique orthographic views of fractal Mars-like
terrain where the depth map is exact by construction:

  1. heightfield: FFT fractal noise (power-law spectrum, random exponent)
     + impact craters (bowl + raised rim) + dune ripple fields;
  2. albedo: Mars-palette base with multi-octave brightness variation and
     rock speckle — optionally modulated by a *shading-removed* crop of a
     real corpus frame (divide by its low-pass to strip the real scene's
     own light, keeping only texture statistics);
  3. shading: Lambertian from the heightfield normals under a random sun,
     plus ambient;
  4. projection: an orthographic camera tilted `tilt` from nadir.  Ground
     visibility is solved by 8 fixed-point parallax iterations
     (p <- u - tan(tilt) * h(p)); the per-pixel ray depth is then exactly
     D(u, v) = (Z0 - h(p)) / cos(tilt) in the same units as h — the label
     the supervised loss trains against;
  5. haze: exponential attenuation toward the dust-sky color with random
     extinction — the strongest monocular depth cue available to a single
     frame, rendered consistently WITH the label.

Everything is numpy, deterministic per (seed, index), and rendered on the
fly by `MarsRenderedDepthDataset` (no disk materialization), so a
`loss_mode='supervised'` fine-tune (train/losses.py
`compute_losses_supervised`) has unbounded fresh samples.  The reference
repo has no counterpart — its fine-tuning uses a jittered-copy placeholder
loss (reference train/mars_adapter.py:209-247).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

__all__ = [
    "fractal_heightfield",
    "add_craters",
    "add_dunes",
    "procedural_albedo",
    "render_terrain_sample",
    "MarsRenderedDepthDataset",
]

# Mars regolith palette (butterscotch sky, basalt rock, oxidized dust) —
# jittered per sample, nothing is calibrated.
_MARS_BASE = np.array([0.62, 0.42, 0.28], np.float32)
_MARS_SKY = np.array([0.82, 0.64, 0.48], np.float32)


def _smooth_noise(rng, shape: Tuple[int, int], octaves: int = 4) -> np.ndarray:
    """Multi-octave value noise in [0, 1] (bilinear-upsampled white noise)."""
    h, w = shape
    out = np.zeros(shape, np.float32)
    amp, total = 1.0, 0.0
    for o in range(octaves):
        cells = 4 << o
        grid = rng.random((cells + 1, cells + 1)).astype(np.float32)
        ys = np.linspace(0, cells, h, endpoint=False)
        xs = np.linspace(0, cells, w, endpoint=False)
        y0 = np.floor(ys).astype(np.int32)
        x0 = np.floor(xs).astype(np.int32)
        fy = (ys - y0)[:, None]
        fx = (xs - x0)[None, :]
        g = (grid[y0][:, x0] * (1 - fy) * (1 - fx)
             + grid[y0 + 1][:, x0] * fy * (1 - fx)
             + grid[y0][:, x0 + 1] * (1 - fy) * fx
             + grid[y0 + 1][:, x0 + 1] * fy * fx)
        out += amp * g
        total += amp
        amp *= 0.5
    return out / total


def fractal_heightfield(rng, shape: Tuple[int, int],
                        beta: Optional[float] = None) -> np.ndarray:
    """Power-law (1/f^beta) fractal surface, normalized to [0, 1].

    beta ~ U[1.6, 2.6] spans rough rubble fields to smooth rolling plains.
    """
    h, w = shape
    if beta is None:
        beta = float(rng.uniform(2.4, 3.4))
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.rfftfreq(w)[None, :]
    f = np.sqrt(fy * fy + fx * fx)
    f[0, 0] = 1.0
    spectrum = f ** (-beta / 2.0)
    spectrum[0, 0] = 0.0  # no DC
    phase = rng.random((h, fx.shape[1])).astype(np.float32) * 2 * np.pi
    field = np.fft.irfft2(spectrum * np.exp(1j * phase), s=(h, w))
    field = field.astype(np.float32)
    lo, hi = float(field.min()), float(field.max())
    return (field - lo) / max(hi - lo, 1e-9)


def add_craters(rng, height: np.ndarray, n: Optional[int] = None) -> np.ndarray:
    """Impact craters: gaussian bowl + raised rim (radius-relative)."""
    h, w = height.shape
    if n is None:
        n = int(rng.integers(0, 9))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    out = height.copy()
    for _ in range(n):
        cy, cx = rng.uniform(0, h), rng.uniform(0, w)
        r = float(rng.uniform(0.03, 0.18) * min(h, w))
        depth = float(rng.uniform(0.05, 0.25))
        rho = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        bowl = -depth * np.exp(-2.0 * (rho / r) ** 2)
        rim = 0.35 * depth * np.exp(-((rho - r) / (0.25 * r)) ** 2)
        out = out + bowl + rim
    return out


def add_dunes(rng, height: np.ndarray) -> np.ndarray:
    """Aeolian ripple field: oriented sinusoid with noise-modulated
    amplitude/phase, applied over a random envelope region."""
    if rng.random() < 0.4:
        return height
    h, w = height.shape
    phi = float(rng.uniform(0, np.pi))
    wavelength = float(rng.uniform(8, 40))
    amp = float(rng.uniform(0.01, 0.05))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    axis = xx * np.cos(phi) + yy * np.sin(phi)
    phase_noise = _smooth_noise(rng, (h, w), octaves=3) * 2 * np.pi
    envelope = np.clip(_smooth_noise(rng, (h, w), octaves=2) * 2 - 0.6, 0, 1)
    ripple = np.sin(2 * np.pi * axis / wavelength + phase_noise)
    # asymmetric crest (dunes have a gentle stoss / steep lee side)
    ripple = np.sign(ripple) * np.abs(ripple) ** 0.7
    return height + amp * envelope * ripple.astype(np.float32)


def _real_texture_crop(rng, texture_pool: List[np.ndarray],
                       shape: Tuple[int, int]) -> Optional[np.ndarray]:
    """A shading-removed random crop of a real frame: divide the luminance
    by its own low-pass so the real scene's light/geometry is stripped and
    only albedo-scale texture statistics remain; returns [H, W] around 1."""
    if not texture_pool:
        return None
    from scipy.ndimage import gaussian_filter

    h, w = shape
    img = texture_pool[int(rng.integers(len(texture_pool)))]
    if img.shape[0] <= h or img.shape[1] <= w:
        return None
    dy = int(rng.integers(0, img.shape[0] - h))
    dx = int(rng.integers(0, img.shape[1] - w))
    lum = img[dy:dy + h, dx:dx + w].mean(axis=-1)
    base = gaussian_filter(lum, sigma=min(h, w) / 12.0)
    tex = lum / np.maximum(base, 1e-3)
    return np.clip(tex, 0.6, 1.6).astype(np.float32)


def procedural_albedo(rng, shape: Tuple[int, int],
                      texture_pool: Optional[List[np.ndarray]] = None
                      ) -> np.ndarray:
    """[H, W, 3] surface albedo: jittered Mars palette x brightness noise
    x rock speckle, optionally modulated by real-frame texture."""
    h, w = shape
    base = _MARS_BASE * rng.uniform(0.85, 1.15, 3).astype(np.float32)
    bright = 0.8 + 0.4 * _smooth_noise(rng, shape, octaves=5)
    albedo = base[None, None, :] * bright[..., None]
    # dark rock speckle: thresholded high-frequency noise
    rock = _smooth_noise(rng, shape, octaves=6)
    rock_mask = (rock > float(rng.uniform(0.72, 0.9))).astype(np.float32)
    albedo = albedo * (1.0 - 0.45 * rock_mask[..., None])
    if texture_pool is not None and rng.random() < 0.5:
        tex = _real_texture_crop(rng, texture_pool, shape)
        if tex is not None:
            albedo = albedo * tex[..., None]
    return np.clip(albedo, 0.02, 1.0).astype(np.float32)


def render_terrain_sample(
    rng,
    height_px: int,
    width_px: int,
    texture_pool: Optional[List[np.ndarray]] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Render one (image [H, W, 3] in [0, 1], depth [H, W]) pair.

    The camera is orthographic, tilted `tilt` from nadir along +x.  With
    the heightfield h in "pixel" units (relief amplitude ~ U[0.05, 0.22] of
    the image min-side), visibility solves p = u - tan(tilt) * h(p) by
    fixed-point iteration, and the exact per-ray depth from the camera
    plane at Z0 is (Z0 - h(p)) / cos(tilt).
    """
    hp, wp = height_px, width_px
    # --- geometry (rendered with an x-margin that parallax can shift into)
    tilt = float(rng.uniform(np.deg2rad(10), np.deg2rad(45)))
    relief = float(rng.uniform(0.05, 0.22)) * min(hp, wp)
    margin = int(np.ceil(np.tan(tilt) * relief)) + 2
    gh, gw = hp, wp + 2 * margin

    h_field = fractal_heightfield(rng, (gh, gw))
    h_field = add_craters(rng, h_field)
    h_field = add_dunes(rng, h_field)
    h_field = (h_field - h_field.min()) * relief

    albedo = procedural_albedo(rng, (gh, gw), texture_pool)

    # --- shading on the grid (before projection; ortho rays see the
    # shaded surface point they hit).  Normals come from a slightly
    # smoothed field: pixel-scale spikes otherwise saturate every slope
    # and the render reads as flat rubble instead of terrain.
    from scipy.ndimage import gaussian_filter

    h_shade = gaussian_filter(h_field, sigma=1.2)
    gy, gx = np.gradient(h_shade)
    normal = np.stack([-gx, -gy, np.ones_like(h_field)], axis=-1)
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    sun_el = float(rng.uniform(np.deg2rad(20), np.deg2rad(65)))
    sun_az = float(rng.uniform(0, 2 * np.pi))
    sun = np.array([np.cos(sun_el) * np.cos(sun_az),
                    np.cos(sun_el) * np.sin(sun_az),
                    np.sin(sun_el)], np.float32)
    lambert = np.clip(normal @ sun, 0.0, 1.0)
    ambient = float(rng.uniform(0.18, 0.32))
    shaded = albedo * (ambient + (1.0 - ambient) * lambert)[..., None]

    # --- oblique-orthographic visibility: p = u - tan(tilt) * h(p)
    s = np.tan(tilt)
    yy = np.arange(hp, dtype=np.float32)[:, None]
    uu = np.arange(wp, dtype=np.float32)[None, :] + margin
    px = np.broadcast_to(uu, (hp, wp)).copy()
    rows = np.broadcast_to(yy, (hp, wp)).astype(np.int32)
    for _ in range(8):
        xi = np.clip(px, 0, gw - 1)
        x0 = xi.astype(np.int32)
        x1 = np.minimum(x0 + 1, gw - 1)
        fx = xi - x0
        h_here = (h_field[rows, x0] * (1 - fx) + h_field[rows, x1] * fx)
        px = uu - s * h_here

    xi = np.clip(px, 0, gw - 1)
    x0 = xi.astype(np.int32)
    x1 = np.minimum(x0 + 1, gw - 1)
    fx = xi - x0
    h_hit = h_field[rows, x0] * (1 - fx) + h_field[rows, x1] * fx
    fx3 = fx[..., None]
    image = shaded[rows, x0] * (1 - fx3) + shaded[rows, x1] * fx3

    z0 = relief * float(rng.uniform(4.0, 12.0))
    depth = (z0 - h_hit) / np.cos(tilt)

    # --- haze: exponential attenuation toward the dust sky, consistent
    # with the depth label (the dominant monocular cue in the render)
    kappa = float(rng.uniform(0.0, 0.9)) / max(float(depth.max()), 1e-9)
    transmit = np.exp(-kappa * depth)[..., None]
    sky = (_MARS_SKY * rng.uniform(0.9, 1.1, 3)).astype(np.float32)
    image = image * transmit + sky[None, None, :] * (1 - transmit)

    # mild sensor noise
    image = image + rng.normal(0.0, rng.uniform(0.0, 0.02),
                               image.shape).astype(np.float32)
    return (np.clip(image, 0.0, 1.0).astype(np.float32),
            depth.astype(np.float32))


class MarsRenderedDepthDataset:
    """On-the-fly rendered (image, depth) dataset for supervised training.

    Items are {'image': [H, W, 3] float32 (ImageNet-normalized like
    MarsImageDataset), 'depth': [H, W, 1] float32 (raw render units; the
    supervised loss is scale-invariant), 'metadata': {...}} — NumpyLoader
    collates every ndarray key, so batches carry the depth target.

    Deterministic per (seed, index): worker-count-independent, and `epoch
    * length` distinct scenes when `resample_per_epoch` (the loader's
    `rng` argument threads the per-item stream).
    """

    def __init__(
        self,
        length: int = 512,
        height: int = 384,
        width: int = 512,
        seed: int = 0,
        normalize: bool = True,
        texture_dir: Optional[str] = None,
        texture_max_side: int = 1024,
        fresh_per_epoch: bool = False,
        cache: bool = True,
    ):
        from monodepth_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD

        self._mean, self._std = IMAGENET_MEAN, IMAGENET_STD
        self.length = int(length)
        self.height, self.width = int(height), int(width)
        self.seed = int(seed)
        self.normalize = normalize
        self.is_train = True
        # Rendering costs ~1.6 s/scene at 384x512 on one host core; by
        # default each index is rendered ONCE (seed+index stream) and
        # cached, so epochs after the first are loader-cheap.
        # fresh_per_epoch=True restores unbounded scenes (the loader's
        # per-(position, epoch) rng varies the draw) at full render cost
        # every epoch — use it when host cores are plentiful.
        self.fresh_per_epoch = bool(fresh_per_epoch)
        self._cache: Optional[Dict[int, Tuple[np.ndarray, np.ndarray]]] = (
            {} if (cache and not fresh_per_epoch) else None)
        self.samples = [{"source": "rendered", "path": f"render://{i}",
                         "altitude": None} for i in range(self.length)]
        self._texture_pool: List[np.ndarray] = []
        if texture_dir:
            from PIL import Image

            paths = []
            for ext in ("*.png", "*.jpg", "*.jpeg"):
                # flat folders, {root}/{source}/ corpora, and
                # {root}/{source}/train splits (use the TRAIN split of the
                # held-out-aware organization so eval frames never texture
                # the renders)
                paths.extend(glob.glob(os.path.join(texture_dir, ext)))
                paths.extend(glob.glob(os.path.join(texture_dir, "*", ext)))
                paths.extend(glob.glob(
                    os.path.join(texture_dir, "*", "train", ext)))
            for p in sorted(paths):
                try:
                    img = Image.open(p).convert("RGB")
                except Exception:
                    continue
                if max(img.size) > texture_max_side:
                    scale = texture_max_side / max(img.size)
                    img = img.resize((int(img.width * scale),
                                      int(img.height * scale)))
                self._texture_pool.append(
                    np.asarray(img, np.float32) / 255.0)

    def __len__(self) -> int:
        return self.length

    def _render(self, index: int, rng=None) -> Tuple[np.ndarray, np.ndarray]:
        if self._cache is not None:
            hit = self._cache.get(index)
            if hit is not None:
                return hit
        if rng is None or not self.fresh_per_epoch:
            # stable per (seed, index): cacheable, epoch-independent
            r = np.random.default_rng(
                (self.seed * 1_000_003 + index) & 0x7FFFFFFF)
        else:
            # The loader threads the SAME per-(position, epoch) stream into
            # every split's dataset — fine when it only drives augmentation,
            # but here it draws the whole scene, so the dataset seed must be
            # folded in or val scenes would EQUAL train scenes.  Keeping the
            # loader draw in the key gives fresh scenes every epoch while
            # staying worker-count independent.
            r = np.random.default_rng(
                [self.seed, index, int(rng.integers(1 << 31))])
        image, depth = render_terrain_sample(
            r, self.height, self.width, self._texture_pool or None)
        if self.normalize:
            image = ((image - self._mean) / self._std).astype(np.float32)
        pair = (image, depth[..., None].astype(np.float32))
        if self._cache is not None:
            self._cache[index] = pair
        return pair

    def get(self, index: int, rng=None) -> Dict:
        image, depth = self._render(index, rng)
        # horizontal flip (label flips with the image — a mirrored scene is
        # a valid scene): per-(position, epoch) via the loader's rng, so
        # cached scenes still vary across epochs
        if self.is_train and rng is not None and rng.random() < 0.5:
            image = np.ascontiguousarray(image[:, ::-1])
            depth = np.ascontiguousarray(depth[:, ::-1])
        return {
            "image": image,
            "depth": depth,
            "metadata": dict(self.samples[index]),
        }

    def __getitem__(self, index: int) -> Dict:
        return self.get(index)
