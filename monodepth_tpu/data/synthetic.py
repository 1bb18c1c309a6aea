"""Synthetic Mars-domain training data from seed images.

Capability of reference mars_finetune.py:64-158 (`prepare_synthetic_mars_data`),
with its NameError bug fixed (the reference used `glob` without importing it,
SURVEY.md §2.4): takes any folder of seed images (e.g. rover assets), applies
Mars-style photometric augmentation — contrast/color jitter, red-channel boost
x[1.05, 1.15], additive Gaussian "dust" noise sigma=5/255 — and materializes a
train/val/test split directory consumable by `MarsImageDataset`.
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import numpy as np
from PIL import Image

__all__ = ["mars_style_augment", "prepare_synthetic_mars_data"]


def mars_style_augment(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Mars-tint photometric augmentation (reference mars_finetune.py:117-138).

    img: float32 [H, W, 3] in [0, 1].
    """
    # contrast jitter
    mean = img.mean()
    img = (img - mean) * rng.uniform(0.85, 1.15) + mean
    # color jitter per channel
    img = img * rng.uniform(0.92, 1.08, size=(1, 1, 3))
    # red-channel boost x[1.05, 1.15] (Mars tint)
    img = img * np.array([rng.uniform(1.05, 1.15), 1.0, 1.0])[None, None, :]
    # Gaussian dust noise sigma = 5/255
    img = img + rng.normal(0.0, 5.0 / 255.0, size=img.shape)
    return np.clip(img, 0.0, 1.0).astype(np.float32)


def prepare_synthetic_mars_data(
    seed_dir: str,
    out_dir: str,
    source: str = "rover",
    num_variants: int = 3,
    size: Optional[tuple] = None,
    splits=(0.8, 0.1, 0.1),
    seed: int = 0,
    max_seeds: Optional[int] = None,
) -> int:
    """Build `{out_dir}/{source}/{train,val,test}` from seed images.

    Returns the number of images written.
    """
    paths = []
    for ext in ("*.png", "*.jpg", "*.jpeg"):
        paths.extend(glob.glob(os.path.join(seed_dir, ext)))
    paths = sorted(paths)
    if max_seeds:
        paths = paths[:max_seeds]
    if not paths:
        raise FileNotFoundError(f"no seed images found in {seed_dir}")

    rng = np.random.default_rng(seed)
    records = []
    for path in paths:
        img = Image.open(path).convert("RGB")
        if size is not None:
            img = img.resize((size[1], size[0]), Image.BILINEAR)
        base = np.asarray(img, dtype=np.float32) / 255.0
        stem = os.path.splitext(os.path.basename(path))[0].replace(" ", "_")
        for v in range(num_variants):
            aug = mars_style_augment(base, rng)
            records.append((f"{stem}_mars{v}.png", aug))

    rng.shuffle(records)
    n = len(records)
    n_train = int(n * splits[0])
    n_val = int(n * splits[1])
    buckets = {
        "train": records[:n_train],
        "val": records[n_train:n_train + n_val],
        "test": records[n_train + n_val:],
    }
    for split, items in buckets.items():
        split_dir = os.path.join(out_dir, source, split)
        os.makedirs(split_dir, exist_ok=True)
        for name, arr in items:
            Image.fromarray((arr * 255).astype(np.uint8)).save(
                os.path.join(split_dir, name)
            )
    return n
