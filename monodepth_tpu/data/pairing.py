"""Sequence-pair curation for `loss_mode='sequence'` training.

The reference corpus (`assets/{rover,ingenuity,satellite}`, SURVEY.md §2.1
item 22) is a set of timestamped screenshots, not a video dump: consecutive
files are 13 s to many minutes apart and only a subset are two views of the
same scene.  Blind stride-1 pairing (`MarsSequenceDataset`'s frame-dump
convention) therefore mixes genuine pairs with unrelated ones — monodepth2
automasking absorbs the damage (unrelated pixels fall back to the identity
error and carry no gradient) but wastes most of a small corpus's steps.

This module curates pairs explicitly:

- `frame_timestamp(name)` parses the capture time out of the filename.
- `pair_correlation(a, b)` scores visual adjacency with a normalized
  grayscale thumbnail cross-correlation.
- `build_pair_manifest(split_dir, ...)` writes a `pairs.json` manifest into
  a `{data_dir}/{source}/{split}` directory, accepting (target, source)
  pairs by time gap and correlation; `MarsSequenceDataset` prefers the
  manifest over stride pairing when one is present.
- `organize_sequence_dataset(...)` builds the train/val layout from a flat
  frames folder with an ORDER-PRESERVING contiguous split (the shuffled
  80-10-10 of `organize_dataset`, reference mars_dataset.py:124-199, would
  destroy temporal adjacency).
- `pair_statistics(...)` reports per-(source, split) frame/pair counts so a
  CLI user learns immediately when sequence mode degenerates (VERDICT r3
  item 7) instead of training on noise.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "MANIFEST_NAME",
    "build_pair_manifest",
    "frame_timestamp",
    "load_pair_manifest",
    "organize_sequence_dataset",
    "pair_correlation",
    "pair_statistics",
]

MANIFEST_NAME = "pairs.json"

_EXTS = (".png", ".jpg", ".jpeg")

# "Screenshot 2025-05-30 102533.png" and similar: a date then a 6-digit
# HHMMSS clock, with anything in between.
_TS_RE = re.compile(r"(\d{4})-(\d{2})-(\d{2})\D*?(\d{2})(\d{2})(\d{2})")


def frame_timestamp(name: str) -> Optional[float]:
    """Capture time encoded in a frame filename, as seconds (arbitrary
    epoch, comparable within a folder); None when unparseable."""
    m = _TS_RE.search(os.path.basename(name))
    if m is None:
        return None
    y, mo, d, hh, mm, ss = (int(g) for g in m.groups())
    if not (hh < 24 and mm < 60 and ss < 60):
        return None
    # days-since-epoch precision is irrelevant for gap computation; a plain
    # linearization avoids datetime edge cases on synthetic names
    days = y * 372 + mo * 31 + d
    return float(days * 86400 + hh * 3600 + mm * 60 + ss)


def _thumb(path: str, size: Tuple[int, int] = (64, 48)) -> np.ndarray:
    """Zero-mean/unit-norm grayscale thumbnail for correlation scoring."""
    from PIL import Image

    img = Image.open(path).convert("L").resize(size, Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32)
    arr = arr - arr.mean()
    return arr / (np.linalg.norm(arr) + 1e-6)


def pair_correlation(path_a: str, path_b: str) -> float:
    """Normalized cross-correlation of grayscale thumbnails in [-1, 1]:
    a cheap proxy for 'two views of the same scene'."""
    return float(np.sum(_thumb(path_a) * _thumb(path_b)))


def _list_frames(directory: str) -> List[str]:
    return sorted(
        n for n in os.listdir(directory) if n.lower().endswith(_EXTS)
    )


def build_pair_manifest(
    split_dir: str,
    max_gap_s: float = 120.0,
    min_corr: float = 0.35,
    max_stride: int = 2,
    bidirectional: bool = True,
    write: bool = True,
) -> Dict:
    """Curate (target, source) frame pairs in one `{source}/{split}` dir.

    Candidates are (frame[i], frame[i+s]) for s in 1..max_stride over the
    sorted listing; a candidate is accepted when its filename-timestamp gap
    is <= max_gap_s (unknown gaps pass — correlation still gates) AND its
    thumbnail correlation is >= min_corr.  `bidirectional` adds the swapped
    (source, target) pair too: with a jointly-trained PoseNet the reverse
    motion is an equally valid training sample, doubling a small corpus.

    Writes `pairs.json` ({"pairs": [[target, source], ...], "stats": ...},
    basenames relative to split_dir) unless write=False, and returns the
    stats dict.
    """
    frames = _list_frames(split_dir)
    thumbs: Dict[str, np.ndarray] = {}

    def corr(a: str, b: str) -> float:
        for n in (a, b):
            if n not in thumbs:
                thumbs[n] = _thumb(os.path.join(split_dir, n))
        return float(np.sum(thumbs[a] * thumbs[b]))

    pairs: List[List[str]] = []
    corrs: List[float] = []
    n_candidates = n_gap = n_corr = 0
    for stride in range(1, max_stride + 1):
        for a, b in zip(frames, frames[stride:]):
            n_candidates += 1
            ta, tb = frame_timestamp(a), frame_timestamp(b)
            if ta is not None and tb is not None and abs(tb - ta) > max_gap_s:
                n_gap += 1
                continue
            c = corr(a, b)
            if c < min_corr:
                n_corr += 1
                continue
            pairs.append([a, b])
            corrs.append(c)
            if bidirectional:
                pairs.append([b, a])
                corrs.append(c)

    stats = {
        "frames": len(frames),
        "candidates": n_candidates,
        "accepted": len(pairs),
        "rejected_gap": n_gap,
        "rejected_corr": n_corr,
        "max_gap_s": max_gap_s,
        "min_corr": min_corr,
        "max_stride": max_stride,
        "bidirectional": bidirectional,
        "mean_corr": float(np.mean(corrs)) if corrs else None,
    }
    if write:
        path = os.path.join(split_dir, MANIFEST_NAME)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"pairs": pairs, "stats": stats}, f, indent=1)
        os.replace(tmp, path)
    return stats


def load_pair_manifest(split_dir: str) -> Optional[List[Tuple[str, str]]]:
    """(target, source) basename pairs from `pairs.json`, or None when the
    directory has no manifest.  Pairs naming missing files are dropped (the
    manifest may outlive a re-organized folder) — callers see the count."""
    path = os.path.join(split_dir, MANIFEST_NAME)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        data = json.load(f)
    pairs = []
    for tgt, src in data.get("pairs", []):
        if (os.path.exists(os.path.join(split_dir, tgt))
                and os.path.exists(os.path.join(split_dir, src))):
            pairs.append((tgt, src))
    return pairs


def organize_sequence_dataset(
    src_dir: str,
    out_dir: str,
    source: str = "rover",
    val_fraction: float = 0.15,
    link: bool = True,
) -> Tuple[int, int]:
    """Build `{out_dir}/{source}/{train,val}` from a flat frames folder with
    a CONTIGUOUS split: the first (1 - val_fraction) of the sorted frames
    train, the tail validates.  Order-preserving — a shuffled split
    (reference mars_dataset.py:124-199) would break temporal pairing; a
    contiguous one also keeps val scenes unseen (no shared adjacent frames
    beyond the single boundary).  Symlinks by default (the corpus is
    read-only and large), copies with link=False."""
    import shutil

    frames = _list_frames(src_dir)
    if not frames:
        raise FileNotFoundError(f"no frames under {src_dir}")
    n_val = max(int(round(len(frames) * val_fraction)), 1)
    n_train = len(frames) - n_val
    splits = {"train": frames[:n_train], "val": frames[n_train:]}
    for split, names in splits.items():
        dst_dir = os.path.join(out_dir, source, split)
        os.makedirs(dst_dir, exist_ok=True)
        for name in names:
            src = os.path.abspath(os.path.join(src_dir, name))
            dst = os.path.join(dst_dir, name)
            if os.path.lexists(dst):
                os.remove(dst)
            if link:
                os.symlink(src, dst)
            else:
                shutil.copy2(src, dst)
    return n_train, n_val


def pair_statistics(
    data_path: str,
    sources: Sequence[str] = ("rover", "satellite", "ingenuity"),
    splits: Sequence[str] = ("train", "val"),
    stride: int = 1,
) -> Dict[str, Dict]:
    """Per-(source, split) pairing report: frame count, pair count, and
    whether pairs come from a curated manifest or blind stride pairing."""
    report: Dict[str, Dict] = {}
    for source in sources:
        for split in splits:
            d = os.path.join(data_path, source, split)
            if not os.path.isdir(d):
                continue
            frames = _list_frames(d)
            manifest = load_pair_manifest(d)
            if manifest is not None:
                n_pairs, mode = len(manifest), "manifest"
            else:
                n_pairs, mode = max(len(frames) - stride, 0), "stride"
            report[f"{source}/{split}"] = {
                "frames": len(frames),
                "pairs": n_pairs,
                "pairing": mode,
            }
    return report
