"""Mars terrain image dataset + batched loader (capability of reference
data/mars_dataset.py).

- `MarsImageDataset` walks `{data_path}/{rover,satellite}/{split}`
  (reference mars_dataset.py:44-70), resizes to (H, W), scales to [0, 1] and
  applies ImageNet normalization (:75-79); training adds color jitter and
  random horizontal flips (:83-86).  Corrupt images are re-sampled randomly
  (:98-103).  Items are {'image' [H, W, 3] float32 NHWC, 'metadata':
  {source, path, altitude}}.
- `organize_dataset` shuffles and splits raw folders 80-10-10 (:124-199).
- `get_mars_dataloaders` returns train/val/test loaders (:201-236).  The
  loader is a thread-prefetched numpy batcher (the JAX-idiomatic replacement
  for torch DataLoader workers) yielding device-ready NHWC batches.
"""

from __future__ import annotations

import os
import queue
import random
import shutil
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

__all__ = [
    "MarsImageDataset",
    "MarsSequenceDataset",
    "NumpyLoader",
    "get_mars_dataloaders",
    "organize_dataset",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

_EXTS = (".png", ".jpg", ".jpeg")


def hue_shift(img: np.ndarray, shift: float) -> np.ndarray:
    """Rotate hue of an [H, W, 3] image in [0, 1] by `shift` (fraction of the
    color circle, torchvision ColorJitter(hue=...) semantics: RGB -> HSV,
    h += shift mod 1, HSV -> RGB).  Vectorized colorsys."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = img.max(axis=-1)
    minc = img.min(axis=-1)
    v = maxc
    c = maxc - minc
    s = np.where(maxc > 0, c / np.where(maxc == 0, 1.0, maxc), 0.0)
    safe_c = np.where(c == 0, 1.0, c)
    rc = (maxc - r) / safe_c
    gc = (maxc - g) / safe_c
    bc = (maxc - b) / safe_c
    h = np.where(
        maxc == r, bc - gc,
        np.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = np.where(c == 0, 0.0, (h / 6.0) % 1.0)
    h = (h + shift) % 1.0
    i = np.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(np.int32) % 6
    out = np.empty_like(img)
    out[..., 0] = np.choose(i, [v, q, p, p, t, v])
    out[..., 1] = np.choose(i, [t, v, v, q, p, p])
    out[..., 2] = np.choose(i, [p, p, t, v, v, q])
    return out


class MarsImageDataset:
    """Source-typed Mars image dataset with train-time augmentation."""

    def __init__(
        self,
        data_path: str,
        split: str = "train",
        height: int = 384,
        width: int = 512,
        sources: Tuple[str, ...] = ("rover", "satellite"),
        is_train: Optional[bool] = None,
        normalize: bool = True,
        seed: int = 0,
        cache_decoded: bool = False,
    ):
        self.data_path = data_path
        self.split = split
        self.height = height
        self.width = width
        self.is_train = (split == "train") if is_train is None else is_train
        self.normalize = normalize
        self._rng = np.random.default_rng(seed)
        # Small-corpus epochs are decode-bound (the Mars assets are ~2.5 MB
        # PNGs re-read every epoch); cache the resized u8 arrays in RAM.
        # Augmentation/normalization still run per access.  Use with
        # num_workers=0 (forked workers would each hold a cold copy).
        self._decode_cache: Optional[Dict[int, np.ndarray]] = (
            {} if cache_decoded else None)

        self.samples: List[Dict] = []
        for source in sources:
            split_dir = os.path.join(data_path, source, split)
            if not os.path.isdir(split_dir):
                continue
            for name in sorted(os.listdir(split_dir)):
                if name.lower().endswith(_EXTS):
                    self.samples.append(
                        {
                            "path": os.path.join(split_dir, name),
                            "source": source,
                            # default altitudes mirror scripts/test_mars_depth.py:123-136
                            "altitude": 400000.0 if source == "satellite" else 0.0,
                        }
                    )

    def __len__(self):
        return len(self.samples)

    # ----------------------------------------------------------- loading
    def _load(self, index: int) -> np.ndarray:
        if self._decode_cache is not None and index in self._decode_cache:
            return self._decode_cache[index].astype(np.float32) / 255.0
        path = self.samples[index]["path"]
        img = Image.open(path).convert("RGB")
        arr = np.asarray(img, dtype=np.uint8)
        if arr.shape[:2] != (self.height, self.width):
            from monodepth_tpu import native

            # C++ fast path when built; numpy fallback otherwise.
            arr = native.resize_bilinear_u8(arr, self.height, self.width)
        if self._decode_cache is not None:
            self._decode_cache[index] = arr
        return arr.astype(np.float32) / 255.0

    def _sample_aug(self, r) -> Dict:
        """Draw one set of jitter parameters (so a frame PAIR can share the
        exact same augmentation — photometric losses compare frames and a
        per-frame jitter would register as fake appearance change)."""
        return {
            "brightness": 1 + (r.random() - 0.5) * 0.4,
            "contrast": 1 + (r.random() - 0.5) * 0.4,
            "saturation": 1 + (r.random() - 0.5) * 0.4,
            "hue": (r.random() - 0.5) * 0.2,
            "flip": r.random() < 0.5,
        }

    @staticmethod
    def _apply_aug(img: np.ndarray, aug: Dict) -> np.ndarray:
        img = img * aug["brightness"]
        mean = img.mean()
        img = (img - mean) * aug["contrast"] + mean
        gray = img.mean(axis=-1, keepdims=True)
        img = gray + (img - gray) * aug["saturation"]
        img = np.clip(img, 0.0, 1.0)
        img = hue_shift(img, aug["hue"])
        if aug["flip"]:
            img = img[:, ::-1, :]
        return np.ascontiguousarray(img)

    def _augment(self, img: np.ndarray, rng=None) -> np.ndarray:
        """Color jitter (brightness/contrast/saturation ±0.2, hue ±0.1) +
        horizontal flip (reference mars_dataset.py:83-86).  The C++
        `md_mars_augment_f32` is the *synthetic-data* Mars-tint variant
        (mars_finetune.py:117-138 semantics), not this training jitter."""
        r = rng if rng is not None else self._rng
        return self._apply_aug(img, self._sample_aug(r))

    def get(self, index: int, rng=None) -> Dict:
        """Load one item; `rng` (optional np.random.Generator) makes the
        augmentation/resample stream deterministic per item — required for
        worker-count-independent results in the multiprocess loader."""
        r = rng if rng is not None else self._rng
        for _ in range(10):
            try:
                img = self._load(index)
                break
            except Exception:
                # corrupt image -> random resample (reference :98-103)
                index = int(r.integers(len(self.samples)))
        else:
            raise RuntimeError("too many corrupt images in dataset")

        if self.is_train:
            img = self._augment(img, rng=rng)
        if self.normalize:
            img = (img - IMAGENET_MEAN) / IMAGENET_STD

        meta = self.samples[index]
        return {
            "image": img.astype(np.float32),
            "metadata": {
                "source": meta["source"],
                "path": meta["path"],
                "altitude": meta["altitude"],
            },
        }

    def __getitem__(self, index: int) -> Dict:
        return self.get(index)


class MarsSequenceDataset(MarsImageDataset):
    """Consecutive-frame pairs for sequence self-supervision
    (TrainConfig.loss_mode='sequence').

    Pairing rule: a directory with a curated `pairs.json` manifest
    (data/pairing.py — written by `build_pair_manifest` / the
    `make_sequence_pairs` CLI, gating pairs on timestamp gap + visual
    correlation) uses exactly those (target, source) pairs.  Otherwise,
    within each `{data_path}/{source}/{split}` directory, sorted filename
    order is treated as temporal order (the convention of rover/ingenuity
    frame dumps) and frames `i` and `i + stride` form one (target, source)
    pair.  Items are {'image': [H, W, 6] float32 — target and source
    stacked on channels, the monodepth2 pose-net input layout — 'metadata':
    the TARGET frame's metadata}.

    Both frames receive the IDENTICAL augmentation draw (same jitter, same
    flip): the photometric loss compares the two frames, so independent
    jitter would present appearance change as parallax.
    """

    def __init__(self, *args, stride: int = 1, **kwargs):
        super().__init__(*args, **kwargs)
        assert stride >= 1
        from monodepth_tpu.data.pairing import load_pair_manifest

        by_dir: Dict[str, List[Dict]] = {}
        for s in self.samples:
            by_dir.setdefault(os.path.dirname(s["path"]), []).append(s)

        self.samples = []
        for d, frames in by_dir.items():
            manifest = load_pair_manifest(d)
            if manifest is not None:
                by_name = {os.path.basename(s["path"]): s for s in frames}
                for tgt, src in manifest:
                    if tgt not in by_name or src not in by_name:
                        continue
                    item = dict(by_name[tgt])
                    item["source_path"] = by_name[src]["path"]
                    self.samples.append(item)
                continue
            for a, b in zip(frames, frames[stride:]):
                item = dict(a)
                item["source_path"] = b["path"]
                self.samples.append(item)

    def _load_path(self, path: str) -> np.ndarray:
        img = Image.open(path).convert("RGB")
        arr = np.asarray(img, dtype=np.uint8)
        if arr.shape[:2] != (self.height, self.width):
            from monodepth_tpu import native

            arr = native.resize_bilinear_u8(arr, self.height, self.width)
        return arr.astype(np.float32) / 255.0

    def get(self, index: int, rng=None) -> Dict:
        r = rng if rng is not None else self._rng
        for _ in range(10):
            meta = self.samples[index]
            try:
                target = self._load_path(meta["path"])
                source = self._load_path(meta["source_path"])
                break
            except Exception:
                index = int(r.integers(len(self.samples)))
        else:
            raise RuntimeError("too many corrupt images in dataset")

        if self.is_train:
            aug = self._sample_aug(r)
            target = self._apply_aug(target, aug)
            source = self._apply_aug(source, aug)
        if self.normalize:
            target = (target - IMAGENET_MEAN) / IMAGENET_STD
            source = (source - IMAGENET_MEAN) / IMAGENET_STD

        return {
            "image": np.concatenate([target, source], axis=-1).astype(np.float32),
            "metadata": {
                "source": meta["source"],
                "path": meta["path"],
                "altitude": meta["altitude"],
            },
        }


# Worker-process state for the multiprocess decode pool (fork start method:
# the dataset object is inherited; the initializer just records it).
_WORKER_DATASET = None


def _pool_init(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _pool_get(args):
    index, item_seed = args
    return _WORKER_DATASET.get(index, rng=np.random.default_rng(item_seed))


class NumpyLoader:
    """Prefetched numpy batch loader (drop_last on train).

    Yields {'image': [B, H, W, 3] float32, 'metadata': list of dicts}.

    - `num_workers > 0` decodes/augments in a forked process pool (the torch
      DataLoader-workers equivalent, reference mars_dataset.py:229-236) with
      `prefetch` batches in flight; 0 = in-process with a prefetch thread.
      Per-item RNG is derived from (seed, epoch, position), so results are
      identical for every worker count.
    - `shard_index`/`shard_count` select this host's rows of every *global*
      batch for multi-host data parallelism (`batch_size` stays the global
      size; each host yields batch_size/shard_count rows, same order on all
      hosts).
    """

    def __init__(self, dataset: MarsImageDataset, batch_size: int,
                 shuffle: bool, drop_last: bool, prefetch: int = 2, seed: int = 0,
                 num_workers: int = 0, shard_index: int = 0, shard_count: int = 1):
        assert 0 <= shard_index < shard_count
        assert batch_size % shard_count == 0, (
            f"global batch {batch_size} not divisible by {shard_count} hosts")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_workers = num_workers
        self.shard_index = shard_index
        self.shard_count = shard_count
        self._epoch = 0
        self._seed = seed

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        full, tail = divmod(n, self.batch_size)
        # a tail smaller than the host count cannot be split without
        # duplication and is dropped on ALL hosts (_index_batches) — len()
        # must agree with what iteration actually yields
        return full + (1 if tail >= self.shard_count and tail else 0)

    @property
    def local_batch_size(self):
        return self.batch_size // self.shard_count

    def _index_batches(self):
        """Yield (global positions, indices) for this host's shard of every
        global batch."""
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self._seed + self._epoch).shuffle(order)
        end = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, end, self.batch_size):
            idx = order[start:start + self.batch_size]
            if len(idx) == self.batch_size:
                per = self.local_batch_size
                lo = self.shard_index * per
            else:
                # ragged final batch (drop_last=False): exact disjoint split —
                # host i takes base+1 rows for i < rem, base otherwise, so
                # the union over hosts covers every row exactly once.  A tail
                # smaller than the host count cannot be split without
                # duplication and is dropped on ALL hosts (keeps per-host
                # batch counts equal; multi-host training should use
                # drop_last=True anyway).
                m = len(idx)
                if m < self.shard_count:
                    continue
                base, rem = divmod(m, self.shard_count)
                per = base + (1 if self.shard_index < rem else 0)
                lo = self.shard_index * base + min(self.shard_index, rem)
            shard = idx[lo:lo + per]
            if len(shard) == 0:
                continue
            yield np.arange(start + lo, start + lo + len(shard)), shard

    def _collate(self, items):
        # stack every ndarray key (e.g. 'depth' targets from
        # MarsRenderedDepthDataset ride along with 'image')
        out = {"metadata": [it["metadata"] for it in items]}
        for key, value in items[0].items():
            if isinstance(value, np.ndarray):
                out[key] = np.stack([it[key] for it in items])
        return out

    def _item_seed(self, position: int, epoch: int) -> int:
        # deterministic per (seed, epoch, global position in the epoch order)
        return (self._seed * 1_000_003 + epoch * 7919 + int(position)) & 0x7FFFFFFF

    def _batches_serial(self):
        epoch = self._epoch
        for positions, idx in self._index_batches():
            items = [
                self.dataset.get(
                    int(i), rng=np.random.default_rng(self._item_seed(p, epoch)))
                for p, i in zip(positions, idx)
            ]
            yield self._collate(items)
        self._epoch += 1

    def _get_pool(self):
        """Lazily-created PERSISTENT worker pool: forking a JAX-loaded
        process costs ~0.5 s per worker, so a per-epoch pool capped short
        training epochs at ~30 img/s; reused across epochs the decode rate
        is bounded by PIL throughput only."""
        if getattr(self, "_pool", None) is None:
            import multiprocessing as mp

            ctx = mp.get_context("fork")
            self._pool = ctx.Pool(self.num_workers, initializer=_pool_init,
                                  initargs=(self.dataset,))
        return self._pool

    def close(self):
        """Terminate the worker pool (idempotent)."""
        pool = getattr(self, "_pool", None)
        if pool is not None:
            self._pool = None
            pool.terminate()
            pool.join()

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass

    def _iter_multiprocess(self):
        from collections import deque

        epoch = self._epoch
        batches = list(self._index_batches())
        self._epoch += 1
        pool = self._get_pool()
        pending: deque = deque()
        depth = max(self.prefetch, 1)

        def submit(j):
            positions, idx = batches[j]
            args = [(int(i), self._item_seed(p, epoch))
                    for p, i in zip(positions, idx)]
            pending.append(pool.map_async(_pool_get, args))

        for j in range(min(depth, len(batches))):
            submit(j)
        for j in range(len(batches)):
            if j + depth < len(batches):
                submit(j + depth)
            yield self._collate(pending.popleft().get())

    def __iter__(self):
        if self.num_workers > 0:
            yield from self._iter_multiprocess()
            return
        if self.prefetch <= 0:
            yield from self._batches_serial()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()

        def worker():
            # exceptions must surface in the CONSUMER: a silently-dead worker
            # would end the epoch early and training would continue on
            # partial data with no error
            try:
                for batch in self._batches_serial():
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # noqa: BLE001 - re-raised by consumer
                _drain_put(q, ("__error__", e))
                return
            _drain_put(q, sentinel)

        def _drain_put(qq, item):
            # guaranteed-progress put: drop one stale entry if full (the
            # consumer is gone or slow; sentinel/error must not block forever)
            while True:
                try:
                    qq.put_nowait(item)
                    return
                except queue.Full:
                    try:
                        qq.get_nowait()
                    except queue.Empty:
                        pass

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                if (isinstance(item, tuple) and len(item) == 2
                        and item[0] == "__error__"):
                    raise item[1]
                yield item
        finally:
            # consumer stopped early (break / GeneratorExit): release the
            # producer so it does not block forever on a full queue
            stop.set()


def organize_dataset(raw_dir: str, out_dir: str,
                     sources: Tuple[str, ...] = ("rover", "satellite"),
                     splits=(0.8, 0.1, 0.1), seed: int = 42):
    """Shuffle/split raw per-source folders into train/val/test
    (reference mars_dataset.py:124-199)."""
    rng = random.Random(seed)
    counts = {}
    for source in sources:
        src_dir = os.path.join(raw_dir, source)
        if not os.path.isdir(src_dir):
            continue
        files = [f for f in sorted(os.listdir(src_dir))
                 if f.lower().endswith(_EXTS)]
        rng.shuffle(files)
        n = len(files)
        n_train = int(n * splits[0])
        n_val = int(n * splits[1])
        buckets = {
            "train": files[:n_train],
            "val": files[n_train:n_train + n_val],
            "test": files[n_train + n_val:],
        }
        for split, names in buckets.items():
            dst = os.path.join(out_dir, source, split)
            os.makedirs(dst, exist_ok=True)
            for name in names:
                shutil.copy2(os.path.join(src_dir, name), os.path.join(dst, name))
            counts[(source, split)] = len(names)
    return counts


def get_mars_dataloaders(data_path: str, batch_size: int = 8, height: int = 384,
                         width: int = 512, sources=("rover", "satellite"),
                         prefetch: int = 2, seed: int = 0,
                         source_type: Optional[str] = None,
                         num_workers: int = 0,
                         shard_index: int = 0, shard_count: int = 1,
                         backend: str = "numpy", sequence: bool = False,
                         rendered: bool = False, render_length: int = 512,
                         render_texture_dir: Optional[str] = None):
    """Train/val/test loaders (reference mars_dataset.py:201-236).

    `source_type` accepts the reference adapter's convention
    (mars_adapter.py:42): 'mixed' (all sources), or a single source name.
    `num_workers` enables the multiprocess decode pool; `shard_index`/
    `shard_count` select this host's rows for multi-host DP (batch_size is
    the global batch).  `backend`: 'numpy' (NumpyLoader fork pool) or
    'grain' (Google Grain pipeline, data/grain_pipeline.py).
    `sequence=True` yields consecutive-frame pairs ([H, W, 6] items,
    MarsSequenceDataset) for loss_mode='sequence'.
    `rendered=True` yields procedurally rendered (image, depth) items
    (data/procedural.MarsRenderedDepthDataset, `render_length` train
    scenes) for loss_mode='supervised'; `data_path` is unused then.
    """
    if source_type == "mixed":
        # the reference adapter's 'mixed' convention (mars_adapter.py:42)
        # means every source, including ingenuity
        sources = ("rover", "satellite", "ingenuity")
    elif source_type is not None:
        sources = (source_type,)
    if rendered and backend == "grain":
        raise ValueError("rendered (supervised) datasets use the numpy "
                         "loader backend")
    ds_cls = MarsSequenceDataset if sequence else MarsImageDataset
    loaders = {}
    for split in ("train", "val", "test"):
        if rendered:
            from monodepth_tpu.data.procedural import MarsRenderedDepthDataset

            # disjoint scene streams per split: the val/test seeds are
            # offset past any index the train stream can reach
            split_ix = ("train", "val", "test").index(split)
            ds = MarsRenderedDepthDataset(
                length=(render_length if split == "train"
                        else max(8, render_length // 16)),
                height=height, width=width,
                seed=seed + split_ix * 100_003 + 1,
                texture_dir=render_texture_dir)
            ds.is_train = split == "train"  # no flip aug on val/test
        else:
            ds = ds_cls(data_path, split, height, width, sources, seed=seed)
        common = dict(
            shuffle=(split == "train"),
            drop_last=(split == "train"),
            seed=seed,
            num_workers=num_workers,
            shard_index=shard_index,
            shard_count=shard_count,
        )
        if backend == "grain":
            from monodepth_tpu.data.grain_pipeline import GrainLoader

            loaders[split] = GrainLoader(ds, batch_size, **common)
        else:
            assert backend == "numpy", f"unknown loader backend {backend!r}"
            loaders[split] = NumpyLoader(ds, batch_size, prefetch=prefetch,
                                         **common)
    return loaders["train"], loaders["val"], loaders["test"]
