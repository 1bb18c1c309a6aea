"""Grain-based input pipeline — the production alternative to
`data.dataset.NumpyLoader`'s fork-pool (ROADMAP round-3 item 2).

Google Grain is the TPU-idiomatic host input stack: deterministic
per-record RNG (results independent of worker count, matching the
NumpyLoader contract), checkpointable iterators, and process-pool workers
managed by the library instead of our own fork pool.

`GrainLoader` yields batches in the exact NumpyLoader format —
{'image': [B, H, W, 3] float32, 'metadata': list of dicts} — so the
training stack (`train/adapter.py`) can swap loaders with a flag
(`get_mars_dataloaders(backend='grain')`).

Sharding semantics: grain shards the *index stream* via ShardOptions
(round-robin over the epoch order), unlike NumpyLoader's
rows-of-every-global-batch split.  Both give each host a disjoint,
complete 1/N of the data; only the row->host assignment differs — fine
for training, documented here for anyone comparing batches across the
two backends.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

__all__ = ["GrainLoader", "GrainBatchIterator", "grain_available"]


def grain_available() -> bool:
    try:
        import grain.python  # noqa: F401

        return True
    except Exception:  # pragma: no cover - env-dependent
        return False


class _DecodeAugmentSource:
    """Grain RandomAccessDataSource over MarsImageDataset records.

    Decode happens in `__getitem__` (runs in grain worker processes);
    augmentation randomness is applied later by `_AugmentTransform` with
    grain's per-record generator so results are worker-count independent.
    """

    def __init__(self, dataset):
        self._ds = dataset

    def __len__(self) -> int:
        return len(self._ds)

    def __getitem__(self, index: int):
        return int(index)  # defer decode to the transform (needs the rng)

    def __repr__(self) -> str:
        # grain validates repr(data_source) when restoring iterator state;
        # the default repr embeds the object address and would reject every
        # cross-process resume.  Identify the source by its stable CONTENTS
        # — record count alone would accept a resume against a different
        # dataset of the same length, silently training on wrong data with
        # a stale shuffle order; fingerprint the record paths instead.
        import hashlib
        import os

        root = getattr(self._ds, "data_path", "")
        paths = "\n".join(
            os.path.relpath(s["path"], root) if root else s["path"]
            for s in getattr(self._ds, "samples", []))
        digest = hashlib.sha1(paths.encode()).hexdigest()[:12]
        return (f"_DecodeAugmentSource(num_records={len(self._ds)}, "
                f"fingerprint={digest})")


def _make_load_transform(dataset):
    """grain RandomMapTransform: decode + augment + normalize one record
    with the per-record np.random.Generator grain supplies (derived from
    (seed, record) — deterministic for any worker count).  Built lazily so
    importing this module never requires grain."""
    import grain.python as pygrain

    class _LoadTransform(pygrain.RandomMapTransform):
        def __init__(self, ds):
            self._ds = ds

        def random_map(self, index: int, rng: np.random.Generator):
            item = self._ds.get(int(index), rng=rng)
            meta = item["metadata"]
            return {
                "image": item["image"],
                "source": meta["source"],
                "path": meta["path"],
                "altitude": np.float32(meta["altitude"]),
            }

    return _LoadTransform(dataset)


class GrainLoader:
    """NumpyLoader-compatible batched loader on grain.python.DataLoader."""

    def __init__(self, dataset, batch_size: int, shuffle: bool,
                 drop_last: bool, seed: int = 0, num_workers: int = 0,
                 shard_index: int = 0, shard_count: int = 1):
        import grain.python as pygrain

        assert 0 <= shard_index < shard_count
        assert batch_size % shard_count == 0, (
            f"global batch {batch_size} not divisible by {shard_count} hosts")
        self.dataset = dataset
        self.batch_size = batch_size
        self.local_batch_size = batch_size // shard_count
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._pygrain = pygrain
        self._sampler_kw = dict(
            num_records=len(dataset),
            shard_options=pygrain.ShardOptions(
                shard_index=shard_index, shard_count=shard_count,
                drop_remainder=drop_last),
            shuffle=shuffle,
            seed=seed,
        )
        # Batching happens in __iter__, NOT via pygrain.Batch: an in-pipeline
        # Batch op batches per worker, so batch composition and drop_remainder
        # semantics would change with worker count; record-level parallelism
        # keeps the sampler order (grain guarantees ordered, deterministic
        # output) and our own batching preserves the NumpyLoader contract.
        self._loader_kw = dict(
            data_source=_DecodeAugmentSource(dataset),
            operations=[_make_load_transform(dataset)],
            worker_count=num_workers,
        )
        self._epoch = 0

    def __len__(self):
        so = self._sampler_kw["shard_options"]
        n = len(self.dataset)
        if self.drop_last:
            per_host = n // so.shard_count
            return per_host // self.local_batch_size
        # drop_remainder=False: grain's round-robin gives low shard indices
        # the remainder records (ceil), not floor — len() must match
        per_host = n // so.shard_count + (
            1 if so.shard_index < n % so.shard_count else 0)
        return (per_host + self.local_batch_size - 1) // self.local_batch_size

    def _make_record_iter(self, epoch: int):
        pygrain = self._pygrain
        sampler = pygrain.IndexSampler(
            num_epochs=1, **{**self._sampler_kw,
                             "seed": self._sampler_kw["seed"] + epoch})
        return iter(pygrain.DataLoader(sampler=sampler, **self._loader_kw))

    @staticmethod
    def _emit(records):
        return {
            "image": np.stack([r["image"] for r in records]).astype(
                np.float32),
            "metadata": [
                {"source": str(r["source"]), "path": str(r["path"]),
                 "altitude": float(r["altitude"])}
                for r in records
            ],
        }

    def __iter__(self):
        if len(self.dataset) == 0:
            return  # empty split: yield nothing (NumpyLoader contract)
        it = self._make_record_iter(self._epoch)
        self._epoch += 1
        pending = []
        for record in it:
            pending.append(record)
            if len(pending) == self.local_batch_size:
                yield self._emit(pending)
                pending = []
        if pending and not self.drop_last:
            yield self._emit(pending)

    def checkpointable_iter(self, epoch: int = 0,
                            state: Optional[dict] = None):
        """Batch iterator with mid-epoch checkpoint/resume
        (`GrainBatchIterator.get_state()` -> JSON-able dict; pass it back as
        `state` to resume exactly after the last emitted batch).  This is
        the production data-state story the fork-pool loader cannot offer:
        a preempted fine-tune resumes without replaying or skipping data.
        """
        return GrainBatchIterator(self, epoch, state)


class GrainBatchIterator:
    """Checkpointable batched iterator over a GrainLoader epoch.

    State snapshots are taken at batch boundaries: {"epoch": int,
    "grain": hex-encoded grain DataLoaderIterator state}.  Restoring with
    set_state / the `state` constructor arg continues with the batch after
    the last one consumed before the snapshot.
    """

    def __init__(self, loader: GrainLoader, epoch: int = 0,
                 state: Optional[dict] = None):
        self._loader = loader
        self._epoch = epoch
        if state is not None:
            self._epoch = int(state["epoch"])
        self._it = loader._make_record_iter(self._epoch)
        if state is not None:
            self._it.set_state(bytes.fromhex(state["grain"]))

    def __iter__(self):
        return self

    def __next__(self):
        records = []
        while len(records) < self._loader.local_batch_size:
            try:
                records.append(next(self._it))
            except StopIteration:
                break
        if not records or (self._loader.drop_last
                           and len(records) < self._loader.local_batch_size):
            raise StopIteration
        return GrainLoader._emit(records)

    def get_state(self) -> dict:
        return {"epoch": self._epoch, "grain": self._it.get_state().hex()}

    def set_state(self, state: dict):
        self._epoch = int(state["epoch"])
        self._it = self._loader._make_record_iter(self._epoch)
        self._it.set_state(bytes.fromhex(state["grain"]))
