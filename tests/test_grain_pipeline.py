"""Grain input pipeline (data/grain_pipeline.py): NumpyLoader-format
batches, epoch coverage, shard disjointness, worker-count independence."""

import numpy as np
import pytest
from PIL import Image

from monodepth_tpu.data.dataset import MarsImageDataset, get_mars_dataloaders
from monodepth_tpu.data.grain_pipeline import GrainLoader, grain_available

pytestmark = pytest.mark.skipif(not grain_available(),
                                reason="grain not installed")


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("grain_data")
    rng = np.random.default_rng(0)
    for split, n in (("train", 12), ("val", 4)):
        d = root / "rover" / split
        d.mkdir(parents=True)
        for i in range(n):
            arr = (rng.random((24, 30, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"img_{i:02d}.png")
    return str(root)


def _ds(data_root, split="train"):
    return MarsImageDataset(data_root, split, height=16, width=20,
                            sources=("rover",))


def test_batch_format_matches_numpy_loader(data_root):
    loader = GrainLoader(_ds(data_root), batch_size=4, shuffle=True,
                         drop_last=True, seed=3)
    batches = list(loader)
    assert len(batches) == len(loader) == 3
    for b in batches:
        assert b["image"].shape == (4, 16, 20, 3)
        assert b["image"].dtype == np.float32
        assert len(b["metadata"]) == 4
        m = b["metadata"][0]
        assert m["source"] == "rover"
        assert isinstance(m["path"], str) and m["path"].endswith(".png")
        assert m["altitude"] == 0.0


def test_epoch_coverage_and_reshuffle(data_root):
    loader = GrainLoader(_ds(data_root), batch_size=4, shuffle=True,
                         drop_last=False, seed=5)
    e0 = [m["path"] for b in loader for m in b["metadata"]]
    e1 = [m["path"] for b in loader for m in b["metadata"]]
    assert sorted(e0) == sorted(e1)  # full coverage each epoch
    assert len(set(e0)) == 12
    assert e0 != e1  # reshuffled across epochs


def test_shards_disjoint_and_equal(data_root):
    paths = []
    for si in (0, 1):
        loader = GrainLoader(_ds(data_root), batch_size=4, shuffle=True,
                             drop_last=True, seed=3,
                             shard_index=si, shard_count=2)
        assert loader.local_batch_size == 2
        rows = [m["path"] for b in loader for m in b["metadata"]]
        for b in GrainLoader(_ds(data_root), batch_size=4, shuffle=True,
                             drop_last=True, seed=3,
                             shard_index=si, shard_count=2):
            assert b["image"].shape[0] == 2
        paths.append(rows)
    assert not set(paths[0]) & set(paths[1])
    assert len(paths[0]) == len(paths[1]) == 6


def test_worker_count_independence(data_root):
    """Grain's per-record RNG makes results identical for any worker count
    (the NumpyLoader contract, held by the library here)."""
    serial = list(GrainLoader(_ds(data_root), batch_size=4, shuffle=True,
                              drop_last=True, seed=7, num_workers=0))
    pooled = list(GrainLoader(_ds(data_root), batch_size=4, shuffle=True,
                              drop_last=True, seed=7, num_workers=2))
    assert len(serial) == len(pooled)
    for sb, pb in zip(serial, pooled):
        np.testing.assert_array_equal(sb["image"], pb["image"])
        assert [m["path"] for m in sb["metadata"]] == \
               [m["path"] for m in pb["metadata"]]


def test_checkpointable_iter_mid_epoch_resume(data_root):
    """Mid-epoch data-state checkpoint/resume: snapshot after batch k,
    restore into a FRESH iterator, and get exactly batches k+1... — the
    data half of preemption-safe training."""
    import json

    loader = GrainLoader(_ds(data_root), batch_size=4, shuffle=True,
                         drop_last=True, seed=9)
    it = loader.checkpointable_iter(epoch=2)
    first = next(it)
    state = it.get_state()
    state = json.loads(json.dumps(state))  # survives JSON round-trip
    rest = [b for b in it]

    it2 = loader.checkpointable_iter(state=state)
    resumed = [b for b in it2]
    assert len(resumed) == len(rest) == 2
    for a, b in zip(rest, resumed):
        np.testing.assert_array_equal(a["image"], b["image"])
        assert [m["path"] for m in a["metadata"]] == \
               [m["path"] for m in b["metadata"]]
    # no overlap with the consumed batch
    consumed = {m["path"] for m in first["metadata"]}
    seen = {m["path"] for b in resumed for m in b["metadata"]}
    assert not consumed & seen


def test_resume_rejects_different_dataset_of_same_length(data_root,
                                                         tmp_path_factory):
    """The data-source fingerprint (record paths) guards resume integrity:
    restoring a loader state against a DIFFERENT dataset that happens to
    have the same record count must fail loudly, not silently continue on
    wrong data with a stale shuffle order."""
    loader = GrainLoader(_ds(data_root), batch_size=4, shuffle=True,
                         drop_last=True, seed=9)
    it = loader.checkpointable_iter(epoch=0)
    next(it)
    state = it.get_state()

    other_root = tmp_path_factory.mktemp("grain_other")
    rng = np.random.default_rng(1)
    d = other_root / "rover" / "train"
    d.mkdir(parents=True)
    for i in range(12):  # same length, different records
        arr = (rng.random((24, 30, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"other_{i:02d}.png")
    other = GrainLoader(_ds(str(other_root)), batch_size=4, shuffle=True,
                        drop_last=True, seed=9)
    with pytest.raises(ValueError, match="[Dd]ata\\s?[Ss]ource"):
        other.checkpointable_iter(state=state)

    # while the SAME dataset still restores across a fresh loader object
    same = GrainLoader(_ds(data_root), batch_size=4, shuffle=True,
                       drop_last=True, seed=9)
    assert next(same.checkpointable_iter(state=state)) is not None


def test_get_mars_dataloaders_grain_backend(data_root):
    tr, va, te = get_mars_dataloaders(data_root, batch_size=4, height=16,
                                      width=20, sources=("rover",),
                                      backend="grain")
    assert isinstance(tr, GrainLoader)
    b = next(iter(tr))
    assert b["image"].shape == (4, 16, 20, 3)
    assert len(list(va)) >= 1
