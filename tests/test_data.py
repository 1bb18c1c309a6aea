"""Data pipeline tests: dataset walking, augmentation, loaders, synthetic data."""

import os

import numpy as np
import pytest
from PIL import Image

from monodepth_tpu.data.dataset import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    MarsImageDataset,
    NumpyLoader,
    get_mars_dataloaders,
    organize_dataset,
)
from monodepth_tpu.data.synthetic import mars_style_augment, prepare_synthetic_mars_data


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mars_data")
    rng = np.random.default_rng(0)
    for source in ("rover", "satellite"):
        for split, n in (("train", 6), ("val", 2), ("test", 2)):
            d = root / source / split
            d.mkdir(parents=True)
            for i in range(n):
                arr = (rng.random((40, 50, 3)) * 255).astype(np.uint8)
                Image.fromarray(arr).save(d / f"img_{i}.png")
    return str(root)


def test_dataset_walk_and_item(data_root):
    ds = MarsImageDataset(data_root, "train", height=32, width=48)
    assert len(ds) == 12  # 6 rover + 6 satellite
    item = ds[0]
    assert item["image"].shape == (32, 48, 3)
    assert item["image"].dtype == np.float32
    assert item["metadata"]["source"] in ("rover", "satellite")
    sat = [ds[i] for i in range(len(ds)) if ds.samples[i]["source"] == "satellite"][0]
    assert sat["metadata"]["altitude"] == 400000.0


def test_dataset_normalization(data_root):
    ds = MarsImageDataset(data_root, "val", height=32, width=48, normalize=True)
    raw = MarsImageDataset(data_root, "val", height=32, width=48, normalize=False)
    a = ds[0]["image"]
    b = raw[0]["image"]
    np.testing.assert_allclose(a, (b - IMAGENET_MEAN) / IMAGENET_STD, rtol=1e-5)


def test_corrupt_image_resample(data_root, tmp_path):
    # Write a corrupt file into a fresh split dir
    d = tmp_path / "rover" / "train"
    d.mkdir(parents=True)
    (d / "bad.png").write_bytes(b"not an image")
    arr = (np.random.default_rng(0).random((20, 20, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(d / "good.png")
    ds = MarsImageDataset(str(tmp_path), "train", height=16, width=16)
    # index of corrupt file must still return a valid item (resampled)
    bad_idx = [i for i, s in enumerate(ds.samples) if "bad" in s["path"]][0]
    item = ds[bad_idx]
    assert item["image"].shape == (16, 16, 3)


def test_loader_batching_and_drop_last(data_root):
    ds = MarsImageDataset(data_root, "train", height=32, width=48)
    loader = NumpyLoader(ds, batch_size=5, shuffle=True, drop_last=True)
    batches = list(loader)
    assert len(batches) == 2  # 12 // 5
    assert batches[0]["image"].shape == (5, 32, 48, 3)
    assert len(batches[0]["metadata"]) == 5

    loader2 = NumpyLoader(ds, batch_size=5, shuffle=False, drop_last=False)
    assert sum(b["image"].shape[0] for b in loader2) == 12


def test_get_mars_dataloaders(data_root):
    tr, va, te = get_mars_dataloaders(data_root, batch_size=4, height=32, width=48)
    assert len(tr) == 3 and len(va) == 1 and len(te) == 1


def test_organize_dataset(tmp_path, rng):
    raw = tmp_path / "raw"
    (raw / "rover").mkdir(parents=True)
    for i in range(10):
        arr = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(raw / "rover" / f"r{i}.png")
    counts = organize_dataset(str(raw), str(tmp_path / "organized"))
    assert counts[("rover", "train")] == 8
    assert counts[("rover", "val")] == 1
    assert counts[("rover", "test")] == 1


def test_mars_style_augment(rng):
    img = rng.random((24, 24, 3)).astype(np.float32)
    out = mars_style_augment(img, np.random.default_rng(0))
    assert out.shape == img.shape
    assert out.min() >= 0 and out.max() <= 1
    # red boost: mean red ratio increases vs green
    assert out[..., 0].mean() / max(out[..., 1].mean(), 1e-9) > (
        img[..., 0].mean() / img[..., 1].mean()
    ) * 0.99


def test_prepare_synthetic_mars_data(tmp_path, rng):
    seeds = tmp_path / "seeds"
    seeds.mkdir()
    for i in range(4):
        arr = (rng.random((30, 30, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(seeds / f"s{i}.png")
    n = prepare_synthetic_mars_data(
        str(seeds), str(tmp_path / "synth"), num_variants=2, size=(24, 32)
    )
    assert n == 8
    ds = MarsImageDataset(str(tmp_path / "synth"), "train", height=24, width=32,
                          sources=("rover",))
    assert len(ds) >= 5  # 80% of 8
    assert ds[0]["image"].shape == (24, 32, 3)


def test_get_mars_dataloaders_source_type(data_root):
    from monodepth_tpu.data.dataset import get_mars_dataloaders

    tr, _, _ = get_mars_dataloaders(data_root, batch_size=2, height=32, width=48,
                                    source_type="rover")
    sources = set()
    for b in tr:
        sources.update(m["source"] for m in b["metadata"])
    assert sources == {"rover"}
    tr2, _, _ = get_mars_dataloaders(data_root, batch_size=2, height=32, width=48,
                                     source_type="mixed")
    sources2 = set()
    for b in tr2:
        sources2.update(m["source"] for m in b["metadata"])
    assert sources2 == {"rover", "satellite"}
