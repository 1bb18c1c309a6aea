"""C++ native runtime tests: build, bindings, parity with numpy/PIL paths."""

import numpy as np
import pytest

from monodepth_tpu import native


def test_native_library_builds_and_loads():
    assert native.available(), "C++ library failed to build/load"


def test_resize_matches_torch_convention(rng):
    import torch
    import torch.nn.functional as F

    img = (rng.random((37, 53, 3)) * 255).astype(np.uint8)
    out = native.resize_bilinear_u8(img, 64, 96)
    assert out.shape == (64, 96, 3)
    want = (
        F.interpolate(
            torch.from_numpy(img.astype(np.float32)).permute(2, 0, 1)[None],
            size=(64, 96), mode="bilinear", align_corners=False,
        )[0].permute(1, 2, 0).numpy()
    )
    # uint8 rounding: allow off-by-one
    assert np.abs(out.astype(np.int32) - (want + 0.5).astype(np.int32)).max() <= 1


def test_normalize_matches_numpy(rng):
    img = (rng.random((20, 30, 3)) * 255).astype(np.uint8)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    got = native.normalize_u8(img, mean, std)
    want = (img.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mars_augment_inplace(rng):
    img = rng.random((32, 32, 3), dtype=np.float32)
    img = np.ascontiguousarray(img)
    before = img.copy()
    native.mars_augment_(img, seed=42)
    assert not np.allclose(img, before)
    assert img.min() >= 0.0 and img.max() <= 1.0
    # deterministic per seed
    img2 = np.ascontiguousarray(before.copy())
    native.mars_augment_(img2, seed=42)
    np.testing.assert_array_equal(img, img2)


def test_write_ply_roundtrip(tmp_path, rng):
    pts = rng.random((100, 3)).astype(np.float32)
    colors = (rng.random((100, 3)) * 255).astype(np.uint8)
    path = str(tmp_path / "native.ply")
    native.write_ply(path, pts, colors)
    raw = open(path, "rb").read()
    header, _, body = raw.partition(b"end_header\n")
    assert b"element vertex 100" in header
    rec = np.frombuffer(body, dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)])
    np.testing.assert_allclose(rec["xyz"], pts, rtol=1e-6)
    np.testing.assert_array_equal(rec["rgb"], colors)


def test_write_ply_no_colors(tmp_path, rng):
    pts = rng.random((10, 3)).astype(np.float32)
    path = str(tmp_path / "plain.ply")
    native.write_ply(path, pts)
    raw = open(path, "rb").read()
    _, _, body = raw.partition(b"end_header\n")
    np.testing.assert_allclose(
        np.frombuffer(body, dtype="<f4").reshape(-1, 3), pts, rtol=1e-6
    )
