"""End-to-end CLI tests on small synthetic images (SURVEY.md §4 item 3)."""

import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("images")
    rng = np.random.default_rng(0)
    for name in ["rover_test.png", "satellite_view.jpg"]:
        arr = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / name)
    return d


def test_run_mars_depth_standard(image_dir, tmp_path):
    from monodepth_tpu.cli.run_mars_depth import main

    out = tmp_path / "out"
    rc = main([
        "--input", str(image_dir / "rover_test.png"),
        "--output_dir", str(out),
        "--max_size", "64",
        "--benchmark",
    ])
    assert rc == 0
    result_dir = out / "rover_test"
    assert (result_dir / "rover_test_depth_standard.png").exists()
    depth = np.load(result_dir / "rover_test_depth.npy")
    assert depth.shape == (48, 64)
    assert np.isfinite(depth).all()
    assert (depth > 0).all()
    assert (out / "benchmark.json").exists()


def test_run_mars_depth_directory_enhanced(image_dir, tmp_path):
    from monodepth_tpu.cli.run_mars_depth import main

    out = tmp_path / "out"
    rc = main([
        "--input", str(image_dir),
        "--output_dir", str(out),
        "--max_size", "48",
        "--enhanced_model",
    ])
    assert rc == 0
    assert (out / "rover_test" / "rover_test_depth.npy").exists()
    assert (out / "satellite_view" / "satellite_view_depth.npy").exists()


def test_source_detection():
    from monodepth_tpu.inference import detect_source

    assert detect_source("/a/rover_cam.png") == "rover"
    assert detect_source("/a/ingenuity_flight.png") == "ingenuity"
    assert detect_source("/a/aerial_shot.png") == "ingenuity"
    assert detect_source("/a/satellite_img.png") == "satellite"
    assert detect_source("/a/orbital_img.png") == "satellite"
    assert detect_source("/a/unknown.png") == "rover"
    assert detect_source("/a/unknown.png", "satellite") == "satellite"


def test_run_mars_depth_batched(image_dir, tmp_path):
    """--batch_size > 1 groups same-shape images and still writes per-image outputs."""
    from monodepth_tpu.cli.run_mars_depth import main

    out = tmp_path / "out_batched"
    rc = main([
        "--input", str(image_dir),
        "--output_dir", str(out),
        "--max_size", "48",
        "--batch_size", "2",
    ])
    assert rc == 0
    a = np.load(out / "rover_test" / "rover_test_depth.npy")
    b = np.load(out / "satellite_view" / "satellite_view_depth.npy")
    assert a.shape == b.shape and np.isfinite(a).all() and np.isfinite(b).all()
    # satellite scaling (0.01) must differ from rover scaling (1.0)
    assert not np.allclose(a, b)


def test_run_mars_depth_dem_artifact(image_dir, tmp_path):
    """--dem writes a loadable ESRI ASCII elevation raster + sidecar."""
    from monodepth_tpu.cli.run_mars_depth import main
    from monodepth_tpu.utils.terrain import TerrainReconstructor

    out = tmp_path / "out"
    rc = main([
        "--input", str(image_dir / "rover_test.png"),
        "--output_dir", str(out),
        "--max_size", "64",
        "--dem",
    ])
    assert rc == 0
    dem_path = out / "rover_test" / "rover_test_dem.asc"
    assert dem_path.exists()
    assert (out / "rover_test" / "rover_test_dem_transform.json").exists()
    dem, t = TerrainReconstructor.load_dem(str(dem_path))
    assert dem.shape == (t["nrows"], t["ncols"])
    assert np.isfinite(dem).any()
    assert t["cellsize"] > 0
