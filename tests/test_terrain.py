"""Terrain reconstruction tests: backprojection, filtering, meshing, IO."""

import numpy as np
import pytest

from monodepth_tpu.utils.terrain import Mesh, TerrainReconstructor


@pytest.fixture
def recon():
    return TerrainReconstructor(min_depth=0.1, max_depth=100.0)


def test_point_cloud_backprojection_roundtrip(recon):
    h, w = 20, 30
    depth = np.full((h, w), 5.0, dtype=np.float32)
    K = recon.default_intrinsics(h, w)
    points, mask = recon.create_point_cloud(depth, K)
    assert mask.all()
    assert points.shape == (h * w, 3)
    np.testing.assert_allclose(points[:, 2], 5.0)
    # Reproject: u = fx * x / z + cx must recover pixel columns.
    u = K[0, 0] * points[:, 0] / points[:, 2] + K[0, 2]
    v = K[1, 1] * points[:, 1] / points[:, 2] + K[1, 2]
    ys, xs = np.nonzero(mask)
    np.testing.assert_allclose(u, xs, atol=1e-9)
    np.testing.assert_allclose(v, ys, atol=1e-9)


def test_point_cloud_depth_masking(recon):
    depth = np.array([[0.05, 5.0], [200.0, np.nan]], dtype=np.float32)
    points, mask = recon.create_point_cloud(depth)
    assert mask.sum() == 1
    assert len(points) == 1


def test_reconstruct_terrain_colors(recon, rng):
    depth = rng.random((8, 8), dtype=np.float32) * 5 + 1
    img = (rng.random((8, 8, 3)) * 255).astype(np.uint8)
    points, colors = recon.reconstruct_terrain(depth, img)
    assert len(points) == len(colors) == 64


def test_filter_and_downsample_removes_outlier(recon, rng):
    pts = rng.random((500, 3))
    pts = np.concatenate([pts, [[100.0, 100.0, 100.0]]])  # gross outlier
    kept, _ = recon.filter_and_downsample(pts, voxel_size=0.0)
    assert len(kept) < len(pts)
    assert not (kept == 100.0).all(axis=1).any()


def test_voxel_downsample_reduces(recon, rng):
    pts = rng.random((2000, 3)) * 0.2  # dense cluster
    kept, _ = recon.filter_and_downsample(pts, voxel_size=0.1)
    assert len(kept) < 100


def test_estimate_normals_flat_plane(recon, rng):
    xs, ys = np.meshgrid(np.linspace(0, 1, 15), np.linspace(0, 1, 15))
    pts = np.stack([xs.ravel(), ys.ravel(), np.full(xs.size, 2.0)], axis=1)
    normals = recon.estimate_normals(pts, k=8)
    # plane z=2 normals are +-z; oriented toward camera at origin -> -z
    np.testing.assert_allclose(np.abs(normals[:, 2]), 1.0, atol=1e-5)
    assert (normals[:, 2] < 0).all()


def test_grid_mesh_and_stitch(recon, rng):
    depth = np.full((16, 16), 3.0, dtype=np.float32)
    img = rng.random((16, 16, 3)).astype(np.float32)
    mesh = recon.grid_mesh_from_depth(depth, img)
    assert len(mesh.vertices) == 256
    assert len(mesh.triangles) == 2 * 15 * 15
    assert mesh.colors.shape == (256, 3)

    stitched = recon.stitch_meshes([mesh, mesh])
    assert len(stitched.vertices) == 512
    assert len(stitched.triangles) == 2 * len(mesh.triangles)
    assert stitched.triangles.max() == 511


def test_grid_mesh_drops_discontinuities(recon):
    depth = np.full((10, 10), 2.0, dtype=np.float32)
    depth[:, 5:] = 50.0  # cliff
    mesh = recon.grid_mesh_from_depth(depth, depth_discontinuity=0.1)
    # triangles crossing the cliff must be removed
    zspan = mesh.vertices[mesh.triangles][:, :, 2]
    assert (zspan.max(axis=1) - zspan.min(axis=1) < 1.0).all()


def test_save_point_cloud_ply_roundtrip(recon, tmp_path, rng):
    pts = rng.random((10, 3)).astype(np.float32)
    colors = (rng.random((10, 3)) * 255).astype(np.uint8)
    path = str(tmp_path / "cloud.ply")
    recon.save_point_cloud(pts, colors, path)
    raw = open(path, "rb").read()
    header, _, body = raw.partition(b"end_header\n")
    assert b"element vertex 10" in header
    rec = np.frombuffer(body, dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)])
    np.testing.assert_allclose(rec["xyz"], pts, rtol=1e-6)
    np.testing.assert_array_equal(rec["rgb"], colors)


def test_save_mesh_obj_and_ply(recon, tmp_path):
    mesh = Mesh(
        vertices=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], dtype=np.float32),
        triangles=np.array([[0, 1, 2]]),
        colors=np.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]]),
    )
    obj = recon.save_mesh(mesh, str(tmp_path / "m.obj"))
    text = open(obj).read()
    assert text.count("v ") == 3 and "f 1 2 3" in text

    ply = recon.save_mesh(mesh, str(tmp_path / "m.ply"))
    raw = open(ply, "rb").read()
    assert b"element face 1" in raw


def test_geospatial_reference(recon):
    geo = recon.add_geospatial_reference(
        {"latitude": -4.5, "longitude": 137.4, "altitude": 10.0, "source": "rover"}
    )
    assert geo == {"latitude": -4.5, "longitude": 137.4, "altitude": 10.0}


# ------------------------------------------------------------------- DEM
def test_export_dem_flat_plane(recon):
    """A fronto-parallel plane at depth d is a vertical wall: its DEM
    collapses to one z-row whose cells hold the column-mean elevation
    (analytic: (cy - mean_row) * d / fy)."""
    h, w, d = 32, 48, 5.0
    depth = np.full((h, w), d)
    points, _ = recon.create_point_cloud(depth)
    dem, t = recon.export_dem(points, grid_shape=(16, 16), fill=True)
    assert dem.shape == (t["nrows"], t["ncols"])
    assert t["nrows"] == 1
    finite = dem[np.isfinite(dem)]
    assert len(finite) > 0
    fy = 0.7 * max(h, w)
    expect = (h / 2.0 - (h - 1) / 2.0) * d / fy
    np.testing.assert_allclose(finite, expect, rtol=1e-6)


def test_export_dem_sloped_terrain_elevation_gradient(recon):
    """Terrain whose elevation rises with distance: DEM row order is
    far-edge-first (ESRI north-up), so row 0 holds the highest ground."""
    ys, xs = np.mgrid[0:64, 0:64]
    # camera looking at ground: nearer rows (large y) closer & lower
    depth = 2.0 + 6.0 * (1.0 - ys / 64.0)
    points, _ = recon.create_point_cloud(depth)
    # rotate camera frame: treat -y as elevation directly (already so)
    dem, t = recon.export_dem(points, grid_shape=(32, 32))
    row_means = np.nanmean(dem, axis=1)
    valid = np.isfinite(row_means)
    assert valid.sum() >= 8
    rm = row_means[valid]
    # far rows (index 0) were imaged at the image's top (small pixel y ->
    # large -y elevation): elevation decreases toward near rows
    assert rm[0] > rm[-1]


def test_export_dem_fill_interior_only(recon):
    """Hole fill copies the nearest populated cell for interior gaps but
    leaves out-of-footprint cells NODATA."""
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (500, 3))
    pts[:, 2] = np.abs(pts[:, 2]) + 1.0  # positive depth band
    # cut a hole in the middle of the footprint
    hole = (np.abs(pts[:, 0]) < 0.2) & (np.abs(pts[:, 2] - 1.5) < 0.2)
    pts = pts[~hole]
    dem_nf, t = recon.export_dem(pts, grid_shape=(24, 24), fill=False)
    dem_f, _ = recon.export_dem(pts, grid_shape=(24, 24), fill=True)
    assert np.isnan(dem_nf).sum() > np.isnan(dem_f).sum()
    # filled values came from real cells
    filled_mask = np.isnan(dem_nf) & np.isfinite(dem_f)
    assert filled_mask.any()
    assert np.isin(dem_f[filled_mask].round(9),
                   dem_nf[np.isfinite(dem_nf)].round(9)).all()


def test_dem_asc_roundtrip(recon, tmp_path, rng):
    pts = rng.random((400, 3)) * np.array([4.0, 2.0, 3.0]) + np.array([0, 0, 1.0])
    dem, t = recon.export_dem(pts, resolution=0.25)
    recon.add_geospatial_reference({"latitude": -4.5, "longitude": 137.4})
    dem2, t2 = recon.export_dem(pts, resolution=0.25)
    path = str(tmp_path / "out_dem.asc")
    recon.save_dem(dem2, t2, path)
    loaded, lt = recon.load_dem(path)
    assert loaded.shape == dem2.shape
    both = np.isfinite(dem2) & np.isfinite(loaded)
    np.testing.assert_allclose(loaded[both], dem2[both], rtol=1e-4, atol=1e-4)
    assert (np.isnan(loaded) == np.isnan(dem2)).all()
    assert lt["cellsize"] == pytest.approx(0.25)
    # transform sidecar carries the geospatial metadata
    import json

    with open(str(tmp_path / "out_dem_transform.json")) as f:
        side = json.load(f)
    assert side["latitude"] == -4.5 and side["longitude"] == 137.4


def test_export_dem_empty_raises(recon):
    with pytest.raises(ValueError):
        recon.export_dem(np.zeros((0, 3)))


def test_mapper_process_image_to_dem(rng):
    from monodepth_tpu.config import ModelConfig
    from monodepth_tpu.inference import MarsDepthEstimator
    from monodepth_tpu.utils.terrain import MarsTerrainMapper

    est = MarsDepthEstimator(ModelConfig(pretrained=False), seed=0)
    mapper = MarsTerrainMapper(estimator=est)
    img = rng.random((48, 64, 3)).astype(np.float32)
    dem, t = mapper.process_image_to_dem(
        img, metadata={"source": "rover", "latitude": 18.4},
        grid_shape=(32, 32))
    assert np.isfinite(dem).any()
    assert t["latitude"] == 18.4
    assert t["cellsize"] > 0
