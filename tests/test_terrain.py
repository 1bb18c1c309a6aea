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
