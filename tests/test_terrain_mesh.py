"""Alpha-shape meshing, PLY round-trips, and degenerate-output detection
(VERDICT r1 items 2/8/9; reference terrain_reconstruction.py:209-271,
449-490)."""

import numpy as np
import pytest

from monodepth_tpu.utils.terrain import (
    DegenerateDepthError,
    MarsTerrainMapper,
    Mesh,
    TerrainReconstructor,
    alpha_shape_mesh,
)


def _hemisphere(n=600, radius=1.0, seed=0):
    """Solid hemisphere (uniform in volume).  A hollow shell would be the
    degenerate cospherical case where every Delaunay tet's circumradius is
    the sphere radius; real terrain clouds are volumetric/2.5-D."""
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v[:, 2] = np.abs(v[:, 2])
    r = radius * rng.random(n) ** (1.0 / 3.0)
    return v * r[:, None]


# ------------------------------------------------------------- alpha shape
def test_alpha_shape_hemisphere_geometry():
    pts = _hemisphere(800)
    mesh = alpha_shape_mesh(pts, alpha=0.35)
    assert len(mesh.triangles) > 100
    assert mesh.triangles.max() < len(mesh.vertices)
    # the surface encloses the hemisphere: bounding box matches
    lo, hi = mesh.vertices.min(0), mesh.vertices.max(0)
    np.testing.assert_allclose(lo[:2], [-1, -1], atol=0.15)
    np.testing.assert_allclose(hi, [1, 1, 1], atol=0.15)
    assert lo[2] > -0.1
    # surface area is within a sane band of the ideal
    # 2*pi (dome) + pi (base) = 3*pi; alpha roughness inflates it somewhat
    a, b, c = (mesh.vertices[mesh.triangles[:, i]] for i in range(3))
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1).sum()
    assert 0.5 * 3 * np.pi < area < 3.0 * 3 * np.pi


def test_alpha_shape_colors_follow_vertices():
    pts = _hemisphere(300)
    colors = np.linspace(0, 1, 300 * 3).reshape(300, 3)
    mesh = alpha_shape_mesh(pts, alpha=0.8, colors=colors)
    assert mesh.colors is not None and len(mesh.colors) == len(mesh.vertices)


def test_alpha_shape_too_coarse_raises():
    pts = _hemisphere(50) * 10.0
    with pytest.raises(ValueError, match="alpha"):
        alpha_shape_mesh(pts, alpha=0.01)


def test_reconstruct_mesh_auto_uses_alpha_without_open3d():
    recon = TerrainReconstructor()
    mesh = recon.reconstruct_mesh(_hemisphere(), method="auto", alpha=0.6)
    assert isinstance(mesh, Mesh) and len(mesh.triangles) > 0


def test_reconstruct_mesh_poisson_branch_with_fake_open3d(monkeypatch):
    """VERDICT r2 missing-5: the Open3D/Poisson branch (reference
    terrain_reconstruction.py:209-271) was untested because Open3D is absent
    here.  Exercise its full data flow — color normalization, supplied vs
    estimated normals, density-quantile pruning, cleanup calls, Mesh
    conversion — against a faithful fake open3d module."""
    from monodepth_tpu.utils import terrain

    calls = []

    class FakeVector:
        def __init__(self, arr):
            self.arr = np.asarray(arr, dtype=np.float64)

    class FakePointCloud:
        def __init__(self):
            self.points = None
            self.colors = None
            self.normals = None

        def estimate_normals(self):
            calls.append("estimate_normals")

    class FakeMesh:
        def __init__(self, verts, tris, colors):
            self.vertices = verts
            self.triangles = tris
            self.vertex_colors = colors

        def select_by_index(self, idx):
            calls.append(("select", len(idx)))
            keep = np.asarray(idx)
            return FakeMesh(self.vertices[keep], self.triangles,
                            self.vertex_colors[keep]
                            if self.vertex_colors is not None else None)

        def remove_degenerate_triangles(self):
            calls.append("degenerate")

        def remove_duplicated_vertices(self):
            calls.append("duplicated")

        def remove_non_manifold_edges(self):
            calls.append("non_manifold")

        def has_vertex_colors(self):
            return self.vertex_colors is not None

    def fake_poisson(pcd, depth):
        calls.append(("poisson", depth))
        pts = pcd.points.arr
        n = len(pts)
        tris = np.stack([np.arange(n - 2), np.arange(1, n - 1),
                         np.arange(2, n)], axis=1)
        cols = pcd.colors.arr if pcd.colors is not None else None
        densities = np.linspace(0.0, 1.0, n)  # first 1% pruned by quantile
        return FakeMesh(pts, tris, cols), densities

    class FakeO3d:
        class geometry:
            PointCloud = FakePointCloud

            class TriangleMesh:
                create_from_point_cloud_poisson = staticmethod(fake_poisson)

        class utility:
            Vector3dVector = FakeVector

    monkeypatch.setattr(terrain, "o3d", FakeO3d)
    monkeypatch.setattr(terrain, "OPEN3D_AVAILABLE", True)

    rng = np.random.default_rng(0)
    pts = rng.random((200, 3))
    colors_255 = rng.random((200, 3)) * 255.0  # exercise the /255 branch
    rec = terrain.TerrainReconstructor(poisson_depth=7)

    # supplied normals: estimate_normals must NOT run
    mesh = rec.reconstruct_mesh(pts, colors=colors_255,
                                normals=rng.random((200, 3)),
                                method="poisson")
    assert ("poisson", 7) in calls
    assert "estimate_normals" not in calls
    for cleanup in ("degenerate", "duplicated", "non_manifold"):
        assert cleanup in calls
    # density pruning dropped the bottom 1% (quantile 0.01 -> 198 kept)
    select = [c for c in calls if isinstance(c, tuple) and c[0] == "select"][0]
    assert select[1] == 198
    assert mesh.vertices.shape[1] == 3
    assert mesh.colors is not None and mesh.colors.max() <= 1.0

    # no normals supplied -> estimate_normals path
    calls.clear()
    rec.reconstruct_mesh(pts, method="poisson")
    assert "estimate_normals" in calls


# ------------------------------------------------------------ PLY readers
@pytest.mark.parametrize("binary", [True, False])
@pytest.mark.parametrize("with_colors", [True, False])
def test_point_cloud_ply_roundtrip(tmp_path, binary, with_colors):
    rng = np.random.default_rng(1)
    points = rng.standard_normal((40, 3)).astype(np.float32)
    colors = rng.random((40, 3)).astype(np.float32) if with_colors else None
    path = str(tmp_path / f"pc_{binary}_{with_colors}.ply")
    TerrainReconstructor.save_point_cloud(points, colors, path, binary=binary)
    got_p, got_c = TerrainReconstructor.load_point_cloud(path)
    np.testing.assert_allclose(got_p, points, atol=1e-5)
    if with_colors:
        np.testing.assert_allclose(got_c, colors, atol=1.0 / 255)
    else:
        assert got_c is None


def test_mesh_ply_roundtrip(tmp_path):
    mesh = Mesh(
        vertices=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32),
        triangles=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        colors=np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]], np.float32),
    )
    path = str(tmp_path / "mesh.ply")
    TerrainReconstructor.save_mesh(mesh, path)
    got = TerrainReconstructor.load_mesh(path)
    np.testing.assert_allclose(got.vertices, mesh.vertices, atol=1e-6)
    np.testing.assert_array_equal(got.triangles, mesh.triangles)
    np.testing.assert_allclose(got.colors, mesh.colors, atol=1.0 / 255)


def test_mesh_obj_roundtrip(tmp_path):
    mesh = Mesh(
        vertices=np.array([[0, 0, 0], [2, 0, 0], [0, 3, 0]], np.float32),
        triangles=np.array([[0, 1, 2]], np.int32),
    )
    path = str(tmp_path / "mesh.obj")
    TerrainReconstructor.save_mesh(mesh, path)
    got = TerrainReconstructor.load_mesh(path)
    np.testing.assert_allclose(got.vertices, mesh.vertices, atol=1e-6)
    np.testing.assert_array_equal(got.triangles, mesh.triangles)


def test_alpha_mesh_save_load_roundtrip(tmp_path):
    """Full chain: cloud -> alpha mesh -> PLY -> load -> same surface."""
    mesh = alpha_shape_mesh(_hemisphere(300), alpha=0.8)
    path = str(tmp_path / "hemi.ply")
    TerrainReconstructor.save_mesh(mesh, path)
    got = TerrainReconstructor.load_mesh(path)
    np.testing.assert_allclose(got.vertices, mesh.vertices, atol=1e-5)
    np.testing.assert_array_equal(got.triangles, mesh.triangles)


# ------------------------------------------------- degenerate detection
class _StubEstimator:
    """Estimator stub returning a fixed disparity map at any input size."""

    def __init__(self, disp_fn):
        self._fn = disp_fn

    def predict(self, image, metadata=None, **kw):
        h, w = np.asarray(image).shape[:2]
        disp = self._fn(h, w)
        return {"disp": disp, "depth": 1.0 / np.clip(disp, 1e-6, None)}


def test_degenerate_disparity_raises_with_diagnostics():
    mapper = MarsTerrainMapper(
        estimator=_StubEstimator(lambda h, w: np.full((h, w), 0.37, np.float32)))
    with pytest.raises(DegenerateDepthError) as exc:
        mapper.infer_depth(np.random.default_rng(0).random((64, 96, 3)).astype(np.float32),
                           metadata={"source": "rover"})
    diag = exc.value.diagnostics
    assert diag["source"] == "rover"
    assert diag["range"] < 1e-6
    assert "std" in diag and "input_shape" in diag


def test_degenerate_retry_recovers_when_small_size_works():
    """Constant at full size but valid at the 256 retry -> no exception,
    matching the reference's retry-at-256 behavior (:455-466)."""

    def disp_fn(h, w):
        if (h, w) == (256, 256):
            return np.linspace(0.2, 0.8, h * w, dtype=np.float32).reshape(h, w)
        return np.full((h, w), 0.5, np.float32)

    mapper = MarsTerrainMapper(estimator=_StubEstimator(disp_fn))
    depth = mapper.infer_depth(
        np.random.default_rng(0).random((64, 96, 3)).astype(np.float32))
    assert depth.shape == (64, 96)
    assert np.isfinite(depth).all()
    assert depth.max() - depth.min() > 0


def test_nonfinite_disparity_raises():
    def disp_fn(h, w):
        d = np.full((h, w), 0.5, np.float32)
        d[0, 0] = np.nan
        return d

    mapper = MarsTerrainMapper(estimator=_StubEstimator(disp_fn))
    with pytest.raises(ValueError, match="non-finite"):
        mapper.infer_depth(np.zeros((32, 32, 3), np.float32))


def test_healthy_disparity_passes():
    def disp_fn(h, w):
        return np.linspace(0.1, 0.9, h * w, dtype=np.float32).reshape(h, w)

    mapper = MarsTerrainMapper(estimator=_StubEstimator(disp_fn))
    depth = mapper.infer_depth(np.zeros((32, 48, 3), np.float32))
    assert depth.shape == (32, 48)
