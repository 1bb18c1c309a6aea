"""3-D terrain reconstruction: depth -> point cloud -> mesh -> stitching.

Capability of the reference's two reconstruction stacks
(utils/terrain_reconstruction_fixed.py and utils/terrain_reconstruction.py):

- `TerrainReconstructor`: pinhole backprojection with default intrinsics
  f = 0.7*max(h, w), principal point at center (fixed :39-47 / full :53-131);
  colored point clouds; statistical outlier removal (nb=20, sigma=2.0) and
  voxel downsampling (0.05) (full :158-184); normal estimation oriented to
  the camera (:186-207); mesh reconstruction (Poisson via Open3D when
  available, otherwise a regular-grid triangulation over the depth image);
  mesh stitching by concatenation (:273-302); geospatial metadata (:304-344);
  and the PLY/OBJ writers whose API the reference implies but never defines
  (`save_point_cloud` / `save_mesh`, called from test_mars_depth.py:196-330).
  The writers are from-scratch binary/ascii PLY + OBJ emitters — no Open3D
  dependency.

- `MarsTerrainMapper`: jitted depth inference + reconstruction driver.
  Follows the *fixed* mapper's no-fallback philosophy (SURVEY.md §5:
  fail explicitly rather than synthesizing gradient depth).

Open3D is absent in this environment; all functionality below is
self-contained (numpy/scipy), with Open3D used opportunistically if present.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

try:  # pragma: no cover - optional
    import open3d as o3d

    OPEN3D_AVAILABLE = True
except ImportError:  # pragma: no cover
    o3d = None
    OPEN3D_AVAILABLE = False

__all__ = ["TerrainReconstructor", "MarsTerrainMapper", "Mesh",
           "DegenerateDepthError", "alpha_shape_mesh", "OPEN3D_AVAILABLE"]


@dataclasses.dataclass
class Mesh:
    """Simple indexed triangle mesh."""

    vertices: np.ndarray            # [N, 3] float
    triangles: np.ndarray           # [M, 3] int
    colors: Optional[np.ndarray] = None   # [N, 3] float in [0, 1]
    normals: Optional[np.ndarray] = None  # [N, 3] float

    def __iadd__(self, other: "Mesh"):
        """Concatenation stitching (reference terrain_reconstruction.py:273-302)."""
        offset = len(self.vertices)
        self.vertices = np.concatenate([self.vertices, other.vertices])
        self.triangles = np.concatenate([self.triangles, other.triangles + offset])
        if self.colors is not None and other.colors is not None:
            self.colors = np.concatenate([self.colors, other.colors])
        else:
            self.colors = None
        if self.normals is not None and other.normals is not None:
            self.normals = np.concatenate([self.normals, other.normals])
        else:
            self.normals = None
        return self


def _tet_circumradii(points: np.ndarray, tets: np.ndarray) -> np.ndarray:
    """Circumradius of each tetrahedron (vectorized).

    Solves 2 (V_i - V_0) . c = |V_i|^2 - |V_0|^2 for the circumcenter c of
    every tet; degenerate (near-flat) tets get radius = inf so alpha
    filtering drops them.
    """
    a = points[tets[:, 0]]
    rows = np.stack([points[tets[:, i]] - a for i in (1, 2, 3)], axis=1)  # [n,3,3]
    rhs = 0.5 * np.stack(
        [np.einsum("ij,ij->i", points[tets[:, i]] + a, points[tets[:, i]] - a)
         for i in (1, 2, 3)], axis=1)                                      # [n,3]
    det = np.linalg.det(rows)
    ok = np.abs(det) > 1e-12
    radii = np.full(len(tets), np.inf)
    if ok.any():
        centers = np.linalg.solve(rows[ok], rhs[ok][..., None])[..., 0]
        radii[ok] = np.linalg.norm(centers - a[ok], axis=1)
    return radii


def alpha_shape_mesh(points: np.ndarray, alpha: float = 0.5,
                     colors: Optional[np.ndarray] = None) -> Mesh:
    """Alpha-shape surface mesh of an unstructured point cloud.

    From-scratch scipy equivalent of the reference's Open3D path
    (terrain_reconstruction.py:209-271, `create_from_point_cloud_alpha_shape`
    with alpha=0.5): 3-D Delaunay tetrahedralization, keep tetrahedra with
    circumradius < alpha (the alpha complex), and emit the boundary faces —
    those belonging to exactly one kept tetrahedron.  Degenerate and
    duplicate faces cannot occur by construction; unreferenced vertices are
    pruned (the reference's cleanup steps :243-246).
    """
    from scipy.spatial import Delaunay

    points = np.asarray(points, dtype=np.float64)
    if len(points) < 5:
        raise ValueError(f"alpha shape needs >= 5 points, got {len(points)}")
    tri = Delaunay(points, qhull_options="QJ")  # joggle: robust to coplanar
    tets = tri.simplices
    keep = _tet_circumradii(points, tets) < alpha
    if not keep.any():
        raise ValueError(
            f"alpha={alpha} keeps no tetrahedra (point spacing too coarse); "
            "increase alpha or densify the cloud"
        )
    kept = tets[keep]
    # 4 faces per tet; boundary faces appear exactly once.
    faces = np.concatenate([kept[:, [0, 1, 2]], kept[:, [0, 1, 3]],
                            kept[:, [0, 2, 3]], kept[:, [1, 2, 3]]])
    key = np.sort(faces, axis=1)
    _, idx, counts = np.unique(key, axis=0, return_index=True, return_counts=True)
    boundary = faces[idx[counts == 1]]

    used = np.unique(boundary)
    remap = np.full(len(points), -1, dtype=np.int64)
    remap[used] = np.arange(len(used))
    return Mesh(
        vertices=points[used].astype(np.float32),
        triangles=remap[boundary].astype(np.int32),
        colors=None if colors is None else np.asarray(colors)[used],
    )


class TerrainReconstructor:
    """Depth-map -> point-cloud / mesh reconstruction for Mars terrain."""

    def __init__(self, min_depth: float = 0.1, max_depth: float = 100.0,
                 voxel_size: float = 0.05, poisson_depth: int = 9):
        self.min_depth = min_depth
        self.max_depth = max_depth
        self.voxel_size = voxel_size
        self.poisson_depth = poisson_depth
        self.geospatial: Dict = {}

    # --------------------------------------------------------- intrinsics
    def default_intrinsics(self, height: int, width: int) -> np.ndarray:
        """f = 0.7 * max(h, w), principal point at center
        (reference terrain_reconstruction_fixed.py:39-47)."""
        f = 0.7 * max(height, width)
        K = np.array(
            [[f, 0, width / 2.0], [0, f, height / 2.0], [0, 0, 1.0]], dtype=np.float64
        )
        return K

    # -------------------------------------------------------- point cloud
    def create_point_cloud(
        self, depth: np.ndarray, intrinsics: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Vectorized pinhole backprojection with depth-range masking.

        Returns (points [N, 3], valid_mask [H, W]); +z forward, y down.
        (reference terrain_reconstruction_fixed.py:18-70)
        """
        depth = np.squeeze(np.asarray(depth, dtype=np.float64))
        h, w = depth.shape
        K = intrinsics if intrinsics is not None else self.default_intrinsics(h, w)
        fx, fy = K[0, 0], K[1, 1]
        cx, cy = K[0, 2], K[1, 2]

        mask = np.isfinite(depth) & (depth > self.min_depth) & (depth < self.max_depth)
        ys, xs = np.nonzero(mask)
        z = depth[ys, xs]
        x = (xs - cx) * z / fx
        y = (ys - cy) * z / fy
        points = np.stack([x, y, z], axis=-1)
        return points, mask

    def reconstruct_terrain(
        self, depth: np.ndarray, image: Optional[np.ndarray] = None,
        intrinsics: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """Point cloud + per-point RGB colors (fixed :72-110)."""
        points, mask = self.create_point_cloud(depth, intrinsics)
        colors = None
        if image is not None:
            img = np.asarray(image)
            if img.ndim == 2:
                img = np.stack([img] * 3, axis=-1)
            colors = img[mask].astype(np.float64)
        return points, colors

    # ------------------------------------------------------------ filters
    def filter_and_downsample(
        self, points: np.ndarray, colors: Optional[np.ndarray] = None,
        nb_neighbors: int = 20, std_ratio: float = 2.0,
        voxel_size: Optional[float] = None,
    ):
        """Statistical outlier removal + voxel downsampling
        (reference terrain_reconstruction.py:158-184), numpy/scipy version."""
        from scipy.spatial import cKDTree

        points = np.asarray(points, dtype=np.float64)
        if len(points) == 0:
            return points, colors
        # Statistical outlier removal: drop points whose mean k-NN distance
        # exceeds global mean + std_ratio * std.
        k = min(nb_neighbors + 1, len(points))
        tree = cKDTree(points)
        dists, _ = tree.query(points, k=k)
        mean_d = dists[:, 1:].mean(axis=1) if k > 1 else np.zeros(len(points))
        keep = mean_d <= mean_d.mean() + std_ratio * mean_d.std()
        points = points[keep]
        if colors is not None:
            colors = np.asarray(colors)[keep]

        # Voxel downsampling: centroid per occupied voxel.
        vs = voxel_size if voxel_size is not None else self.voxel_size
        if vs and vs > 0 and len(points):
            keys = np.floor(points / vs).astype(np.int64)
            _, inverse, counts = np.unique(
                keys, axis=0, return_inverse=True, return_counts=True
            )
            n_vox = counts.shape[0]
            acc = np.zeros((n_vox, 3))
            np.add.at(acc, inverse, points)
            points_ds = acc / counts[:, None]
            if colors is not None:
                acc_c = np.zeros((n_vox, colors.shape[1]))
                np.add.at(acc_c, inverse, colors)
                colors = acc_c / counts[:, None]
            points = points_ds
        return points, colors

    def estimate_normals(
        self, points: np.ndarray, k: int = 30, camera_location=(0.0, 0.0, 0.0)
    ) -> np.ndarray:
        """PCA normals from k-NN neighborhoods, oriented toward the camera
        (reference terrain_reconstruction.py:186-207)."""
        from scipy.spatial import cKDTree

        points = np.asarray(points, dtype=np.float64)
        n = len(points)
        if n < 3:
            return np.tile([[0.0, 0.0, -1.0]], (n, 1))
        k = min(k, n)
        tree = cKDTree(points)
        _, idx = tree.query(points, k=k)
        neigh = points[idx]                       # [N, k, 3]
        centered = neigh - neigh.mean(axis=1, keepdims=True)
        cov = np.einsum("nki,nkj->nij", centered, centered) / k
        _, vecs = np.linalg.eigh(cov)             # ascending eigenvalues
        normals = vecs[:, :, 0]                   # smallest eigenvector
        to_cam = np.asarray(camera_location) - points
        flip = np.sum(normals * to_cam, axis=1) < 0
        normals[flip] = -normals[flip]
        return normals

    # --------------------------------------------------------------- mesh
    def grid_mesh_from_depth(
        self, depth: np.ndarray, image: Optional[np.ndarray] = None,
        intrinsics: Optional[np.ndarray] = None, step: int = 1,
        depth_discontinuity: float = 0.1,
    ) -> Mesh:
        """Regular-grid triangulation of the depth image.

        The Open3D-free meshing path: two triangles per valid grid cell,
        dropping triangles that span depth discontinuities
        (relative jump > depth_discontinuity).
        """
        depth = np.squeeze(np.asarray(depth, dtype=np.float64))[::step, ::step]
        h, w = depth.shape
        if intrinsics is not None:
            # Provided intrinsics refer to the full-resolution image.
            fx, fy = intrinsics[0, 0] / step, intrinsics[1, 1] / step
            cx, cy = intrinsics[0, 2] / step, intrinsics[1, 2] / step
        else:
            K = self.default_intrinsics(h, w)
            fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

        ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
        valid = np.isfinite(depth) & (depth > self.min_depth) & (depth < self.max_depth)
        z = np.where(valid, depth, np.nan)
        px = (xs - cx) * z / fx
        py = (ys - cy) * z / fy
        verts = np.stack([px, py, z], axis=-1).reshape(-1, 3)

        vid = np.arange(h * w).reshape(h, w)
        v00, v01 = vid[:-1, :-1], vid[:-1, 1:]
        v10, v11 = vid[1:, :-1], vid[1:, 1:]
        tris = np.concatenate(
            [
                np.stack([v00, v10, v01], axis=-1).reshape(-1, 3),
                np.stack([v01, v10, v11], axis=-1).reshape(-1, 3),
            ]
        )
        tri_z = verts[tris][:, :, 2]
        finite = np.isfinite(tri_z).all(axis=1)
        zmin = np.nanmin(tri_z, axis=1)
        zmax = np.nanmax(tri_z, axis=1)
        with np.errstate(invalid="ignore"):
            smooth = (zmax - zmin) / np.maximum(zmin, 1e-9) <= depth_discontinuity
        tris = tris[finite & smooth]

        used = np.unique(tris)
        remap = np.full(h * w, -1, dtype=np.int64)
        remap[used] = np.arange(len(used))
        mesh = Mesh(vertices=verts[used], triangles=remap[tris])
        if image is not None:
            img = np.asarray(image, dtype=np.float64)
            if img.max() > 1:
                img = img / 255.0
            mesh.colors = img[::step, ::step].reshape(-1, img.shape[-1])[used][:, :3]
        return mesh

    def reconstruct_mesh(
        self, points: np.ndarray, colors: Optional[np.ndarray] = None,
        normals: Optional[np.ndarray] = None, method: str = "auto",
        alpha: float = 0.5,
    ):
        """Unstructured point cloud -> surface mesh
        (reference terrain_reconstruction.py:209-271: Poisson depth=9 OR
        alpha-shape alpha=0.5).

        method: 'poisson' (requires Open3D), 'alpha' (self-contained scipy
        alpha shape), or 'auto' — Poisson when Open3D is present, alpha
        otherwise.  Structured depth images can instead use
        `grid_mesh_from_depth`.
        """
        if method == "alpha" or (method == "auto" and not OPEN3D_AVAILABLE):
            return alpha_shape_mesh(points, alpha=alpha, colors=colors)
        if OPEN3D_AVAILABLE and method in ("auto", "poisson"):  # pragma: no cover
            pcd = o3d.geometry.PointCloud()
            pcd.points = o3d.utility.Vector3dVector(points)
            if colors is not None:
                c = np.asarray(colors, dtype=np.float64)
                if c.max() > 1:
                    c = c / 255.0
                pcd.colors = o3d.utility.Vector3dVector(c)
            if normals is None:
                pcd.estimate_normals()
            else:
                pcd.normals = o3d.utility.Vector3dVector(normals)
            mesh_o3d, densities = o3d.geometry.TriangleMesh.create_from_point_cloud_poisson(
                pcd, depth=self.poisson_depth
            )
            densities = np.asarray(densities)
            keep = densities >= np.quantile(densities, 0.01)
            mesh_o3d = mesh_o3d.select_by_index(np.nonzero(keep)[0])
            mesh_o3d.remove_degenerate_triangles()
            mesh_o3d.remove_duplicated_vertices()
            mesh_o3d.remove_non_manifold_edges()
            return Mesh(
                vertices=np.asarray(mesh_o3d.vertices),
                triangles=np.asarray(mesh_o3d.triangles),
                colors=np.asarray(mesh_o3d.vertex_colors) if mesh_o3d.has_vertex_colors() else None,
            )
        raise RuntimeError(
            "Poisson meshing requires Open3D; use grid_mesh_from_depth for the "
            "self-contained structured meshing path."
        )

    @staticmethod
    def stitch_meshes(meshes: Sequence[Mesh]) -> Mesh:
        """Concatenate meshes (reference terrain_reconstruction.py:273-302)."""
        assert len(meshes) > 0
        out = Mesh(
            vertices=meshes[0].vertices.copy(),
            triangles=meshes[0].triangles.copy(),
            colors=None if meshes[0].colors is None else meshes[0].colors.copy(),
            normals=None if meshes[0].normals is None else meshes[0].normals.copy(),
        )
        for m in meshes[1:]:
            out += m
        return out

    def add_geospatial_reference(self, metadata: Dict) -> Dict:
        """Attach Mars lat/lon/alt metadata (reference :304-344)."""
        geo = {
            k: metadata[k]
            for k in ("latitude", "longitude", "altitude", "heading")
            if k in metadata
        }
        self.geospatial.update(geo)
        return self.geospatial

    # ---------------------------------------------------------------- DEM
    def export_dem(self, points: np.ndarray,
                   resolution: Optional[float] = None,
                   grid_shape: Tuple[int, int] = (256, 256),
                   fill: bool = True) -> Tuple[np.ndarray, Dict]:
        """Gridded digital elevation model from a camera-frame terrain cloud.

        The reference attaches Mars lat/lon metadata to reconstructions
        (terrain_reconstruction.py:304-344) but never produces the raster
        product a terrain-mapping pipeline exists for; this is that
        product.  Camera frame is +z forward / y down (create_point_cloud),
        so the ground plane is (x, z) and elevation is -y (up-positive).

        Each cell takes the MEAN elevation of the points landing in it
        (square cells — GIS grid formats require one cellsize).  With
        fill=True, empty interior cells take the value of their nearest
        populated cell (cKDTree over cell centers); cells outside the
        cloud's footprint stay NaN (NODATA), so holes are filled without
        inventing terrain beyond coverage.

        Args:
          points: [N, 3] camera-frame cloud (from create_point_cloud /
            filter_and_downsample).
          resolution: cell size in scene units; None derives it from
            grid_shape over the cloud's bounding box.
          grid_shape: (nrows, ncols) used when resolution is None.
          fill: nearest-neighbor fill of interior holes.

        Returns:
          (dem [nrows, ncols] float64 with NaN = NODATA; row 0 = max z
           edge, i.e. the far/"north" edge, matching ESRI grid order),
          transform dict: x_origin/z_origin (lower-left corner), cellsize,
          nrows/ncols, and any geospatial metadata previously attached via
          add_geospatial_reference.
        """
        points = np.asarray(points, dtype=np.float64)
        if points.ndim != 2 or points.shape[-1] != 3 or len(points) == 0:
            raise ValueError(
                f"export_dem needs a non-empty [N, 3] cloud, got {points.shape}")
        x, z = points[:, 0], points[:, 2]
        elev = -points[:, 1]
        x0, x1 = float(x.min()), float(x.max())
        z0, z1 = float(z.min()), float(z.max())
        if resolution is None:
            nrows, ncols = grid_shape
            resolution = max((x1 - x0) / max(ncols - 1, 1),
                             (z1 - z0) / max(nrows - 1, 1), 1e-9)
        ncols = int(np.floor((x1 - x0) / resolution)) + 1
        nrows = int(np.floor((z1 - z0) / resolution)) + 1

        cols = np.clip(((x - x0) / resolution).astype(np.int64), 0, ncols - 1)
        # row 0 = far edge (max z): ESRI ASCII grids run north -> south
        rows = np.clip(nrows - 1 - ((z - z0) / resolution).astype(np.int64),
                       0, nrows - 1)
        acc = np.zeros((nrows, ncols))
        cnt = np.zeros((nrows, ncols))
        np.add.at(acc, (rows, cols), elev)
        np.add.at(cnt, (rows, cols), 1.0)
        with np.errstate(invalid="ignore"):
            dem = np.where(cnt > 0, acc / np.maximum(cnt, 1), np.nan)

        if fill and (cnt == 0).any() and (cnt > 0).any():
            from scipy.spatial import cKDTree

            filled_rc = np.argwhere(cnt > 0)
            empty_rc = np.argwhere(cnt == 0)
            # interior = empty cells inside the populated bounding region;
            # restrict to the filled cells' row/col hull to avoid growing
            # terrain past the footprint
            rmin, cmin = filled_rc.min(axis=0)
            rmax, cmax = filled_rc.max(axis=0)
            inside = ((empty_rc[:, 0] >= rmin) & (empty_rc[:, 0] <= rmax)
                      & (empty_rc[:, 1] >= cmin) & (empty_rc[:, 1] <= cmax))
            target = empty_rc[inside]
            if len(target):
                _, nearest = cKDTree(filled_rc).query(target)
                dem[target[:, 0], target[:, 1]] = dem[
                    filled_rc[nearest, 0], filled_rc[nearest, 1]]

        transform = {
            "x_origin": x0,
            "z_origin": z0,
            "cellsize": float(resolution),
            "nrows": nrows,
            "ncols": ncols,
            **self.geospatial,
        }
        return dem, transform

    @staticmethod
    def save_dem(dem: np.ndarray, transform: Dict, path: str) -> None:
        """Write a DEM as an ESRI ASCII grid (.asc — QGIS/GDAL-readable
        plain text, no GIS dependency) or .npy; a transform sidecar JSON
        (including geospatial metadata) is written next to either."""
        import json

        dem = np.asarray(dem, dtype=np.float64)
        if path.endswith(".npy"):
            np.save(path, dem)
        else:
            nodata = -9999.0
            body = np.where(np.isfinite(dem), dem, nodata)
            with open(path, "w") as f:
                f.write(f"ncols {transform['ncols']}\n"
                        f"nrows {transform['nrows']}\n"
                        f"xllcorner {transform['x_origin']}\n"
                        f"yllcorner {transform['z_origin']}\n"
                        f"cellsize {transform['cellsize']}\n"
                        f"NODATA_value {nodata}\n")
                for row in body:
                    f.write(" ".join(f"{v:.6g}" for v in row) + "\n")
        sidecar = os.path.splitext(path)[0] + "_transform.json"
        with open(sidecar, "w") as f:
            json.dump(transform, f, indent=2)

    @staticmethod
    def load_dem(path: str) -> Tuple[np.ndarray, Dict]:
        """Read back an ESRI ASCII grid written by save_dem (NODATA -> NaN)."""
        header = {}
        rows = []
        with open(path) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                if parts[0].lstrip("-").replace(".", "", 1).isdigit():
                    rows.append([float(v) for v in parts])
                else:
                    header[parts[0].lower()] = float(parts[1])
        dem = np.asarray(rows, dtype=np.float64)
        nodata = header.get("nodata_value", -9999.0)
        dem[dem == nodata] = np.nan
        transform = {
            "ncols": int(header["ncols"]),
            "nrows": int(header["nrows"]),
            "x_origin": header["xllcorner"],
            "z_origin": header["yllcorner"],
            "cellsize": header["cellsize"],
        }
        return dem, transform

    # ---------------------------------------------------------------- io
    @staticmethod
    def save_point_cloud(points: np.ndarray, colors: Optional[np.ndarray],
                         path: str, binary: bool = True):
        """Write a PLY point cloud (API implied by reference
        test_mars_depth.py:196; from-scratch writer, no Open3D)."""
        points = np.asarray(points, dtype=np.float32)
        if binary:
            # Prefer the C++ writer when built (native/monodepth_native.cpp).
            from monodepth_tpu import native as _native

            if _native.available():
                c = None
                if colors is not None:
                    c = np.asarray(colors)
                return _native.write_ply(path, points, c)
        n = len(points)
        has_color = colors is not None
        if has_color:
            c = np.asarray(colors)
            if c.dtype != np.uint8:
                c = (np.clip(c, 0, 1 if c.max() <= 1 else 255)).astype(np.float64)
                if c.max() <= 1:
                    c = c * 255
                c = c.astype(np.uint8)
        header = ["ply",
                  "format binary_little_endian 1.0" if binary else "format ascii 1.0",
                  f"element vertex {n}",
                  "property float x", "property float y", "property float z"]
        if has_color:
            header += ["property uchar red", "property uchar green", "property uchar blue"]
        header += ["end_header"]
        with open(path, "wb") as f:
            f.write(("\n".join(header) + "\n").encode())
            if binary:
                if has_color:
                    rec = np.zeros(n, dtype=[("xyz", np.float32, 3), ("rgb", np.uint8, 3)])
                    rec["xyz"] = points
                    rec["rgb"] = c
                    f.write(rec.tobytes())
                else:
                    f.write(points.astype("<f4").tobytes())
            else:
                for i in range(n):
                    row = f"{points[i,0]} {points[i,1]} {points[i,2]}"
                    if has_color:
                        row += f" {c[i,0]} {c[i,1]} {c[i,2]}"
                    f.write((row + "\n").encode())
        return path

    @staticmethod
    def _parse_ply(path: str):
        """Minimal PLY parser (binary_little_endian / ascii, float32 xyz +
        optional uchar rgb vertices, optional int32 triangle faces) —
        the formats `save_point_cloud` / `save_mesh` emit.  Enables
        save -> load -> evaluate round-trips (VERDICT r1 item 8)."""
        with open(path, "rb") as f:
            data = f.read()
        end = data.index(b"end_header\n") + len(b"end_header\n")
        header = data[:end].decode().splitlines()
        body = data[end:]

        fmt = None
        elements = []  # (name, count, [(prop_type, prop_name) or list-spec])
        for line in header:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                elements.append([parts[1], int(parts[2]), []])
            elif parts[0] == "property":
                if parts[1] == "list":
                    elements[-1][2].append(("list", parts[2], parts[3], parts[4]))
                else:
                    elements[-1][2].append((parts[1], parts[2]))
        if fmt not in ("binary_little_endian", "ascii"):
            raise ValueError(f"unsupported PLY format {fmt!r}")

        np_types = {"float": "<f4", "float32": "<f4", "double": "<f8",
                    "uchar": "u1", "uint8": "u1", "int": "<i4", "int32": "<i4"}
        out = {}
        offset = 0
        text_rows = body.decode().splitlines() if fmt == "ascii" else None
        row_idx = 0
        for name, count, props in elements:
            if any(p[0] == "list" for p in props):
                # face element: uchar count + int32 x3 (as our writer emits)
                if fmt == "binary_little_endian":
                    dt = np.dtype([("n", "u1"), ("idx", "<i4", 3)])
                    rec = np.frombuffer(body, dt, count, offset)
                    offset += dt.itemsize * count
                    out[name] = rec["idx"].copy()
                else:
                    rows = [list(map(int, text_rows[row_idx + i].split()))
                            for i in range(count)]
                    row_idx += count
                    out[name] = np.asarray([r[1:4] for r in rows], np.int32)
            else:
                dt = np.dtype([(p[1], np_types[p[0]]) for p in props])
                if fmt == "binary_little_endian":
                    rec = np.frombuffer(body, dt, count, offset)
                    offset += dt.itemsize * count
                else:
                    vals = [text_rows[row_idx + i].split() for i in range(count)]
                    row_idx += count
                    rec = np.zeros(count, dt)
                    for j, p in enumerate(props):
                        rec[p[1]] = np.asarray(
                            [v[j] for v in vals],
                            np.float64 if "f" in np_types[p[0]] else np.int64)
                out[name] = rec
        return out

    @classmethod
    def load_point_cloud(cls, path: str):
        """Read a PLY point cloud -> (points [N,3] f32, colors [N,3] f32 in
        [0,1] or None).  Inverse of `save_point_cloud`."""
        parsed = cls._parse_ply(path)
        rec = parsed["vertex"]
        points = np.stack([rec["x"], rec["y"], rec["z"]], axis=1).astype(np.float32)
        colors = None
        if "red" in rec.dtype.names:
            colors = np.stack([rec["red"], rec["green"], rec["blue"]],
                              axis=1).astype(np.float32) / 255.0
        return points, colors

    @classmethod
    def load_mesh(cls, path: str) -> Mesh:
        """Read a PLY (or OBJ) mesh.  Inverse of `save_mesh`."""
        if os.path.splitext(path)[1].lower() == ".obj":
            verts, faces = [], []
            with open(path) as f:
                for line in f:
                    parts = line.split()
                    if not parts:
                        continue
                    if parts[0] == "v":
                        verts.append([float(x) for x in parts[1:4]])
                    elif parts[0] == "f":
                        faces.append([int(p.split("/")[0]) - 1 for p in parts[1:4]])
            return Mesh(vertices=np.asarray(verts, np.float32),
                        triangles=np.asarray(faces, np.int32))
        parsed = cls._parse_ply(path)
        rec = parsed["vertex"]
        colors = None
        if "red" in rec.dtype.names:
            colors = np.stack([rec["red"], rec["green"], rec["blue"]],
                              axis=1).astype(np.float32) / 255.0
        return Mesh(
            vertices=np.stack([rec["x"], rec["y"], rec["z"]], axis=1).astype(np.float32),
            triangles=parsed.get("face", np.zeros((0, 3), np.int32)),
            colors=colors,
        )

    @staticmethod
    def save_mesh(mesh: Mesh, path: str):
        """Write a mesh as PLY or OBJ by extension (API implied by reference
        test_mars_depth.py:203, 330)."""
        ext = os.path.splitext(path)[1].lower()
        v, t = mesh.vertices, mesh.triangles
        if ext == ".obj":
            with open(path, "w") as f:
                for p in v:
                    f.write(f"v {p[0]} {p[1]} {p[2]}\n")
                for tri in t:
                    f.write(f"f {tri[0]+1} {tri[1]+1} {tri[2]+1}\n")
            return path
        # default: binary PLY with faces
        has_color = mesh.colors is not None
        header = ["ply", "format binary_little_endian 1.0",
                  f"element vertex {len(v)}",
                  "property float x", "property float y", "property float z"]
        if has_color:
            header += ["property uchar red", "property uchar green", "property uchar blue"]
        header += [f"element face {len(t)}",
                   "property list uchar int vertex_indices", "end_header"]
        with open(path, "wb") as f:
            f.write(("\n".join(header) + "\n").encode())
            if has_color:
                c = np.clip(mesh.colors, 0, 1)
                c = (c * 255).astype(np.uint8)
                rec = np.zeros(len(v), dtype=[("xyz", np.float32, 3), ("rgb", np.uint8, 3)])
                rec["xyz"] = v.astype(np.float32)
                rec["rgb"] = c[:, :3]
                f.write(rec.tobytes())
            else:
                f.write(v.astype("<f4").tobytes())
            face = np.zeros(len(t), dtype=[("n", np.uint8), ("idx", "<i4", 3)])
            face["n"] = 3
            face["idx"] = t.astype(np.int32)
            f.write(face.tobytes())
        return path


class DegenerateDepthError(ValueError):
    """Raised when the model emits a constant disparity map (the failure the
    reference detects at terrain_reconstruction.py:449-466 before silently
    substituting synthetic depth — we detect and fail loudly instead).

    `diagnostics` carries std / range / min / max / source / input_shape.
    """

    def __init__(self, message: str, diagnostics: Optional[Dict] = None):
        self.diagnostics = diagnostics or {}
        detail = ", ".join(f"{k}={v}" for k, v in self.diagnostics.items())
        super().__init__(f"{message} [{detail}]" if detail else message)


class MarsTerrainMapper:
    """Depth inference + terrain reconstruction driver.

    Mirrors the reference's fixed mapper (terrain_reconstruction_fixed.py:112-
    300): `infer_depth` runs the jitted model and converts disparity with
    `disp_to_depth` (the mapper path, unlike the CLI's raw reciprocal), then
    resizes back; `process_image` produces points+colors; `process_batch`
    loops a folder; `process_image_to_mesh` / `process_image_sequence` build
    and stitch meshes.  No synthetic-depth fallbacks — errors propagate
    (README promise honored; SURVEY.md §5).
    """

    def __init__(self, estimator=None, config=None,
                 min_depth: float = 0.1, max_depth: float = 100.0):
        if estimator is None:
            from monodepth_tpu.inference import MarsDepthEstimator

            estimator = MarsDepthEstimator(config)
        self.estimator = estimator
        self.min_depth = min_depth
        self.max_depth = max_depth
        self.reconstructor = TerrainReconstructor(min_depth, max_depth)

    def infer_depth(self, image: np.ndarray, metadata=None,
                    retry_size: int = 256) -> np.ndarray:
        """Image [H, W, 3] -> depth [H, W] via disp_to_depth(min, max).

        Degenerate-output handling (reference terrain_reconstruction.py:
        449-490): a constant disparity map (range < 1e-6) triggers ONE
        retry at `retry_size` x `retry_size` — the honest half of the
        reference's behavior.  If the retry is also constant, this raises
        `DegenerateDepthError` with diagnostics instead of synthesizing a
        gradient-based fake depth (which the reference's own README
        disavows: "No gradient pattern fallbacks").
        """
        from monodepth_tpu.layers import disp_to_depth

        disp = self._checked_disp(image, metadata)
        if disp is None and retry_size:
            from PIL import Image as _PILImage

            img = np.asarray(image)
            arr = img if img.dtype == np.uint8 else (
                np.clip(img, 0, 1) * 255).astype(np.uint8)
            small = np.asarray(
                _PILImage.fromarray(arr).resize((retry_size, retry_size),
                                                _PILImage.BILINEAR),
                dtype=np.float32) / 255.0
            disp_small = self._checked_disp(small, metadata)
            if disp_small is not None:
                h, w = np.asarray(image).shape[:2]
                disp = np.asarray(_PILImage.fromarray(disp_small).resize(
                    (w, h), _PILImage.BILINEAR))
        if disp is None:
            raise DegenerateDepthError(
                "model produced a (near-)constant disparity map and a "
                f"{retry_size}x{retry_size} retry did not recover",
                diagnostics=self._disp_diagnostics(image, metadata),
            )
        _, depth = disp_to_depth(disp, self.min_depth, self.max_depth)
        return np.asarray(depth)

    DEGENERATE_RANGE = 1e-6  # reference terrain_reconstruction.py:452

    def _checked_disp(self, image, metadata):
        """Predict disparity; None when degenerate (constant), raise on
        non-finite values."""
        disp = self.estimator.predict(image, metadata)["disp"]
        if not np.isfinite(disp).all():
            raise ValueError("model produced non-finite disparity")
        if float(disp.max() - disp.min()) < self.DEGENERATE_RANGE:
            return None
        return disp

    def _disp_diagnostics(self, image, metadata):
        disp = self.estimator.predict(image, metadata)["disp"]
        return {
            "std": float(disp.std()),
            "range": float(disp.max() - disp.min()),
            "min": float(disp.min()),
            "max": float(disp.max()),
            "source": (metadata or {}).get("source", "unknown"),
            "input_shape": tuple(np.asarray(image).shape),
        }

    def process_image(self, image: np.ndarray, metadata=None,
                      intrinsics: Optional[np.ndarray] = None):
        """-> (depth, points, colors) with outlier filtering."""
        depth = self.infer_depth(image, metadata)
        img_u8 = image
        if np.asarray(image).dtype != np.uint8:
            img_u8 = (np.clip(np.asarray(image), 0, 1) * 255).astype(np.uint8)
        points, colors = self.reconstructor.reconstruct_terrain(depth, img_u8, intrinsics)
        points, colors = self.reconstructor.filter_and_downsample(points, colors)
        return depth, points, colors

    def process_image_to_mesh(self, image: np.ndarray, metadata=None,
                              intrinsics: Optional[np.ndarray] = None,
                              step: int = 2) -> Mesh:
        depth = self.infer_depth(image, metadata)
        if metadata:
            self.reconstructor.add_geospatial_reference(dict(metadata))
        return self.reconstructor.grid_mesh_from_depth(
            depth, image, intrinsics, step=step
        )

    def process_image_to_dem(self, image: np.ndarray, metadata=None,
                             resolution: Optional[float] = None,
                             grid_shape: Tuple[int, int] = (256, 256),
                             intrinsics: Optional[np.ndarray] = None):
        """Image -> depth -> filtered point cloud -> gridded DEM
        (TerrainReconstructor.export_dem).  Returns (dem, transform)."""
        depth = self.infer_depth(image, metadata)
        if metadata:
            self.reconstructor.add_geospatial_reference(dict(metadata))
        points, _ = self.reconstructor.create_point_cloud(depth, intrinsics)
        points, _ = self.reconstructor.filter_and_downsample(points)
        return self.reconstructor.export_dem(
            points, resolution=resolution, grid_shape=grid_shape)

    def process_image_sequence(self, images: Sequence[np.ndarray],
                               metadatas: Optional[Sequence] = None,
                               step: int = 2) -> Mesh:
        metadatas = metadatas or [None] * len(images)
        meshes = [
            self.process_image_to_mesh(im, md, step=step)
            for im, md in zip(images, metadatas)
        ]
        return self.reconstructor.stitch_meshes(meshes)

    def process_image_with_visualization(self, image: np.ndarray, save_path: str,
                                         metadata=None, max_points: int = 10000):
        """4-panel figure: input | disparity | depth | 3-D scatter with a
        10k-point downsample (reference terrain_reconstruction_fixed.py:226-266)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        result = self.estimator.predict(image, metadata)
        from monodepth_tpu.layers import disp_to_depth as _d2d

        disp = result["disp"]
        _, depth = _d2d(disp, self.min_depth, self.max_depth)
        depth = np.asarray(depth)
        points, colors = self.reconstructor.reconstruct_terrain(
            depth, (np.clip(np.asarray(image), 0, 1) * 255).astype(np.uint8)
        )
        if len(points) > max_points:
            idx = np.random.default_rng(0).choice(len(points), max_points, replace=False)
            points, colors = points[idx], colors[idx] if colors is not None else None

        fig = plt.figure(figsize=(20, 5))
        ax = fig.add_subplot(1, 4, 1)
        ax.imshow(np.asarray(image))
        ax.set_title("Input")
        ax.axis("off")
        ax = fig.add_subplot(1, 4, 2)
        im = ax.imshow(disp, cmap="magma")
        ax.set_title("Disparity")
        ax.axis("off")
        fig.colorbar(im, ax=ax, shrink=0.7)
        ax = fig.add_subplot(1, 4, 3)
        im = ax.imshow(depth, cmap="viridis")
        ax.set_title("Depth")
        ax.axis("off")
        fig.colorbar(im, ax=ax, shrink=0.7)
        ax = fig.add_subplot(1, 4, 4, projection="3d")
        kwargs = {"c": colors / 255.0} if colors is not None else {}
        ax.scatter(points[:, 0], points[:, 1], -points[:, 2], s=1, **kwargs)
        ax.set_title("3D Terrain")
        fig.tight_layout()
        fig.savefig(save_path)
        plt.close(fig)
        return depth, save_path

    def process_batch(self, image_paths: Sequence[str], output_dir: str,
                      source: str = "auto", max_size: int = 1024):
        """Folder driver: per-image PLY + depth .npy."""
        from monodepth_tpu.inference import detect_source, load_image

        os.makedirs(output_dir, exist_ok=True)
        results = []
        for path in image_paths:
            img = load_image(path, max_size)
            metadata = {"source": detect_source(path, source)}
            depth, points, colors = self.process_image(img, metadata)
            name = os.path.splitext(os.path.basename(path))[0]
            np.save(os.path.join(output_dir, f"{name}_depth.npy"), depth)
            ply = os.path.join(output_dir, f"{name}.ply")
            self.reconstructor.save_point_cloud(points, colors, ply)
            results.append({"path": path, "ply": ply, "points": len(points)})
        return results
