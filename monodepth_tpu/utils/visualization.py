"""Mars terrain visualization (capability of reference utils/visualization.py).

`MarsTerrainVisualizer` provides: Mars-themed colormaps, percentile-robust
depth colorization, side-by-side depth figures, 3-D terrain rendering
(matplotlib surface; Open3D used when available), point-cloud and mesh views,
depth videos, flythrough videos along orbit trajectories, and comparison
grids.  Optional dependencies (Open3D) degrade gracefully, mirroring the
reference's OPEN3D_AVAILABLE gating (visualization.py:14-19).
"""

from __future__ import annotations

from typing import Optional, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
from matplotlib.colors import LinearSegmentedColormap

try:  # pragma: no cover - optional dependency
    import open3d as o3d

    OPEN3D_AVAILABLE = True
except ImportError:  # pragma: no cover
    o3d = None
    OPEN3D_AVAILABLE = False

__all__ = ["MarsTerrainVisualizer", "OPEN3D_AVAILABLE"]


def _mars_terrain_cmap():
    """Rust/ochre terrain colormap (reference visualization.py:42-52)."""
    colors = [
        (0.2, 0.08, 0.03),
        (0.45, 0.17, 0.07),
        (0.65, 0.28, 0.12),
        (0.80, 0.45, 0.22),
        (0.92, 0.65, 0.42),
        (1.00, 0.85, 0.65),
    ]
    return LinearSegmentedColormap.from_list("mars_terrain", colors)


def _mars_elevation_cmap():
    """Blue-lowland to red-highland elevation map (reference :54-62)."""
    colors = [
        (0.10, 0.15, 0.45),
        (0.20, 0.45, 0.60),
        (0.45, 0.65, 0.35),
        (0.80, 0.65, 0.25),
        (0.75, 0.30, 0.15),
        (0.95, 0.90, 0.85),
    ]
    return LinearSegmentedColormap.from_list("mars_elevation", colors)


class MarsTerrainVisualizer:
    """Depth / terrain visualization with Mars-specific colormaps."""

    def __init__(self, min_depth: float = 0.1, max_depth: float = 100.0):
        self.min_depth = min_depth
        self.max_depth = max_depth
        self.terrain_cmap = _mars_terrain_cmap()
        self.elevation_cmap = _mars_elevation_cmap()

    # ----------------------------------------------------------- colorize
    def colorize_depth(self, depth: np.ndarray, cmap=None, percentile: float = 95.0):
        """Depth -> RGB uint8 with 95th-percentile vmax robustness
        (reference visualization.py:64-105)."""
        depth = np.asarray(depth, dtype=np.float32)
        finite = depth[np.isfinite(depth)]
        vmin = float(finite.min()) if finite.size else 0.0
        vmax = float(np.percentile(finite, percentile)) if finite.size else 1.0
        if vmax <= vmin:
            vmax = vmin + 1e-6
        norm = np.clip((depth - vmin) / (vmax - vmin), 0, 1)
        cmap = cmap or self.terrain_cmap
        rgba = cmap(norm)
        return (rgba[..., :3] * 255).astype(np.uint8)

    # ------------------------------------------------------------ figures
    def visualize_depth_map(
        self, image, depth, save_path: Optional[str] = None, show: bool = False,
        title: str = "Mars Terrain Depth",
    ):
        """Side-by-side input / colorized-depth figure with colorbar
        (reference visualization.py:107-171)."""
        fig, axes = plt.subplots(1, 2, figsize=(14, 6))
        axes[0].imshow(np.asarray(image))
        axes[0].set_title("Input Image")
        axes[0].axis("off")
        im = axes[1].imshow(depth, cmap=self.elevation_cmap)
        axes[1].set_title(title)
        axes[1].axis("off")
        fig.colorbar(im, ax=axes[1], shrink=0.8)
        fig.tight_layout()
        if save_path:
            fig.savefig(save_path)
        if show:  # pragma: no cover
            plt.show()
        plt.close(fig)
        return save_path

    def visualize_3d_terrain(
        self, depth, image=None, save_path: Optional[str] = None, show: bool = False,
        stride: int = 4,
    ):
        """3-D terrain surface (matplotlib; reference visualization.py:173-249
        uses Open3D with a matplotlib fallback — the fallback is the portable
        path here)."""
        depth = np.asarray(depth, dtype=np.float32)
        h, w = depth.shape[:2]
        ys, xs = np.mgrid[0:h:stride, 0:w:stride]
        zs = depth[::stride, ::stride]
        fig = plt.figure(figsize=(10, 8))
        ax = fig.add_subplot(111, projection="3d")
        if image is not None:
            img = np.asarray(image, dtype=np.float32)
            if img.max() > 1:
                img = img / 255.0
            colors = img[::stride, ::stride].reshape(-1, img.shape[-1])
            ax.scatter(xs.ravel(), ys.ravel(), -zs.ravel(), c=colors, s=2)
        else:
            ax.plot_surface(xs, ys, -zs, cmap=self.elevation_cmap, linewidth=0)
        ax.set_title("3D Terrain Reconstruction")
        if save_path:
            fig.savefig(save_path)
        if show:  # pragma: no cover
            plt.show()
        plt.close(fig)
        return save_path

    def visualize_point_cloud(self, points, colors=None, save_path=None, show=False):
        """Point-cloud scatter (Open3D when available, else matplotlib;
        reference visualization.py:251-358)."""
        points = np.asarray(points)
        if points.shape[0] > 20000:
            idx = np.random.default_rng(0).choice(points.shape[0], 20000, replace=False)
            points = points[idx]
            if colors is not None:
                colors = np.asarray(colors)[idx]
        if OPEN3D_AVAILABLE and show:  # pragma: no cover
            pcd = o3d.geometry.PointCloud()
            pcd.points = o3d.utility.Vector3dVector(points)
            if colors is not None:
                c = np.asarray(colors, dtype=np.float64)
                if c.max() > 1:
                    c = c / 255.0
                pcd.colors = o3d.utility.Vector3dVector(c)
            o3d.visualization.draw_geometries([pcd])
            return save_path
        fig = plt.figure(figsize=(10, 8))
        ax = fig.add_subplot(111, projection="3d")
        kwargs = {}
        if colors is not None:
            c = np.asarray(colors, dtype=np.float32)
            if c.max() > 1:
                c = c / 255.0
            kwargs["c"] = c
        ax.scatter(points[:, 0], points[:, 1], points[:, 2], s=1, **kwargs)
        ax.set_title("Mars Terrain Point Cloud")
        if save_path:
            fig.savefig(save_path)
        plt.close(fig)
        return save_path

    def visualize_mesh(self, mesh, save_path: Optional[str] = None,
                       show: bool = False, max_triangles: int = 20000):
        """Triangle-mesh render (reference visualization.py:360-381 uses
        Open3D; this portable path draws a matplotlib trisurf)."""
        import numpy as _np

        v = _np.asarray(mesh.vertices)
        t = _np.asarray(mesh.triangles)
        if len(t) > max_triangles:
            idx = np.random.default_rng(0).choice(len(t), max_triangles, replace=False)
            t = t[idx]
        fig = plt.figure(figsize=(10, 8))
        ax = fig.add_subplot(111, projection="3d")
        ax.plot_trisurf(v[:, 0], v[:, 1], -v[:, 2], triangles=t,
                        cmap=self.elevation_cmap, linewidth=0, antialiased=False)
        ax.set_title("Mars Terrain Mesh")
        if save_path:
            fig.savefig(save_path)
        if show:  # pragma: no cover
            plt.show()
        plt.close(fig)
        return save_path

    # ------------------------------------------------------------- videos
    def create_depth_video(
        self, images: Sequence, depths: Sequence, save_path: str, fps: int = 10
    ):
        """Side-by-side RGB|depth mp4 (reference visualization.py:383-464)."""
        import cv2

        assert len(images) == len(depths) and len(images) > 0
        first = np.asarray(images[0])
        h, w = first.shape[:2]
        writer = cv2.VideoWriter(
            save_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w * 2, h)
        )
        try:
            for img, depth in zip(images, depths):
                img = np.asarray(img)
                if img.dtype != np.uint8:
                    img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
                depth_rgb = self.colorize_depth(np.asarray(depth))
                if depth_rgb.shape[:2] != (h, w):
                    depth_rgb = cv2.resize(depth_rgb, (w, h))
                if img.shape[:2] != (h, w):
                    img = cv2.resize(img, (w, h))
                frame = np.concatenate([img, depth_rgb], axis=1)
                writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
        finally:
            writer.release()
        return save_path

    def generate_flythrough_trajectory(
        self, depth, num_frames: int = 60, orbit_height: float = 0.5
    ):
        """Circular orbit with sinusoidal height + look-at poses
        (reference visualization.py:540-599)."""
        depth = np.asarray(depth, dtype=np.float32)
        center = np.array([depth.shape[1] / 2, depth.shape[0] / 2, -float(np.median(depth))])
        radius = max(depth.shape) * 0.75
        poses = []
        for i in range(num_frames):
            theta = 2 * np.pi * i / num_frames
            eye = center + np.array(
                [
                    radius * np.cos(theta),
                    radius * np.sin(theta),
                    orbit_height * max(depth.shape) * (1 + 0.3 * np.sin(2 * theta)),
                ]
            )
            forward = center - eye
            forward = forward / (np.linalg.norm(forward) + 1e-9)
            up = np.array([0.0, 0.0, 1.0])
            right = np.cross(forward, up)
            right = right / (np.linalg.norm(right) + 1e-9)
            up = np.cross(right, forward)
            pose = np.eye(4)
            pose[:3, 0], pose[:3, 1], pose[:3, 2] = right, up, -forward
            pose[:3, 3] = eye
            poses.append(pose)
        return poses

    def create_flythrough_video(
        self, depth, image=None, save_path: str = "flythrough.mp4",
        num_frames: int = 36, fps: int = 12,
    ):
        """Orbit flythrough video rendered with matplotlib 3-D views
        (the portable equivalent of reference visualization.py:466-538's
        Open3D offscreen renderer)."""
        import cv2

        depth = np.asarray(depth, dtype=np.float32)
        stride = max(1, max(depth.shape) // 128)
        h, w = depth.shape
        ys, xs = np.mgrid[0:h:stride, 0:w:stride]
        zs = depth[::stride, ::stride]
        size = (640, 480)
        writer = cv2.VideoWriter(save_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, size)
        try:
            for i in range(num_frames):
                azim = 360.0 * i / num_frames
                elev = 35 + 15 * np.sin(2 * np.pi * i / num_frames)
                fig = plt.figure(figsize=(size[0] / 100, size[1] / 100), dpi=100)
                ax = fig.add_subplot(111, projection="3d")
                ax.plot_surface(
                    xs, ys, -zs, cmap=self.elevation_cmap, linewidth=0, antialiased=False
                )
                ax.view_init(elev=elev, azim=azim)
                ax.axis("off")
                fig.tight_layout(pad=0)
                fig.canvas.draw()
                frame = np.asarray(fig.canvas.buffer_rgba())[..., :3]
                plt.close(fig)
                frame = cv2.resize(frame, size)
                writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
        finally:
            writer.release()
        return save_path

    # --------------------------------------------------------------- grid
    def create_depth_comparison_grid(
        self, images, depth_maps_list, labels, save_path=None, show=False
    ):
        """Rows = images, cols = input + each method's depth
        (reference visualization.py:601-674)."""
        n_rows = len(images)
        n_cols = 1 + len(depth_maps_list)
        fig, axes = plt.subplots(
            n_rows, n_cols, figsize=(4 * n_cols, 3.2 * n_rows), squeeze=False
        )
        for r in range(n_rows):
            axes[r][0].imshow(np.asarray(images[r]))
            axes[r][0].axis("off")
            if r == 0:
                axes[r][0].set_title("Input")
            for c, (depths, label) in enumerate(zip(depth_maps_list, labels)):
                ax = axes[r][c + 1]
                ax.imshow(np.asarray(depths[r]), cmap=self.elevation_cmap)
                ax.axis("off")
                if r == 0:
                    ax.set_title(label)
        fig.tight_layout()
        if save_path:
            fig.savefig(save_path)
        if show:  # pragma: no cover
            plt.show()
        plt.close(fig)
        return save_path
