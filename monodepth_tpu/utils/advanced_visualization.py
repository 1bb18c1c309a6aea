"""Advanced Mars visualization (capability of reference utils/advanced_visualization.py).

`AdvancedMarsVisualizer` provides:
- multi-view panels: RGB / depth / uncertainty / normals + 3-D surface +
  contours (reference :139-288)
- interactive HTML visualizations and orbit flyover animations.  The plotly
  *library* is unavailable in this environment, so these emit self-contained
  HTML that loads plotly.js from its CDN and builds the figures from embedded
  JSON — the artifact type (an `_interactive.html` / `_flyover.html` file the
  user opens in a browser) matches the reference (:290-494)
- depth-uncertainty alpha overlay (:495-581)
- terrain features: slope = |∇depth|, roughness = local variance
  (uniform_filter size 5), curvature = Laplacian (:583-681)
- red-cyan anaglyph via per-pixel depth parallax — vectorized gather instead
  of the reference's O(H·W) Python loop (:683-769; SURVEY.md §7 step 7)
"""

from __future__ import annotations

import json
from typing import Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
from matplotlib.colors import LinearSegmentedColormap

from monodepth_tpu.utils.visualization import MarsTerrainVisualizer

__all__ = ["AdvancedMarsVisualizer"]

_PLOTLY_CDN = "https://cdn.plot.ly/plotly-2.32.0.min.js"


def _uncertainty_cmap():
    """Thermal blue->red uncertainty colormap (reference :42-72)."""
    colors = [(0.05, 0.05, 0.4), (0.1, 0.4, 0.8), (0.9, 0.9, 0.2), (0.9, 0.2, 0.1)]
    return LinearSegmentedColormap.from_list("thermal_uncertainty", colors)


def _downsample_for_web(arr: np.ndarray, max_dim: int = 256) -> np.ndarray:
    stride = max(1, int(np.ceil(max(arr.shape[:2]) / max_dim)))
    return arr[::stride, ::stride]


def _write_plotly_html(path: str, figure: dict, title: str) -> str:
    html = f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<script src="{_PLOTLY_CDN}"></script></head>
<body><div id="fig" style="width:100%;height:95vh;"></div>
<script>
const fig = {json.dumps(figure)};
Plotly.newPlot("fig", fig.data, fig.layout, {{responsive: true}});
{"Plotly.addFrames('fig', fig.frames);" if figure.get("frames") else ""}
</script></body></html>"""
    with open(path, "w") as f:
        f.write(html)
    return path


class AdvancedMarsVisualizer:
    """Advanced multi-panel / interactive / anaglyph visualization."""

    def __init__(self, min_depth: float = 0.1, max_depth: float = 100.0):
        self.min_depth = min_depth
        self.max_depth = max_depth
        self.base = MarsTerrainVisualizer(min_depth, max_depth)
        self.uncertainty_cmap = _uncertainty_cmap()

    # ------------------------------------------------------------ normals
    @staticmethod
    def compute_normals(depth: np.ndarray) -> np.ndarray:
        """Surface normals from depth gradients, RGB-encoded in [0, 1]."""
        depth = np.asarray(depth, dtype=np.float32)
        gy, gx = np.gradient(depth)
        n = np.stack([-gx, -gy, np.ones_like(depth)], axis=-1)
        n = n / (np.linalg.norm(n, axis=-1, keepdims=True) + 1e-9)
        return (n + 1.0) / 2.0

    # ---------------------------------------------------------- multiview
    def create_multi_view_visualization(
        self, image, depth, uncertainty=None, normals=None,
        save_path: Optional[str] = None, show: bool = False, view_3d: bool = True,
    ):
        """2x3 panel: RGB, depth, uncertainty/normals, contours, 3-D surface
        (reference :139-288)."""
        depth = np.asarray(depth, dtype=np.float32)
        if normals is None:
            normals = self.compute_normals(depth)

        fig = plt.figure(figsize=(20, 10))
        ax = fig.add_subplot(2, 3, 1)
        ax.imshow(np.asarray(image))
        ax.set_title("Input Image")
        ax.axis("off")

        ax = fig.add_subplot(2, 3, 2)
        im = ax.imshow(depth, cmap=self.base.elevation_cmap)
        ax.set_title("Depth Map")
        ax.axis("off")
        fig.colorbar(im, ax=ax, shrink=0.7)

        ax = fig.add_subplot(2, 3, 3)
        if uncertainty is not None:
            im = ax.imshow(np.asarray(uncertainty), cmap=self.uncertainty_cmap)
            ax.set_title("Uncertainty")
            fig.colorbar(im, ax=ax, shrink=0.7)
        else:
            ax.imshow(normals)
            ax.set_title("Surface Normals")
        ax.axis("off")

        ax = fig.add_subplot(2, 3, 4)
        ax.imshow(normals)
        ax.set_title("Surface Normals")
        ax.axis("off")

        ax = fig.add_subplot(2, 3, 5)
        cs = ax.contourf(depth[::-1], levels=15, cmap=self.base.elevation_cmap)
        ax.set_title("Depth Contours")
        fig.colorbar(cs, ax=ax, shrink=0.7)

        if view_3d:
            ax = fig.add_subplot(2, 3, 6, projection="3d")
            d = _downsample_for_web(depth, 128)
            ys, xs = np.mgrid[0:d.shape[0], 0:d.shape[1]]
            ax.plot_surface(xs, ys, -d, cmap=self.base.elevation_cmap,
                            linewidth=0, antialiased=False)
            ax.set_title("3D Terrain")

        fig.tight_layout()
        if save_path:
            fig.savefig(save_path)
        if show:  # pragma: no cover
            plt.show()
        plt.close(fig)
        return save_path

    # -------------------------------------------------------- interactive
    def create_interactive_visualization(
        self, image, depth, uncertainty=None, save_path: str = "interactive",
    ):
        """Interactive HTML: image, depth heatmap, 3-D surface, uncertainty
        (reference :290-378; emitted as plotly.js HTML)."""
        depth_w = _downsample_for_web(np.asarray(depth, dtype=np.float32))
        img_w = _downsample_for_web(np.asarray(image))
        if img_w.dtype != np.uint8:
            img_w = (np.clip(img_w, 0, 1) * 255).astype(np.uint8)

        data = [
            {
                "type": "image",
                "z": img_w.tolist(),
                "xaxis": "x", "yaxis": "y",
            },
            {
                "type": "heatmap",
                "z": depth_w.tolist(),
                "colorscale": "YlOrRd",
                "xaxis": "x2", "yaxis": "y2",
                "colorbar": {"x": 1.0, "len": 0.4, "y": 0.8},
            },
            {
                "type": "surface",
                "z": (-depth_w).tolist(),
                "colorscale": "Earth",
                "scene": "scene",
                "showscale": False,
            },
        ]
        if uncertainty is not None:
            unc_w = _downsample_for_web(np.asarray(uncertainty, dtype=np.float32))
            data.append(
                {
                    "type": "heatmap",
                    "z": unc_w.tolist(),
                    "colorscale": "Hot",
                    "xaxis": "x3", "yaxis": "y3",
                    "colorbar": {"x": 1.0, "len": 0.4, "y": 0.2},
                }
            )
        layout = {
            "title": "Mars Terrain Interactive Analysis",
            "grid": {"rows": 2, "columns": 2, "pattern": "independent"},
            "scene": {"domain": {"x": [0.0, 0.5], "y": [0.0, 0.5]},
                      "aspectmode": "data"},
            "yaxis": {"autorange": "reversed"},
            "yaxis2": {"autorange": "reversed"},
            "yaxis3": {"autorange": "reversed"},
        }
        path = save_path if save_path.endswith(".html") else save_path + ".html"
        return _write_plotly_html(path, {"data": data, "layout": layout},
                                  "Mars Terrain Interactive")

    def create_terrain_flyover_animation(
        self, depth, image=None, save_path: str = "flyover", num_frames: int = 36,
    ):
        """Orbiting-camera surface animation -> `*_flyover.html`
        (reference :380-494)."""
        depth_w = _downsample_for_web(np.asarray(depth, dtype=np.float32), 128)
        surface = {
            "type": "surface",
            "z": (-depth_w).tolist(),
            "colorscale": "Earth",
            "showscale": False,
        }
        frames = []
        for i in range(num_frames):
            theta = 2 * np.pi * i / num_frames
            eye = {
                "x": 1.8 * np.cos(theta),
                "y": 1.8 * np.sin(theta),
                "z": 0.8 + 0.3 * np.sin(2 * theta),
            }
            frames.append({
                "name": f"f{i}",
                "layout": {"scene": {"camera": {"eye": eye}}},
            })
        layout = {
            "title": "Mars Terrain Flyover",
            "scene": {"aspectmode": "data",
                      "camera": {"eye": {"x": 1.8, "y": 0.0, "z": 0.8}}},
            "updatemenus": [{
                "type": "buttons",
                "buttons": [{
                    "label": "Play",
                    "method": "animate",
                    "args": [None, {"frame": {"duration": 80, "redraw": False},
                                     "transition": {"duration": 0},
                                     "fromcurrent": True}],
                }],
            }],
        }
        if save_path.endswith(".html"):
            path = save_path
        elif save_path.endswith("_flyover"):
            path = save_path + ".html"
        else:
            path = save_path + "_flyover.html"
        return _write_plotly_html(
            path, {"data": [surface], "layout": layout, "frames": frames},
            "Mars Terrain Flyover",
        )

    # -------------------------------------------------------- uncertainty
    def create_depth_uncertainty_visualization(
        self, image, depth, uncertainty, save_path=None, show=False, alpha=0.55,
    ):
        """Depth map with alpha-blended uncertainty overlay (reference :495-581)."""
        depth = np.asarray(depth, dtype=np.float32)
        unc = np.asarray(uncertainty, dtype=np.float32)
        fig, axes = plt.subplots(1, 3, figsize=(19, 6))
        axes[0].imshow(np.asarray(image))
        axes[0].set_title("Input")
        axes[0].axis("off")
        im = axes[1].imshow(depth, cmap=self.base.elevation_cmap)
        axes[1].set_title("Depth")
        axes[1].axis("off")
        fig.colorbar(im, ax=axes[1], shrink=0.8)
        axes[2].imshow(depth, cmap=self.base.elevation_cmap)
        im = axes[2].imshow(unc, cmap=self.uncertainty_cmap, alpha=alpha)
        axes[2].set_title("Depth + Uncertainty")
        axes[2].axis("off")
        fig.colorbar(im, ax=axes[2], shrink=0.8)
        fig.tight_layout()
        if save_path:
            fig.savefig(save_path)
        if show:  # pragma: no cover
            plt.show()
        plt.close(fig)
        return save_path

    # ----------------------------------------------------------- features
    @staticmethod
    def compute_terrain_features(depth: np.ndarray):
        """slope = |∇depth|, roughness = local std (window 5),
        curvature = Laplacian (reference :607-623)."""
        import scipy.ndimage as ndi

        depth = np.asarray(depth, dtype=np.float32)
        gy, gx = np.gradient(depth)
        slope = np.sqrt(gx**2 + gy**2)
        local_mean = ndi.uniform_filter(depth, size=5)
        local_sq = ndi.uniform_filter(depth**2, size=5)
        roughness = np.sqrt(np.maximum(local_sq - local_mean**2, 0.0))
        curvature = ndi.laplace(depth)
        return slope, roughness, curvature

    def visualize_terrain_features(self, depth, image=None, save_path=None, show=False):
        """2x2 panel: image/depth + slope, roughness, curvature (reference :583-681)."""
        slope, roughness, curvature = self.compute_terrain_features(depth)
        fig, axes = plt.subplots(2, 2, figsize=(14, 11))
        if image is not None:
            axes[0][0].imshow(np.asarray(image))
            axes[0][0].set_title("Input Image")
        else:
            axes[0][0].imshow(np.asarray(depth), cmap=self.base.elevation_cmap)
            axes[0][0].set_title("Depth")
        axes[0][0].axis("off")
        for ax, (arr, title, cmap) in zip(
            [axes[0][1], axes[1][0], axes[1][1]],
            [(slope, "Slope |∇depth|", "inferno"),
             (roughness, "Roughness (local σ)", "viridis"),
             (curvature, "Curvature (Laplacian)", "coolwarm")],
        ):
            im = ax.imshow(arr, cmap=cmap)
            ax.set_title(title)
            ax.axis("off")
            fig.colorbar(im, ax=ax, shrink=0.8)
        fig.tight_layout()
        if save_path:
            fig.savefig(save_path)
        if show:  # pragma: no cover
            plt.show()
        plt.close(fig)
        return save_path

    # ------------------------------------------------------------ anaglyph
    def create_anaglyph_3d(
        self, image, depth, save_path=None, show=False, max_shift: int = 12,
    ):
        """Red-cyan anaglyph via depth-parallax pixel shift.

        Vectorized gather over precomputed per-pixel disparities — replaces
        the reference's per-pixel Python loop (advanced_visualization.py:
        730-741) with an O(1)-dispatch jnp/numpy formulation.
        """
        img = np.asarray(image, dtype=np.float32)
        if img.max() > 1:
            img = img / 255.0
        depth = np.asarray(depth, dtype=np.float32)
        h, w = depth.shape[:2]
        if img.shape[:2] != (h, w):
            import cv2

            img = cv2.resize(img, (w, h))

        finite = depth[np.isfinite(depth)]
        dmin = float(finite.min()) if finite.size else 0.0
        dmax = float(np.percentile(finite, 95)) if finite.size else 1.0
        inv = 1.0 - np.clip((depth - dmin) / (dmax - dmin + 1e-9), 0, 1)
        shift = (inv * max_shift).astype(np.int32)

        cols = np.arange(w)[None, :]
        left_idx = np.clip(cols - shift, 0, w - 1)
        right_idx = np.clip(cols + shift, 0, w - 1)
        rows = np.arange(h)[:, None]
        left = img[rows, left_idx]
        right = img[rows, right_idx]

        anaglyph = np.stack(
            [left[..., 0], right[..., 1], right[..., 2]], axis=-1
        )
        anaglyph = np.clip(anaglyph, 0, 1)

        fig, ax = plt.subplots(figsize=(10, 8))
        ax.imshow(anaglyph)
        ax.set_title("Red-Cyan Anaglyph 3D (use glasses)")
        ax.axis("off")
        fig.tight_layout()
        if save_path:
            fig.savefig(save_path)
        if show:  # pragma: no cover
            plt.show()
        plt.close(fig)
        return save_path
