"""Visualization smoke tests: every artifact type is produced and non-empty."""

import os

import numpy as np
import pytest

from monodepth_tpu.utils.advanced_visualization import AdvancedMarsVisualizer
from monodepth_tpu.utils.visualization import MarsTerrainVisualizer


@pytest.fixture
def depth(rng):
    ys, xs = np.mgrid[0:48, 0:64]
    return (3 + 0.05 * xs + rng.random((48, 64))).astype(np.float32)


@pytest.fixture
def image(rng):
    return (rng.random((48, 64, 3)) * 255).astype(np.uint8)


@pytest.fixture
def viz():
    return MarsTerrainVisualizer()


@pytest.fixture
def adv():
    return AdvancedMarsVisualizer()


def _exists_nonempty(path):
    return os.path.exists(path) and os.path.getsize(path) > 0


def test_colorize_depth(viz, depth):
    rgb = viz.colorize_depth(depth)
    assert rgb.shape == (48, 64, 3) and rgb.dtype == np.uint8
    # robust to NaN
    d = depth.copy()
    d[0, 0] = np.nan
    assert viz.colorize_depth(d).shape == (48, 64, 3)


def test_visualize_depth_map(viz, depth, image, tmp_path):
    p = viz.visualize_depth_map(image, depth, save_path=str(tmp_path / "d.png"))
    assert _exists_nonempty(p)


def test_visualize_3d_terrain(viz, depth, image, tmp_path):
    p = viz.visualize_3d_terrain(depth, image, save_path=str(tmp_path / "t.png"))
    assert _exists_nonempty(p)
    p2 = viz.visualize_3d_terrain(depth, save_path=str(tmp_path / "t2.png"))
    assert _exists_nonempty(p2)


def test_visualize_point_cloud(viz, rng, tmp_path):
    pts = rng.random((500, 3))
    colors = (rng.random((500, 3)) * 255).astype(np.uint8)
    p = viz.visualize_point_cloud(pts, colors, save_path=str(tmp_path / "pc.png"))
    assert _exists_nonempty(p)


def test_depth_video(viz, depth, image, tmp_path):
    p = viz.create_depth_video([image] * 3, [depth] * 3, str(tmp_path / "v.mp4"), fps=5)
    assert _exists_nonempty(p)


def test_flythrough_video_and_trajectory(viz, depth, tmp_path):
    poses = viz.generate_flythrough_trajectory(depth, num_frames=8)
    assert len(poses) == 8 and poses[0].shape == (4, 4)
    p = viz.create_flythrough_video(depth, save_path=str(tmp_path / "f.mp4"),
                                    num_frames=4, fps=4)
    assert _exists_nonempty(p)


def test_comparison_grid(viz, depth, image, tmp_path):
    p = viz.create_depth_comparison_grid(
        [image, image], [[depth, depth], [depth * 2, depth * 2]],
        ["standard", "enhanced"], save_path=str(tmp_path / "g.png"),
    )
    assert _exists_nonempty(p)


def test_multiview(adv, depth, image, tmp_path, rng):
    unc = rng.random(depth.shape).astype(np.float32)
    p = adv.create_multi_view_visualization(
        image, depth, unc, save_path=str(tmp_path / "mv.png"))
    assert _exists_nonempty(p)
    p2 = adv.create_multi_view_visualization(
        image, depth, None, save_path=str(tmp_path / "mv2.png"))
    assert _exists_nonempty(p2)


def test_interactive_html(adv, depth, image, tmp_path, rng):
    unc = rng.random(depth.shape).astype(np.float32)
    p = adv.create_interactive_visualization(
        image, depth, unc, save_path=str(tmp_path / "inter"))
    assert p.endswith(".html") and _exists_nonempty(p)
    html = open(p).read()
    assert "Plotly.newPlot" in html and "surface" in html


def test_flyover_html(adv, depth, image, tmp_path):
    p = adv.create_terrain_flyover_animation(
        depth, image, save_path=str(tmp_path / "fly"))
    assert p.endswith("_flyover.html") and _exists_nonempty(p)
    assert "addFrames" in open(p).read()


def test_uncertainty_overlay(adv, depth, image, tmp_path, rng):
    unc = rng.random(depth.shape).astype(np.float32)
    p = adv.create_depth_uncertainty_visualization(
        image, depth, unc, save_path=str(tmp_path / "u.png"))
    assert _exists_nonempty(p)


def test_terrain_features(adv, depth, image, tmp_path):
    slope, roughness, curvature = adv.compute_terrain_features(depth)
    assert slope.shape == depth.shape
    assert (roughness >= 0).all()
    p = adv.visualize_terrain_features(depth, image,
                                       save_path=str(tmp_path / "tf.png"))
    assert _exists_nonempty(p)


def test_anaglyph_vectorized(adv, depth, image, tmp_path):
    p = adv.create_anaglyph_3d(image, depth, save_path=str(tmp_path / "a.png"))
    assert _exists_nonempty(p)


def test_normals(adv, depth):
    n = adv.compute_normals(depth)
    assert n.shape == (*depth.shape, 3)
    assert (n >= 0).all() and (n <= 1).all()
