"""Evaluator tests: golden behaviors for standard, Mars-specific, and proxy metrics."""

import numpy as np
import pytest

from monodepth_tpu.utils.evaluation import MarsTerrainEvaluator


@pytest.fixture
def ev():
    return MarsTerrainEvaluator()


@pytest.fixture
def terrain(rng):
    ys, xs = np.mgrid[0:64, 0:64]
    depth = 5 + 0.02 * xs + 0.5 * np.sin(ys / 5.0) + rng.random((64, 64)) * 0.1
    return depth.astype(np.float32)


def test_perfect_prediction(ev, terrain):
    m = ev.evaluate_depth_prediction(terrain, terrain)
    assert m["abs_rel"] == 0.0
    assert m["rmse"] == 0.0
    assert m["a1"] == 1.0
    assert m["trp"] == pytest.approx(1.0)
    assert m["sfdr"] == pytest.approx(1.0)
    assert m["cda"] == 0.0


def test_scaled_prediction_metrics(ev, terrain):
    m = ev.evaluate_depth_prediction(terrain * 1.1, terrain)
    assert m["abs_rel"] == pytest.approx(0.1, rel=1e-3)
    assert m["a1"] == 1.0  # 1.1 < 1.25


def test_mask_and_invalid_handling(ev, terrain):
    pred = terrain.copy()
    gt = terrain.copy()
    gt[:8] = np.nan       # invalid rows ignored
    pred[:8] = 1e9
    m = ev.evaluate_depth_prediction(pred, gt)
    assert m["abs_rel"] == 0.0


def test_3d_reconstruction_metrics(ev, rng):
    pts = rng.random((300, 3))
    m = ev.evaluate_3d_reconstruction(pts, pts)
    assert m["chamfer"] == 0.0
    assert m["hausdorff"] == 0.0
    assert m["volumetric_similarity"] == 1.0

    shifted = pts + np.array([0.5, 0.0, 0.0])
    m2 = ev.evaluate_3d_reconstruction(shifted, pts)
    assert m2["chamfer"] > 0.1
    assert m2["volumetric_similarity"] < 1.0


def test_normal_consistency(ev, rng):
    pts = rng.random((100, 3))
    n = np.tile([[0.0, 0.0, 1.0]], (100, 1))
    m = ev.evaluate_3d_reconstruction(pts, pts, pred_normals=n, gt_normals=n)
    assert m["normal_consistency"] == pytest.approx(1.0)
    m2 = ev.evaluate_3d_reconstruction(
        pts, pts, pred_normals=n, gt_normals=np.roll(n, 1, axis=1)
    )
    assert m2["normal_consistency"] == pytest.approx(0.0, abs=1e-6)


def test_evaluate_batch_writes_json(ev, terrain, tmp_path):
    report = ev.evaluate_batch(
        [(terrain, terrain), (terrain * 1.05, terrain)], output_dir=str(tmp_path)
    )
    assert report["num_samples"] == 2
    assert (tmp_path / "metrics.json").exists()
    assert report["mean"]["abs_rel"] == pytest.approx(0.025, rel=1e-2)


def test_proxy_metrics(ev, terrain, rng):
    img = rng.random((64, 64, 3)).astype(np.float32)
    m = ev.compute_proxy_metrics(terrain, img)
    for k in ("edge_score", "detail_score", "noise_score",
              "histogram_concentration", "entropy", "quality_score",
              "edge_preservation"):
        assert np.isfinite(m[k]), k
    # noisy map scores higher noise than smooth
    noisy = terrain + rng.standard_normal(terrain.shape).astype(np.float32)
    assert ev.compute_proxy_metrics(noisy)["noise_score"] > m["noise_score"]


def test_entropy_golden(ev):
    assert ev._calculate_entropy(np.full((10, 10), 3.0)) == 0.0
    two_level = np.concatenate([np.zeros(50), np.ones(50)]).reshape(10, 10)
    assert ev._calculate_entropy(two_level) == pytest.approx(1.0)


def test_edge_preservation_identical_edges(ev, terrain):
    # Using the depth itself as the "image" makes edges coincide.
    score = ev._calculate_edge_preservation(terrain, terrain)
    assert score == pytest.approx(1.0)
