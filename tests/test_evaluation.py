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


# ------------------------------------------------------- crater detection
def _crater_field(centers_radii, h=128, w=128, depth0=5.0, bowl=0.8):
    """Flat plane + Gaussian bowls (locally DEEPER = larger depth)."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    d = np.full((h, w), depth0)
    for cy, cx, r in centers_radii:
        d += bowl * np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * (r / 1.5) ** 2))
    return d


def test_detect_craters_finds_known_bowls():
    from monodepth_tpu.utils.evaluation import detect_craters

    truth = [(32, 32, 8), (90, 40, 12), (60, 100, 6)]
    craters = detect_craters(_crater_field(truth))
    assert len(craters) == len(truth)
    for cy, cx, r in truth:
        d = np.sqrt((craters[:, 0] - cy) ** 2 + (craters[:, 1] - cx) ** 2)
        j = int(np.argmin(d))
        assert d[j] <= 3.0, (cy, cx, craters)
        # scale-space radius within 2x of the generating bowl radius
        assert r / 2 <= craters[j, 2] <= r * 2


def test_detect_craters_flat_and_invalid():
    from monodepth_tpu.utils.evaluation import detect_craters

    assert len(detect_craters(np.full((64, 64), 3.0))) == 0
    assert len(detect_craters(np.full((64, 64), np.nan))) == 0


def test_cda_stub_is_reference_default(ev, terrain):
    # parity: the reference's CDA always returns 0.0 (evaluation.py:96-100)
    assert ev.crater_detection_accuracy(terrain, terrain) == 0.0
    assert ev.evaluate_depth_prediction(terrain, terrain)["cda"] == 0.0


def test_real_cda_scores():
    ev = MarsTerrainEvaluator(real_cda=True)
    truth = [(32, 32, 8), (90, 40, 12), (60, 100, 6)]
    gt = _crater_field(truth)
    # identical maps: perfect detection F1
    assert ev.crater_detection_accuracy(gt, gt) == pytest.approx(1.0)
    # featureless prediction: finds none of the GT craters
    assert ev.crater_detection_accuracy(np.full_like(gt, 5.0), gt) == 0.0
    # missing one crater: F1 = 2*2 / (2*2 + 0 + 1) = 0.8
    pred = _crater_field(truth[:2])
    assert ev.crater_detection_accuracy(pred, gt) == pytest.approx(0.8)
    # both featureless: nothing to find, nothing hallucinated
    flat = np.full((64, 64), 2.0)
    assert ev.crater_detection_accuracy(flat, flat) == 1.0


def test_real_cda_in_full_metrics(terrain):
    ev = MarsTerrainEvaluator(real_cda=True)
    m = ev.evaluate_depth_prediction(terrain, terrain)
    assert np.isfinite(m["cda"]) and 0.0 <= m["cda"] <= 1.0


# ------------------------------------------------- median-scaling protocol
def test_median_scaling_recovers_scale(ev, terrain):
    """Eigen protocol: a prediction off by a global factor scores perfectly
    once median-scaled, and the applied ratio is reported."""
    m = ev.evaluate_depth_prediction(terrain * 0.25, terrain,
                                     median_scaling=True)
    assert m["abs_rel"] == pytest.approx(0.0, abs=1e-12)
    assert m["a1"] == 1.0
    assert m["scale_ratio"] == pytest.approx(4.0, rel=1e-6)
    # without the protocol the same prediction is heavily penalized
    raw = ev.evaluate_depth_prediction(terrain * 0.25, terrain)
    assert raw["abs_rel"] == pytest.approx(0.75, rel=1e-3)
    assert "scale_ratio" not in raw


def test_median_scaling_clips_to_depth_range(terrain):
    """Scaled predictions are clipped to [min_depth, max_depth] (the
    standard protocol's clip step)."""
    ev = MarsTerrainEvaluator(min_depth=0.1, max_depth=10.0)
    pred = terrain * 0.01
    pred[0, 0] = 1e4  # scales to >> max_depth -> clipped to 10.0
    m = ev.evaluate_depth_prediction(pred, terrain, median_scaling=True)
    assert np.isfinite(m["abs_rel"])
    assert m["abs_rel"] < 0.5


def test_evaluate_batch_median_scaling_ratio_std(ev, terrain, tmp_path):
    report = ev.evaluate_batch(
        [(terrain * 0.5, terrain), (terrain * 2.0, terrain)],
        output_dir=str(tmp_path), median_scaling=True)
    assert report["mean"]["abs_rel"] == pytest.approx(0.0, abs=1e-12)
    ratios = [s["scale_ratio"] for s in report["per_sample"]]
    assert ratios == pytest.approx([2.0, 0.5], rel=1e-6)
    assert report["mean"]["scale_ratio_std"] == pytest.approx(
        np.std(ratios), rel=1e-6)


def test_evaluate_cli_median_scaling(terrain, tmp_path):
    from monodepth_tpu.cli.evaluate import main

    pred_dir = tmp_path / "pred"
    gt_dir = tmp_path / "gt"
    pred_dir.mkdir()
    gt_dir.mkdir()
    np.save(pred_dir / "a_depth.npy", terrain * 0.5)
    np.save(gt_dir / "a_depth.npy", terrain)
    out = tmp_path / "out"
    assert main(["--pred_dir", str(pred_dir), "--gt_dir", str(gt_dir),
                 "--output_dir", str(out), "--median_scaling"]) == 0
    import json

    with open(out / "metrics.json") as f:
        report = json.load(f)
    assert report["mean"]["abs_rel"] == pytest.approx(0.0, abs=1e-12)
    assert report["mean"]["scale_ratio"] == pytest.approx(2.0, rel=1e-6)
