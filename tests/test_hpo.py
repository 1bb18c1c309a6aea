"""HPO engine tests with a synthetic objective (no model in the loop)."""

import numpy as np
import pytest

from monodepth_tpu.hpo import HyperparameterOptimizer, SearchSpace


def quadratic_objective(params):
    # peak at min_depth=0.5, rover_scale=2.0
    return -((params["min_depth"] - 0.5) ** 2) - ((params["rover_scale"] - 2.0) ** 2)


def test_random_search_finds_reasonable_optimum():
    opt = HyperparameterOptimizer(quadratic_objective, SearchSpace(), seed=0)
    best = opt.optimize(40, engine="random")
    assert abs(best["params"]["min_depth"] - 0.5) < 0.3
    assert len(opt.history) == 40


def test_tpe_beats_or_matches_random():
    r = HyperparameterOptimizer(quadratic_objective, SearchSpace(), seed=1)
    best_r = r.optimize(30, engine="random")["score"]
    t = HyperparameterOptimizer(quadratic_objective, SearchSpace(), seed=1)
    best_t = t.optimize(30, engine="tpe")["score"]
    assert best_t >= best_r - 0.05


def test_grid_search_enumerates():
    opt = HyperparameterOptimizer(quadratic_objective, SearchSpace(), seed=0)
    opt.optimize(10, engine="grid", grid_points=2)
    assert len(opt.history) == 10
    # grid values hit the bounds
    assert opt.history[0]["params"]["min_depth"] in (0.01, 1.0)


def test_poisson_depth_is_integer_in_range():
    opt = HyperparameterOptimizer(quadratic_objective, SearchSpace(), seed=2)
    opt.optimize(15, engine="tpe")
    for h in opt.history:
        pd = h["params"]["poisson_depth"]
        assert isinstance(pd, int) and 6 <= pd <= 10


def test_save_results(tmp_path):
    opt = HyperparameterOptimizer(quadratic_objective, SearchSpace(), seed=0)
    opt.optimize(5, engine="random")
    best = opt.save_results(str(tmp_path))
    assert (tmp_path / "best_params.json").exists()
    assert (tmp_path / "trials.json").exists()
    assert (tmp_path / "optimization_history.png").exists()
    assert best["score"] == max(h["score"] for h in opt.history)


def test_unknown_engine_raises():
    opt = HyperparameterOptimizer(quadratic_objective)
    with pytest.raises(ValueError):
        opt.optimize(1, engine="bogus")


class _CountingStubEstimator:
    """predict() returns a deterministic disparity and counts calls."""

    def __init__(self):
        self.calls = 0

    def predict(self, img, metadata=None):
        self.calls += 1
        h, w = img.shape[:2]
        yy = np.linspace(0.1, 0.9, h)[:, None]
        return {"disp": np.broadcast_to(yy, (h, w)).astype(np.float32).copy()}


def _sample_images():
    rng = np.random.default_rng(3)
    return {
        "rover": [rng.random((32, 40, 3), dtype=np.float32) for _ in range(2)],
        "satellite": [rng.random((32, 40, 3), dtype=np.float32)],
    }


def test_proxy_objective_disp_cache_matches_uncached():
    from monodepth_tpu.hpo import precompute_disparities, proxy_objective

    images = _sample_images()
    params = {"min_depth": 0.1, "max_depth": 100.0, "rover_scale": 2.0,
              "ingenuity_scale": 0.5, "satellite_scale": 0.01,
              "voxel_size": 0.05, "poisson_depth": 9}

    est = _CountingStubEstimator()
    uncached = proxy_objective(est, images, params)
    calls_uncached = est.calls

    est2 = _CountingStubEstimator()
    cache = precompute_disparities(est2, images)
    calls_after_cache = est2.calls
    s1 = proxy_objective(est2, images, params, disp_cache=cache)
    s2 = proxy_objective(est2, images, dict(params, rover_scale=3.0),
                         disp_cache=cache)
    assert est2.calls == calls_after_cache  # trials run NO inference
    assert calls_after_cache == calls_uncached == 3  # once per image
    assert s1 == pytest.approx(uncached, rel=1e-6)
    assert s2 != pytest.approx(s1)  # params still matter through the rescale
