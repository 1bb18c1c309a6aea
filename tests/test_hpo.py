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
