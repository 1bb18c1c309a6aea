"""Hyperparameter optimization (capability of reference
scripts/hyperparameter_optimization.py).

Search space (reference :133-146): min/max depth, per-source disparity scale
factors, terrain voxel_size, poisson/mesh depth.  Objective (reference
:220-232): no-reference proxy score `edge + detail - 2 * noise` averaged over
per-source sample images.

Optuna is unavailable in this environment, so the built-in engines are:
- 'random': uniform random search
- 'grid':   full grid over discretized space (reference :235-375)
- 'tpe':    a simple quantile-based sampler (fit-on-best-half, sample near
  good regions) standing in for Optuna's Bayesian search (reference :378-411)
If `optuna` is importable it is used for engine='tpe' instead.

Results: best params + per-trial history JSON, and a score-vs-trial plot
(reference :399-409, 603-641).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

try:  # pragma: no cover - optional dependency
    import optuna

    OPTUNA_AVAILABLE = True
except ImportError:  # pragma: no cover
    optuna = None
    OPTUNA_AVAILABLE = False

__all__ = ["SearchSpace", "HyperparameterOptimizer", "proxy_objective",
           "precompute_disparities", "OPTUNA_AVAILABLE"]


@dataclasses.dataclass
class SearchSpace:
    """Continuous [lo, hi] and integer ranges (reference :133-146)."""

    min_depth: Tuple[float, float] = (0.01, 1.0)
    max_depth: Tuple[float, float] = (10.0, 500.0)
    rover_scale: Tuple[float, float] = (0.5, 4.0)
    ingenuity_scale: Tuple[float, float] = (0.1, 2.0)
    satellite_scale: Tuple[float, float] = (0.001, 0.1)
    voxel_size: Tuple[float, float] = (0.01, 0.2)
    poisson_depth: Tuple[int, int] = (6, 10)

    def continuous(self) -> Dict[str, Tuple[float, float]]:
        return {
            k: getattr(self, k)
            for k in ("min_depth", "max_depth", "rover_scale",
                      "ingenuity_scale", "satellite_scale", "voxel_size")
        }

    def sample(self, rng: np.random.Generator) -> Dict:
        params = {
            k: float(rng.uniform(lo, hi)) for k, (lo, hi) in self.continuous().items()
        }
        lo, hi = self.poisson_depth
        params["poisson_depth"] = int(rng.integers(lo, hi + 1))
        return params

    def grid(self, points_per_dim: int = 3) -> List[Dict]:
        axes = {
            k: np.linspace(lo, hi, points_per_dim)
            for k, (lo, hi) in self.continuous().items()
        }
        axes["poisson_depth"] = np.arange(self.poisson_depth[0],
                                          self.poisson_depth[1] + 1)
        keys = list(axes)
        out: List[Dict] = []

        def rec(i, current):
            if i == len(keys):
                out.append(dict(current))
                return
            for v in axes[keys[i]]:
                current[keys[i]] = int(v) if keys[i] == "poisson_depth" else float(v)
                rec(i + 1, current)

        rec(0, {})
        return out


def precompute_disparities(
    estimator, images_by_source: Dict[str, Sequence[np.ndarray]]
) -> Dict[str, List[Tuple[np.ndarray, np.ndarray]]]:
    """Run inference ONCE per image, returning {source: [(image, raw_disp)]}.

    Trial parameters only rescale disparities post-hoc (min/max depth and
    per-source scale factors never enter the network), so the network forward
    is trial-invariant.  The reference re-runs full inference on every trial
    (hyperparameter_optimization.py:89-112); passing this cache to
    `proxy_objective` amortizes inference across the whole search.
    """
    return {
        source: [(img, estimator.predict(img, None)["disp"]) for img in images]
        for source, images in images_by_source.items()
    }


def proxy_objective(estimator, images_by_source: Dict[str, Sequence[np.ndarray]],
                    params: Dict, disp_cache: Optional[Dict] = None) -> float:
    """edge + detail - 2*noise averaged per source (reference :220-232).

    disp_cache: output of `precompute_disparities`; when given, no inference
    runs here — trials cost only the post-hoc rescale + proxy metrics.
    """
    from monodepth_tpu.layers import disp_to_depth
    from monodepth_tpu.utils.evaluation import MarsTerrainEvaluator

    evaluator = MarsTerrainEvaluator(params["min_depth"], params["max_depth"])
    scale_by_source = {
        "rover": params["rover_scale"],
        "ingenuity": params["ingenuity_scale"],
        "satellite": params["satellite_scale"],
    }
    if disp_cache is None:
        disp_cache = precompute_disparities(estimator, images_by_source)
    per_source_scores = []
    for source, pairs in disp_cache.items():
        scores = []
        for img, raw_disp in pairs:
            disp = raw_disp * scale_by_source.get(source, 1.0)
            _, depth = disp_to_depth(disp, params["min_depth"], params["max_depth"])
            m = evaluator.compute_proxy_metrics(np.asarray(depth), img)
            scores.append(m["edge_score"] + m["detail_score"] - 2.0 * m["noise_score"])
        if scores:
            per_source_scores.append(float(np.mean(scores)))
    return float(np.mean(per_source_scores)) if per_source_scores else float("-inf")


class HyperparameterOptimizer:
    """Search driver over a black-box objective(params) -> score (higher=better)."""

    def __init__(self, objective: Callable[[Dict], float],
                 space: Optional[SearchSpace] = None, seed: int = 0):
        self.objective = objective
        self.space = space or SearchSpace()
        self.rng = np.random.default_rng(seed)
        self.history: List[Dict] = []

    # ------------------------------------------------------------ engines
    def _eval(self, params: Dict) -> float:
        score = float(self.objective(params))
        self.history.append({"params": params, "score": score})
        return score

    def optimize(self, n_trials: int = 20, engine: str = "tpe",
                 grid_points: int = 3) -> Dict:
        if engine == "grid":
            for params in self.space.grid(grid_points)[:n_trials]:
                self._eval(params)
        elif engine == "random":
            for _ in range(n_trials):
                self._eval(self.space.sample(self.rng))
        elif engine == "tpe":
            if OPTUNA_AVAILABLE:  # pragma: no cover
                self._optuna(n_trials)
            else:
                self._quantile_tpe(n_trials)
        else:
            raise ValueError(f"unknown engine {engine}")
        return self.best()

    def _quantile_tpe(self, n_trials: int, n_startup: int = 8):
        """Fit-on-best-half sampler: after warmup, draw candidates near the
        empirical distribution of the top-50% trials (a lightweight stand-in
        for Optuna's TPE)."""
        cont = self.space.continuous()
        for t in range(n_trials):
            if t < n_startup or len(self.history) < 4:
                params = self.space.sample(self.rng)
            else:
                ranked = sorted(self.history, key=lambda h: -h["score"])
                good = ranked[: max(2, len(ranked) // 2)]
                params = {}
                for k, (lo, hi) in cont.items():
                    vals = np.array([g["params"][k] for g in good])
                    mu, sigma = vals.mean(), max(vals.std(), (hi - lo) * 0.05)
                    params[k] = float(np.clip(self.rng.normal(mu, sigma), lo, hi))
                pd_vals = [g["params"]["poisson_depth"] for g in good]
                params["poisson_depth"] = int(self.rng.choice(pd_vals))
            self._eval(params)

    def _optuna(self, n_trials: int):  # pragma: no cover - optuna absent here
        cont = self.space.continuous()

        def obj(trial):
            params = {
                k: trial.suggest_float(k, lo, hi) for k, (lo, hi) in cont.items()
            }
            params["poisson_depth"] = trial.suggest_int(
                "poisson_depth", *self.space.poisson_depth
            )
            return self.objective(params)

        study = optuna.create_study(direction="maximize")
        study.optimize(obj, n_trials=n_trials)
        for t in study.trials:
            self.history.append({"params": t.params, "score": t.value})

    # ------------------------------------------------------------ results
    def best(self) -> Dict:
        assert self.history, "no trials run"
        return max(self.history, key=lambda h: h["score"])

    def save_results(self, output_dir: str):
        os.makedirs(output_dir, exist_ok=True)
        best = self.best()
        with open(os.path.join(output_dir, "best_params.json"), "w") as f:
            json.dump(best, f, indent=2)
        with open(os.path.join(output_dir, "trials.json"), "w") as f:
            json.dump(self.history, f, indent=2)
        self._plot(output_dir)
        return best

    def _plot(self, output_dir: str):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        scores = [h["score"] for h in self.history]
        fig, ax = plt.subplots(figsize=(7, 4))
        ax.plot(scores, marker="o", lw=1)
        ax.plot(np.maximum.accumulate(scores), lw=2, label="best so far")
        ax.set_xlabel("trial")
        ax.set_ylabel("proxy score")
        ax.legend()
        fig.tight_layout()
        fig.savefig(os.path.join(output_dir, "optimization_history.png"))
        plt.close(fig)
