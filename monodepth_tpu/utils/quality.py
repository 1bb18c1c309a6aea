"""Non-circular model-quality scoring on held-out real assets.

The reference repo has no quality harness at all (its validation compares
against simulated ground truth, mars_adapter.py:190); in this environment no
pretrained weights or real depth GT exist either (zero egress).  What CAN be
measured without ground truth, and without scoring the training objective
back to itself:

- **left-right flip inconsistency**: mean |disp(x) - mirror(disp(flip x))|
  normalized by mean disp.  A model that computes any geometry-like function
  responds to a mirrored scene with a mirrored disparity; random weights have
  no reason to.  Not optimized by the photometric or sequence objectives
  (only `loss_mode='flip'` trains it directly — don't use that mode when this
  is the evidence).
- **the reference's own no-reference proxy score** (edge + detail - 2*noise,
  reference hyperparameter_optimization.py:220-232) on real Mars frames the
  model never trained on.

Used by scripts/dev_train_quality.py (before/after within one training run)
and scripts/eval_checkpoint_quality.py (score an existing checkpoint vs
random init).
"""

from __future__ import annotations

import glob
from typing import Dict, List, Optional, Sequence

import numpy as np

__all__ = [
    "load_heldout_assets",
    "score_depth_model",
]


def load_heldout_assets(
    height: int,
    width: int,
    per_source: int = 2,
    assets_root: str = "/root/reference/assets",
    sources: Sequence[str] = ("rover", "satellite", "ingenuity"),
    from_end: bool = True,
) -> np.ndarray:
    """[N, H, W, 3] float32 in [0, 1]: the LAST `per_source` frames of each
    source folder (the tail is the contiguous val region under
    `organize_sequence_dataset`'s split, so these stay held out)."""
    from PIL import Image

    paths: List[str] = []
    for source in sources:
        found = sorted(glob.glob(f"{assets_root}/{source}/*.png"))
        paths.extend(found[-per_source:] if from_end else found[:per_source])
    assert paths, f"no assets under {assets_root}"
    out = []
    for p in paths:
        img = Image.open(p).convert("RGB").resize((width, height),
                                                  Image.LANCZOS)
        out.append(np.asarray(img, dtype=np.float32) / 255.0)
    return np.stack(out)


def score_depth_model(
    model,
    variables: Dict,
    eval_images: np.ndarray,
    min_depth: float = 0.1,
    max_depth: float = 100.0,
    fwd=None,
) -> Dict[str, float]:
    """Flip-inconsistency + proxy score for (model, variables) on
    `eval_images` ([N, H, W, 3] float32 in [0, 1]).

    `fwd` overrides the jitted forward (variables, x) -> disp [N, H, W, 1];
    by default the standard apply at scale 1.0 is jitted per call site.
    Training-only parameter subtrees (params['pose']) are dropped.
    """
    import jax
    import jax.numpy as jnp

    from monodepth_tpu.layers import disp_to_depth
    from monodepth_tpu.utils.evaluation import MarsTerrainEvaluator

    if fwd is None:
        @jax.jit
        def fwd(variables, x):
            return model.apply(variables, x, 1.0)[("disp", 0)]

    params = {k: v for k, v in variables.get("params", {}).items()
              if k != "pose"}
    variables = dict(variables)
    variables["params"] = params

    batch = jnp.asarray(eval_images)
    disp = np.asarray(fwd(variables, batch), dtype=np.float32)
    disp_f = np.asarray(fwd(variables, batch[:, :, ::-1, :]), dtype=np.float32)
    mirrored = disp_f[:, :, ::-1, :]
    # Three flip-consistency views, because the mean-normalized one is
    # scale-confounded: a model whose disparities average 0.007 (a trained
    # scale-invariant checkpoint) can have 5x SMALLER raw flip error than
    # random init yet a 10x larger normalized number.  Pearson r between
    # the disparity and its mirrored-flip twin is the scale-free signal.
    flip_inc = float(np.mean(np.abs(disp - mirrored))
                     / max(float(np.mean(disp)), 1e-9))
    flip_raw = float(np.mean(np.abs(disp - mirrored)))
    rs = []
    for i in range(len(eval_images)):
        a, b = disp[i].ravel(), mirrored[i].ravel()
        sa, sb = a.std(), b.std()
        if sa > 0 and sb > 0:
            rs.append(float(np.corrcoef(a, b)[0, 1]))
        else:
            # Zero-variance disparity: correlation is undefined.  A constant
            # map that EQUALS its mirrored twin is perfectly flip-consistent
            # (flip_raw_l1 = 0) — score 1.0 so the two metrics agree on the
            # degenerate case; constant-but-different scores 0.0.
            rs.append(1.0 if np.array_equal(a, b) else 0.0)
    flip_pearson = float(np.mean(rs))

    _, depth = disp_to_depth(jnp.asarray(disp), min_depth, max_depth)
    depth = np.asarray(depth)
    evaluator = MarsTerrainEvaluator()
    proxies, comps = [], {"edge_score": [], "detail_score": [],
                          "noise_score": [], "histogram_concentration": [],
                          "entropy": [], "edge_preservation": []}
    for i in range(len(eval_images)):
        m = evaluator.compute_proxy_metrics(depth[i, ..., 0], eval_images[i])
        proxies.append(m["edge_score"] + m["detail_score"]
                       - 2.0 * m["noise_score"])
        for k in comps:
            comps[k].append(m.get(k, 0.0))
    out = {"flip_inconsistency": flip_inc,
           "flip_raw_l1": flip_raw,
           "flip_pearson": flip_pearson,
           "proxy_score": float(np.mean(proxies))}
    # Decomposed proxy components: the aggregate (reference
    # hyperparameter_optimization.py:220-232) rewards high-frequency
    # content wherever it comes from, so it can rank a noisy random-init
    # field above a smooth trained one — the components make that
    # legible (docs/PERF_STUDY.md, proxy-inversion analysis).
    out.update({f"proxy_{k}": float(np.mean(v)) for k, v in comps.items()})
    return out
