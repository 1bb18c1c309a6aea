"""Non-circular quality scoring (utils/quality.py) + the checkpoint scorer
CLI (scripts/eval_checkpoint_quality.py)."""

import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

from monodepth_tpu.utils.quality import load_heldout_assets, score_depth_model

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "scripts")


@pytest.fixture(scope="module")
def assets_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("assets")
    rng = np.random.default_rng(0)
    for source in ("rover", "satellite", "ingenuity"):
        d = root / source
        d.mkdir()
        for i in range(3):
            arr = (rng.random((40, 50, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"frame_{i}.png")
    return str(root)


def test_load_heldout_assets_shapes_and_tail(assets_root):
    imgs = load_heldout_assets(32, 48, per_source=2, assets_root=assets_root)
    assert imgs.shape == (6, 32, 48, 3)
    assert imgs.dtype == np.float32
    assert 0.0 <= imgs.min() and imgs.max() <= 1.0
    # from_end=True must pick the tail of the sorted listing (the val region)
    head = load_heldout_assets(32, 48, per_source=1, assets_root=assets_root,
                               sources=("rover",), from_end=False)
    tail = load_heldout_assets(32, 48, per_source=1, assets_root=assets_root,
                               sources=("rover",), from_end=True)
    assert not np.allclose(head, tail)


def test_score_depth_model_keys_and_pose_dropped(assets_root):
    import jax
    import jax.numpy as jnp

    from monodepth_tpu.models import DepthAnything

    model = DepthAnything(output_scales=(0,))
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    variables = dict(model.init(jax.random.PRNGKey(0), x))
    # a training-only subtree must not break inference scoring
    variables["params"] = dict(variables["params"], pose={"w": jnp.zeros((3,))})
    imgs = load_heldout_assets(32, 48, per_source=1, assets_root=assets_root)
    scores = score_depth_model(model, variables, imgs)
    assert set(scores) == {
        "flip_inconsistency", "flip_raw_l1", "flip_pearson", "proxy_score",
        # decomposed proxy components (proxy-inversion analysis,
        # docs/PERF_STUDY.md): the aggregate alone can rank a noisy
        # random field above a smooth trained one
        "proxy_edge_score", "proxy_detail_score", "proxy_noise_score",
        "proxy_histogram_concentration", "proxy_entropy",
        "proxy_edge_preservation",
    }
    assert np.isfinite(scores["flip_inconsistency"])
    assert scores["flip_inconsistency"] >= 0.0
    assert scores["flip_raw_l1"] >= 0.0
    assert -1.0 <= scores["flip_pearson"] <= 1.0
    assert np.isfinite(scores["proxy_score"])


def test_flip_inconsistency_zero_for_equivariant_model(assets_root):
    """A model that is exactly flip-equivariant (e.g. a fixed horizontal
    mean) scores 0 — the metric's fixed point is geometry-consistency."""
    import jax.numpy as jnp

    class RowMean:
        def apply(self, variables, x, scale):
            d = jnp.mean(x, axis=(2, 3), keepdims=True)
            return {("disp", 0): jnp.broadcast_to(
                d, x.shape[:3] + (1,)).astype(jnp.float32)}

    imgs = load_heldout_assets(32, 48, per_source=1, assets_root=assets_root)
    scores = score_depth_model(RowMean(), {"params": {}}, imgs)
    assert scores["flip_inconsistency"] < 1e-5
    assert scores["flip_raw_l1"] < 1e-6
    assert scores["flip_pearson"] > 0.999


def test_eval_checkpoint_quality_cli(assets_root, tmp_path):
    """End-to-end: save a checkpoint, score it vs random init via the CLI."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, SCRIPTS)
    from eval_checkpoint_quality import main

    from monodepth_tpu.models import DepthAnything
    from monodepth_tpu.train.checkpoints import save_checkpoint

    model = DepthAnything()
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(7), x)
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, 1, {"params": dict(variables["params"]),
                                  "batch_stats": dict(variables["batch_stats"]),
                                  "step": 1})

    out = tmp_path / "summary.json"
    import contextlib
    with open(out, "w") as f, contextlib.redirect_stdout(f):
        rc = main(["--ckpt", ckpt_dir, "--height", "32", "--width", "48",
                   "--per_source", "1", "--dtype", "float32",
                   "--assets", assets_root])
    assert rc == 0
    summary = json.loads(out.read_text())
    assert summary["trained"]["flip_inconsistency"] > 0
    assert "random_init" in summary
    assert np.isfinite(summary["flip_inconsistency_delta"])
