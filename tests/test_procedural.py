"""Procedural terrain renderer + supervised depth objective
(data/procedural.py, train/losses.py:compute_losses_supervised).

The zero-egress substitute for real depth ground truth: rendered scenes
carry exact depth by construction, so the supervised loss has no
degenerate optimum (unlike the photometric plane-render and the
starved sequence objective — train/pretrain.py module docstring).
"""

import numpy as np
import pytest


# ----------------------------------------------------------------- renderer

def test_render_shapes_ranges():
    from monodepth_tpu.data.procedural import render_terrain_sample

    rng = np.random.default_rng(0)
    img, depth = render_terrain_sample(rng, 96, 128)
    assert img.shape == (96, 128, 3) and img.dtype == np.float32
    assert depth.shape == (96, 128) and depth.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert depth.min() > 0.0
    # depth must vary (a constant map means the relief never projected)
    assert depth.std() / depth.mean() > 1e-3


def test_render_depth_label_consistency():
    """The haze the image renders with must be driven by the SAME depth
    map the label reports: the per-pixel correlation between distance and
    sky-blend should be strongly positive whenever extinction is active."""
    from monodepth_tpu.data.procedural import render_terrain_sample

    # seeds are cheap; find one with meaningful haze (kappa is random)
    for seed in range(12):
        rng = np.random.default_rng(seed)
        img, depth = render_terrain_sample(rng, 96, 128)
        rel = (depth - depth.min()) / (np.ptp(depth) + 1e-9)
        if rel.std() < 0.05:
            continue
        # brightness toward the sky color grows with depth under haze —
        # weak test: correlation of luminance residual with depth exists
        # in at least one draw
        lum = img.mean(axis=-1)
        r = np.corrcoef(rel.ravel(), lum.ravel())[0, 1]
        if abs(r) > 0.15:
            return
    pytest.skip("no high-relief hazy draw in 12 seeds (randomized)")


def test_heightfield_craters_dunes_deterministic():
    from monodepth_tpu.data.procedural import (
        add_craters, add_dunes, fractal_heightfield,
    )

    h1 = fractal_heightfield(np.random.default_rng(7), (64, 96))
    h2 = fractal_heightfield(np.random.default_rng(7), (64, 96))
    np.testing.assert_array_equal(h1, h2)
    assert h1.shape == (64, 96) and 0.0 <= h1.min() and h1.max() <= 1.0

    c = add_craters(np.random.default_rng(1), h1, n=3)
    assert c.shape == h1.shape and not np.array_equal(c, h1)
    d = add_dunes(np.random.default_rng(2), h1)
    assert d.shape == h1.shape


# ------------------------------------------------------------------ dataset

def test_rendered_dataset_item_contract():
    from monodepth_tpu.data.procedural import MarsRenderedDepthDataset

    ds = MarsRenderedDepthDataset(length=3, height=64, width=96, seed=5)
    assert len(ds) == 3
    it = ds[1]
    assert it["image"].shape == (64, 96, 3)
    assert it["depth"].shape == (64, 96, 1)
    assert it["metadata"]["source"] == "rendered"
    # deterministic per (seed, index) without a threaded rng
    np.testing.assert_array_equal(it["image"], ds.get(1)["image"])
    # different indices give different scenes
    assert np.abs(it["image"] - ds[2]["image"]).max() > 1e-3


def test_rendered_dataset_split_disjoint_under_loader_rng():
    """The loader threads the same per-(position, epoch) rng stream into
    every split's dataset; the dataset seed must be folded in so train and
    val scenes differ (they would otherwise be EQUAL)."""
    from monodepth_tpu.data.procedural import MarsRenderedDepthDataset

    tr = MarsRenderedDepthDataset(length=2, height=48, width=64, seed=1)
    va = MarsRenderedDepthDataset(length=2, height=48, width=64, seed=100_004)
    a = tr.get(0, rng=np.random.default_rng(42))
    b = va.get(0, rng=np.random.default_rng(42))
    assert np.abs(a["image"] - b["image"]).max() > 1e-3


def test_loader_collates_depth():
    from monodepth_tpu.data.dataset import NumpyLoader
    from monodepth_tpu.data.procedural import MarsRenderedDepthDataset

    ds = MarsRenderedDepthDataset(length=4, height=48, width=64, seed=3)
    loader = NumpyLoader(ds, batch_size=2, shuffle=False, drop_last=True)
    batch = next(iter(loader))
    assert batch["image"].shape == (2, 48, 64, 3)
    assert batch["depth"].shape == (2, 48, 64, 1)
    assert len(batch["metadata"]) == 2


def test_rendered_loaders_via_factory():
    from monodepth_tpu.data.dataset import get_mars_dataloaders

    tr, va, _ = get_mars_dataloaders(
        "", batch_size=2, height=48, width=64, rendered=True,
        render_length=4, num_workers=0)
    bt, bv = next(iter(tr)), next(iter(va))
    assert bt["depth"].shape == (2, 48, 64, 1)
    # val scenes are a different stream than train scenes
    assert np.abs(bt["image"][0] - bv["image"][0]).max() > 1e-3


# --------------------------------------------------------------------- loss

def test_supervised_loss_prefers_true_depth():
    """The scale-invariant objective must score the (scaled) true depth
    better than a constant map and better than an unrelated scene's depth
    — the property the photometric plane objective lacks."""
    import jax.numpy as jnp

    from monodepth_tpu.data.procedural import render_terrain_sample
    from monodepth_tpu.train.losses import compute_losses_supervised

    rng = np.random.default_rng(0)
    img, depth = render_terrain_sample(rng, 64, 96)
    img2, depth2 = render_terrain_sample(np.random.default_rng(9), 64, 96)
    images = jnp.asarray(img)[None]
    gt = jnp.asarray(depth)[None, ..., None]

    def loss_of(pred_depth):
        # invert disp_to_depth: disp such that the loss sees `pred_depth`
        # scaled into the sigmoid range — use the raw relationship via a
        # proxy disp in (0, 1): depth = 1 / (1/max + disp * (1/min - 1/max))
        min_d, max_d = 0.1, 100.0
        disp = ((1.0 / pred_depth - 1.0 / max_d)
                / (1.0 / min_d - 1.0 / max_d))
        disp = jnp.clip(jnp.asarray(disp)[None, ..., None], 1e-6, 1.0)
        return float(compute_losses_supervised(
            images, disp, gt, smoothness_weight=0.0)["total"])

    # the true depth, globally rescaled into the sigmoid depth range
    scale = 10.0 / depth.mean()
    true_loss = loss_of(depth * scale)
    const_loss = loss_of(np.full_like(depth, 10.0))
    wrong_loss = loss_of(depth2 * (10.0 / depth2.mean()))
    assert true_loss < const_loss, (true_loss, const_loss)
    assert true_loss < wrong_loss, (true_loss, wrong_loss)


def test_supervised_loss_scale_invariance():
    import jax.numpy as jnp

    from monodepth_tpu.train.losses import compute_losses_supervised

    rng = np.random.default_rng(4)
    disp = jnp.asarray(rng.uniform(0.05, 0.9, (1, 32, 48, 1)), jnp.float32)
    images = jnp.asarray(rng.random((1, 32, 48, 3)), jnp.float32)
    gt = jnp.asarray(rng.uniform(1.0, 5.0, (1, 32, 48, 1)), jnp.float32)
    a = compute_losses_supervised(images, disp, gt,
                                  smoothness_weight=0.0)["total"]
    b = compute_losses_supervised(images, disp, gt * 37.5,
                                  smoothness_weight=0.0)["total"]
    # si_lambda=0.85 < 1 keeps a bounded scale sensitivity; the gradient
    # term is exactly scale-invariant.  A 37.5x GT rescale must move the
    # loss far less than proportionally.
    assert abs(float(a) - float(b)) / max(float(a), 1e-9) < 1.5


# ----------------------------------------------------------------- training

def test_supervised_training_e2e(tmp_path):
    """Two tiny supervised epochs descend and report REAL depth errors
    against rendered GT in validation."""
    from monodepth_tpu.config import ModelConfig, TrainConfig
    from monodepth_tpu.train.adapter import MarsDomainAdapter

    cfg = TrainConfig(
        model=ModelConfig(pretrained=False, dtype="float32"),
        data_dir="", batch_size=2, num_epochs=2, learning_rate=3e-4,
        height=64, width=96, loss_mode="supervised", render_length=4,
        checkpoint_dir="", num_workers=0, encoder_lr_factor=1.0,
    )
    adapter = MarsDomainAdapter(cfg)
    result = adapter.finetune(2)
    hist = result["history"]
    assert len(hist) == 2
    assert np.isfinite(hist[-1]["train"]["total"])
    # real GT metrics present and sane (a1 is a fraction)
    a1 = hist[-1]["metrics"]["a1"]
    assert 0.0 <= a1 <= 1.0
