"""Training stack tests: losses, optimizer schedule, train step, adapter loop,
checkpoint/resume — on tiny shapes, CPU."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from monodepth_tpu.config import ModelConfig, TrainConfig
from monodepth_tpu.train.losses import compute_losses
from monodepth_tpu.train.adapter import MarsDomainAdapter, make_lr_schedule


def _tiny_cfg(tmp_path, **kw):
    kw.setdefault("data_dir", str(tmp_path / "data"))
    return TrainConfig(
        model=ModelConfig(pretrained=False),
        batch_size=2,
        num_epochs=1,
        height=32,
        width=48,
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=1,
        num_workers=0,
        **kw,
    )


@pytest.fixture(scope="module")
def tiny_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_data")
    rng = np.random.default_rng(0)
    for split, n in (("train", 4), ("val", 2)):
        d = root / "rover" / split
        d.mkdir(parents=True)
        for i in range(n):
            arr = (rng.random((40, 56, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"img_{i}.png")
    return str(root)


def test_compute_losses_structure(rng):
    images = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
    outputs = {("disp", 0): jnp.asarray(rng.random((2, 16, 16, 1), dtype=np.float32))}
    losses = compute_losses(images, outputs, jax.random.PRNGKey(0))
    assert set(losses) == {"total", "depth", "smoothness"}
    total = float(losses["total"])
    assert np.isfinite(total) and total >= 0
    np.testing.assert_allclose(
        total, float(losses["depth"]) + float(losses["smoothness"]), rtol=1e-6
    )


def test_depth_loss_scale():
    # With disp == const c, target = c * jitter, |disp - target| = c*|1-jitter|
    # E[|1-jitter|] = E[|0.1 - 0.2 U|]... just check bounded by 0.1 * c.
    disp = jnp.full((1, 8, 8, 1), 0.5)
    images = jnp.zeros((1, 8, 8, 3))
    losses = compute_losses(images, {("disp", 0): disp}, jax.random.PRNGKey(1))
    assert float(losses["smoothness"]) == 0.0
    assert 0.0 < float(losses["depth"]) <= 0.05 + 1e-6


def test_lr_schedule_staircase():
    sched = make_lr_schedule(1e-4, steps_per_epoch=10, step_size_epochs=15, gamma=0.5)
    assert sched(0) == 1e-4
    assert sched(10 * 14) == 1e-4          # epoch 14
    assert sched(10 * 15) == 5e-5          # epoch 15
    assert sched(10 * 30) == 2.5e-5        # epoch 30


def test_adapter_trains_and_checkpoints(tiny_data, tmp_path):
    cfg = _tiny_cfg(tmp_path, data_dir=tiny_data)
    adapter = MarsDomainAdapter(cfg)
    p0 = np.asarray(
        jax.tree_util.tree_leaves(adapter.params)[0]
    ).copy()
    result = adapter.finetune(1)
    assert len(result["history"]) == 1
    h = result["history"][0]
    assert np.isfinite(h["train"]["total"])
    assert np.isfinite(h["val"]["total"])
    assert set(h["metrics"]) == set(MarsDomainAdapter.METRIC_NAMES)
    p1 = np.asarray(jax.tree_util.tree_leaves(adapter.params)[0])
    assert not np.allclose(p0, p1), "parameters did not update"
    # saves use write-once monotonic sequence keys; the true step/epoch live
    # inside the state (one boundary save here)
    assert adapter._ckpt_mgr.latest_step() == 1


def test_adapter_resume(tiny_data, tmp_path):
    cfg = _tiny_cfg(tmp_path, data_dir=tiny_data)
    adapter = MarsDomainAdapter(cfg)
    adapter.finetune(1)
    step = adapter.step
    del adapter

    cfg2 = _tiny_cfg(tmp_path, data_dir=tiny_data, resume=True)
    adapter2 = MarsDomainAdapter(cfg2)
    assert adapter2.step == step
    assert adapter2.epoch == 1


@pytest.mark.parametrize("accum", [1, 2])
def test_midepoch_checkpoint_resume_matches_uninterrupted(
        tiny_data, tmp_path, accum):
    """Preemption-safe training (grain backend): kill a run mid-epoch after
    a step checkpoint, resume in a NEW process-equivalent adapter, and the
    final params equal the uninterrupted run exactly (same batches in the
    same order with the same RNG stream — no replayed or skipped data).
    accum=2 crashes MID-ACCUMULATION: the optax.MultiSteps gradient
    accumulator and counter must round-trip through the checkpoint."""
    import os

    import jax

    def cfg_for(sub, **kw):
        return _tiny_cfg(tmp_path / sub, data_dir=tiny_data,
                         loader_backend="grain", grad_accum_steps=accum, **kw)

    # reference: uninterrupted single epoch (2 steps with batch 2 over 4)
    ref = MarsDomainAdapter(cfg_for("ref"))
    ref.finetune(1)
    ref_leaves = jax.tree_util.tree_leaves(ref.params)

    # preempted run: checkpoint every step, crash before step 2
    cfg_a = cfg_for("mid", checkpoint_every_steps=1)
    a = MarsDomainAdapter(cfg_a)
    real_step = a._train_step
    calls = {"n": 0}

    def crashing_step(*args):
        if calls["n"] == 1:
            raise KeyboardInterrupt("preempted")
        calls["n"] += 1
        return real_step(*args)

    a._train_step = crashing_step
    with pytest.raises(KeyboardInterrupt):
        a.finetune(1)
    assert a.step == 1
    assert os.path.exists(a._data_state_path())

    # resume and finish the epoch
    b = MarsDomainAdapter(cfg_for("mid", checkpoint_every_steps=1,
                                  resume=True))
    assert b.step == 1 and b.epoch == 0
    assert getattr(b, "_pending_data_state", None) is not None
    b.finetune(1)
    assert b.step == ref.step
    assert not os.path.exists(b._data_state_path())  # cleared at epoch end

    for rl, bl in zip(ref_leaves, jax.tree_util.tree_leaves(b.params)):
        np.testing.assert_allclose(np.asarray(rl), np.asarray(bl),
                                   atol=1e-6, rtol=1e-6)


def test_step_and_epoch_checkpoints_share_ordered_keyspace(tiny_data, tmp_path):
    """Step-cadence and epoch-boundary saves share one write-once monotonic
    keyspace (save-sequence keys): after a completed epoch, resume restores
    the epoch-boundary state — NOT a stale mid-epoch cadence save landing on
    the same optimizer step (which would silently replay the epoch)."""
    cfg = _tiny_cfg(tmp_path / "ck", data_dir=tiny_data,
                    loader_backend="grain", checkpoint_every_steps=1)
    a = MarsDomainAdapter(cfg)
    a.finetune(1)
    assert a.epoch == 1

    b = MarsDomainAdapter(_tiny_cfg(tmp_path / "ck", data_dir=tiny_data,
                                    loader_backend="grain",
                                    checkpoint_every_steps=1, resume=True))
    assert b.epoch == 1          # post-epoch state won, not the step save
    assert b.step == a.step
    assert getattr(b, "_pending_data_state", None) is None


def test_orphaned_midepoch_checkpoint_falls_back(tiny_data, tmp_path):
    """A mid-epoch checkpoint whose sidecar loader position was lost (crash
    between the orbax save and the sidecar write) must NOT resume — it would
    silently replay the epoch prefix.  Resume skips it and falls back to the
    newest still-consistent state (here the epoch-1 boundary save)."""
    import json
    import os

    def cfg_for(**kw):
        return _tiny_cfg(tmp_path / "orph", data_dir=tiny_data,
                         loader_backend="grain", checkpoint_every_steps=1,
                         **kw)

    a = MarsDomainAdapter(cfg_for())
    real_step = a._train_step
    calls = {"n": 0}

    def crashing_step(*args):
        if calls["n"] == 3:  # epoch 0: steps 1-2; epoch 1: step 3; crash on 4
            raise KeyboardInterrupt("preempted")
        calls["n"] += 1
        return real_step(*args)

    a._train_step = crashing_step
    with pytest.raises(KeyboardInterrupt):
        a.finetune(2)
    assert a.step == 3 and a.epoch == 1

    # simulate the crash landing between orbax save and sidecar write:
    # the sidecar still shows the PREVIOUS cadence position
    path = a._data_state_path()
    data = json.load(open(path))
    assert data["step"] == 3
    data["step"] = 2
    with open(path, "w") as f:
        json.dump(data, f)

    b = MarsDomainAdapter(cfg_for(resume=True))
    # the step-3 checkpoint is orphaned -> fall back to the epoch-0 boundary
    assert b.epoch == 1 and b.step == 2
    assert getattr(b, "_pending_data_state", None) is None


def test_encoder_lr_is_lower(tiny_data, tmp_path):
    """The encoder param group must move ~10x less than the decoder group
    for comparable gradients (reference mars_adapter.py:49-55)."""
    cfg = _tiny_cfg(tmp_path, data_dir=tiny_data)
    adapter = MarsDomainAdapter(cfg)
    import optax

    # inspect the multi_transform labels
    from monodepth_tpu.train.adapter import _label_params

    labels = _label_params(adapter.params)
    assert set(jax.tree_util.tree_leaves(labels["encoder"])) == {"encoder"}
    assert set(jax.tree_util.tree_leaves(labels["decoder"])) == {"rest"}


def test_remat_model_forward_and_grad(rng, tmp_path):
    """remat=True produces identical outputs and allows gradients."""
    import jax.numpy as jnp
    from monodepth_tpu.models import DepthAnything

    x = jnp.asarray(rng.random((1, 48, 64, 3), dtype=np.float32))
    plain = DepthAnything(remat=False)
    remat = DepthAnything(remat=True)
    variables = plain.init(jax.random.PRNGKey(0), x)
    out_p = plain.apply(variables, x, 1.0)[("disp", 0)]
    out_r = remat.apply(variables, x, 1.0)[("disp", 0)]
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_p), atol=1e-6)

    def loss(params):
        out = remat.apply(
            {"params": params, "batch_stats": variables["batch_stats"]}, x, 1.0
        )
        return jnp.mean(out[("disp", 0)])

    g = jax.grad(loss)(variables["params"])
    leaf = np.asarray(jax.tree_util.tree_leaves(g)[0])
    assert np.isfinite(leaf).all()


def test_flip_consistency_loss_golden():
    from monodepth_tpu.train.losses import flip_consistency_loss

    disp = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 2, 6, 1))
    # perfectly consistent: flipped disparity = mirror of disp
    disp_flipped = disp[:, :, ::-1, :]
    assert float(flip_consistency_loss(disp, disp_flipped)) == 0.0
    # constant offset
    assert float(flip_consistency_loss(disp, disp_flipped + 1.0)) == pytest.approx(1.0)


def test_adapter_flip_mode_trains(tiny_data, tmp_path):
    cfg = _tiny_cfg(tmp_path, data_dir=tiny_data, loss_mode="flip")
    adapter = MarsDomainAdapter(cfg)
    losses = adapter.train_one_epoch()
    assert np.isfinite(losses["total"])
    assert losses["depth"] >= 0.0


def test_grad_accum_matches_single_step(tiny_data, tmp_path):
    """grad_accum_steps=2 over two identical micro-batches equals ONE step of
    the plain optimizer on that batch (mean of identical grads = the grad),
    and the mid-accumulation micro-batch leaves params untouched."""
    acc = MarsDomainAdapter(
        _tiny_cfg(tmp_path / "a", data_dir=tiny_data, grad_accum_steps=2))
    one = MarsDomainAdapter(_tiny_cfg(tmp_path / "b", data_dir=tiny_data))

    images = jnp.asarray(
        np.random.default_rng(3).random((2, 32, 48, 3)).astype(np.float32))
    scales = jnp.ones((2,), jnp.float32)
    rng0 = jax.random.PRNGKey(7)

    p0 = jax.tree_util.tree_map(np.asarray, acc.params)
    acc.params, acc.batch_stats, acc.opt_state, _ = acc._train_step(
        acc.params, acc.batch_stats, acc.opt_state, images, scales, rng0)
    for before, after in zip(jax.tree_util.tree_leaves(p0),
                             jax.tree_util.tree_leaves(acc.params)):
        np.testing.assert_array_equal(before, np.asarray(after))

    acc.params, acc.batch_stats, acc.opt_state, _ = acc._train_step(
        acc.params, acc.batch_stats, acc.opt_state, images, scales, rng0)
    one.params, one.batch_stats, one.opt_state, _ = one._train_step(
        one.params, one.batch_stats, one.opt_state, images, scales, rng0)
    for got, want in zip(jax.tree_util.tree_leaves(acc.params),
                         jax.tree_util.tree_leaves(one.params)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6, rtol=1e-5)


def test_adapter_mesh_ragged_val_batch(tmp_path):
    """Mesh training survives ragged batches: uneven device_put splits are
    impossible, so ragged tails trim to the data-axis multiple (dropped
    rows, not crashes) and fully-trimmed batches are skipped."""
    from PIL import Image as _Image

    from monodepth_tpu.parallel.mesh import create_mesh

    root = tmp_path / "data"
    rng_np = np.random.default_rng(0)
    for split, count in (("train", 4), ("val", 3)):  # val: batches [2, 1]
        d = root / "rover" / split
        d.mkdir(parents=True)
        for i in range(count):
            arr = (rng_np.random((40, 56, 3)) * 255).astype(np.uint8)
            _Image.fromarray(arr).save(d / f"img_{i}.png")

    cfg = _tiny_cfg(tmp_path, data_dir=str(root))
    mesh = create_mesh(jax.devices()[:2])  # data=2: the 1-row tail trims to 0
    adapter = MarsDomainAdapter(cfg, mesh=mesh)
    adapter.finetune(1)
    # the run completed; losses from the surviving batches are finite
    assert np.isfinite(adapter.validate()[0]["total"])


# ------------------------------------------------- multi-scale supervision
def _one_step_losses(loss_scales, loss_mode="reference"):
    """One train step on a fresh tiny model with the given loss_scales
    (fixed seed: runs are exactly repeatable)."""
    from monodepth_tpu.models import build_model
    from monodepth_tpu.train.adapter import make_optimizer, make_train_step

    cfg = TrainConfig(model=ModelConfig(pretrained=False), batch_size=2,
                      height=32, width=48, checkpoint_dir="",
                      loss_mode=loss_mode, loss_scales=loss_scales)
    model = build_model(cfg.model)
    images = jnp.asarray(np.random.default_rng(7).random(
        (2, 32, 48, 3), dtype=np.float32))
    scales = jnp.ones((2,), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), images[:1], train=False)
    params = dict(variables["params"])
    stats = dict(variables["batch_stats"])
    tx = make_optimizer(params, cfg, steps_per_epoch=1)
    step = make_train_step(model, tx, cfg)
    new_params, _, _, losses = step(params, stats, tx.init(params), images,
                                    scales, jax.random.PRNGKey(1))
    return new_params, losses


def test_multi_scale_loss_single_scale_matches_default():
    """loss_scales=(0,) is bit-identical to the pre-multi-scale step."""
    p_default, l_default = _one_step_losses((0,))
    p_single, l_single = _one_step_losses((0,))
    assert float(l_default["total"]) == float(l_single["total"])
    for a, b in zip(jax.tree_util.tree_leaves(p_default),
                    jax.tree_util.tree_leaves(p_single)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multi_scale_loss_differs_and_is_finite():
    """All-scale supervision changes the loss and the update, and every
    supervised scale contributes gradient (finite, nonzero update)."""
    _, l_single = _one_step_losses((0,))
    p_multi, l_multi = _one_step_losses((0, 1, 2, 3))
    assert np.isfinite(float(l_multi["total"]))
    assert float(l_multi["total"]) != float(l_single["total"])
    # dispconv_3 (finest-scale head) gets gradient ONLY under multi-scale:
    # with (0,) its Adam update is exactly zero
    p_single2, _ = _one_step_losses((0,))
    from monodepth_tpu.models import build_model

    model = build_model(ModelConfig(pretrained=False))
    init = dict(model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 48, 3)), train=False)["params"])
    d3_init = np.asarray(init["decoder"]["dispconv_3"]["kernel"])
    d3_single = np.asarray(p_single2["decoder"]["dispconv_3"]["kernel"])
    d3_multi = np.asarray(p_multi["decoder"]["dispconv_3"]["kernel"])
    np.testing.assert_array_equal(d3_single, d3_init)
    assert np.abs(d3_multi - d3_init).max() > 0


def test_multi_scale_adapter_trains(tiny_data, tmp_path):
    cfg = _tiny_cfg(tmp_path, data_dir=tiny_data,
                    loss_scales=(0, 1, 2, 3), loss_mode="flip")
    adapter = MarsDomainAdapter(cfg)
    losses = adapter.train_one_epoch()
    assert np.isfinite(losses["total"])
