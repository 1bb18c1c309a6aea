"""Sequence self-supervision: PoseNet, the monodepth2 objective on real
frame pairs (automasking, pose-conditioned reprojection), the pair dataset,
and the loss_mode='sequence' adapter path.

The reference ships the pose/reprojection machinery (layers.py:28-193) but
no pose network and no sequence loss (SURVEY.md §2.4 dead code); these
tests cover the live TPU-native completion of that capability.
"""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from monodepth_tpu.config import ModelConfig, TrainConfig
from monodepth_tpu.data.dataset import MarsSequenceDataset
from monodepth_tpu.layers import disp_to_depth, transformation_from_parameters
from monodepth_tpu.models.pose import PoseNet
from monodepth_tpu.train.adapter import MarsDomainAdapter
from monodepth_tpu.train.losses import compute_losses_sequence, synthetic_pair


# ------------------------------------------------------------------ PoseNet
def test_posenet_shapes_and_near_identity(rng):
    net = PoseNet()
    pair = jnp.asarray(rng.random((2, 64, 96, 6), dtype=np.float32))
    variables = net.init(jax.random.PRNGKey(0), pair)
    assert "batch_stats" not in variables  # GroupNorm: no mutable state
    axisangle, translation = net.apply(variables, pair)
    assert axisangle.shape == (2, 1, 3)
    assert translation.shape == (2, 1, 3)
    # 0.01 output scaling: a random init must start near the identity
    # transform or every reprojection lands off-image (dead gradients)
    assert float(jnp.max(jnp.abs(axisangle))) < 0.05
    assert float(jnp.max(jnp.abs(translation))) < 0.05
    # and it must produce a valid SE(3)
    T = transformation_from_parameters(axisangle, translation)
    assert T.shape == (2, 4, 4)
    np.testing.assert_allclose(np.asarray(T[:, 3]), [[0, 0, 0, 1]] * 2, atol=1e-6)


def test_posenet_gradients_flow(rng):
    net = PoseNet()
    pair = jnp.asarray(rng.random((1, 32, 48, 6), dtype=np.float32))
    variables = net.init(jax.random.PRNGKey(0), pair)

    def loss(v):
        aa, tt = net.apply(v, pair)
        return jnp.sum(aa**2) + jnp.sum(tt**2)

    grads = jax.grad(loss)(variables)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in leaves)


# ------------------------------------------------------- sequence objective
def _textured(rng, b, h, w):
    """Smooth random texture (pure noise defeats SSIM; a real image has
    spatial structure the photometric loss can latch onto)."""
    base = rng.random((b, h // 4 + 1, w // 4 + 1, 3)).astype(np.float32)
    img = np.stack(
        [np.kron(base[i, ..., c], np.ones((4, 4)))[:h, :w]
         for i in range(b) for c in range(3)], -1).reshape(h, w, b, 3)
    return jnp.asarray(np.moveaxis(img, 2, 0))


def _disp_for_depth(depth, min_depth=0.1, max_depth=100.0):
    """Invert disp_to_depth: the sigmoid disparity whose depth is `depth`."""
    return ((1.0 / depth - 1.0 / max_depth)
            / (1.0 / min_depth - 1.0 / max_depth))


def test_sequence_loss_prefers_true_depth():
    """Render a geometrically consistent source view of a plane at depth d*
    with a known camera motion; the reprojection loss with the TRUE depth
    must beat a wrong depth under the same pose."""
    b, h, w = 1, 48, 64
    plane_depth = 1.0
    target = _textured(np.random.default_rng(0), b, h, w)
    axisangle = jnp.zeros((b, 1, 3))
    translation = jnp.asarray([[[0.03, 0.0, 0.0]]])
    _, T_inv = (transformation_from_parameters(axisangle, translation),
                transformation_from_parameters(axisangle, translation,
                                               invert=True))
    source = synthetic_pair(target, T_inv, plane_depth)

    key = jax.random.PRNGKey(0)

    def loss_at(depth_value):
        disp = jnp.full((b, h, w, 1), _disp_for_depth(depth_value))
        return float(compute_losses_sequence(
            target, source, disp, axisangle, translation, key,
            smoothness_weight=0.0, auto_mask=False)["depth"])

    true_loss = loss_at(plane_depth)
    assert true_loss < loss_at(plane_depth * 4.0)
    assert true_loss < loss_at(plane_depth * 0.3)


def test_sequence_automask_suppresses_static_pixels():
    """target == source (camera did not move): automasking must route
    (nearly) every pixel to the identity error, so the depth term collapses
    and automask_frac ~ 0 — the monodepth2 static-frame guard."""
    b, h, w = 1, 32, 48
    target = _textured(np.random.default_rng(1), b, h, w)
    axisangle = jnp.zeros((b, 1, 3))
    translation = jnp.asarray([[[0.05, 0.0, 0.0]]])  # wrong pose on purpose
    disp = jnp.full((b, h, w, 1), 0.5)
    key = jax.random.PRNGKey(0)

    masked = compute_losses_sequence(
        target, target, disp, axisangle, translation, key,
        smoothness_weight=0.0, auto_mask=True)
    unmasked = compute_losses_sequence(
        target, target, disp, axisangle, translation, key,
        smoothness_weight=0.0, auto_mask=False)
    assert float(masked["depth"]) < float(unmasked["depth"])
    assert float(masked["automask_frac"]) < 0.2
    assert float(masked["depth"]) < 1e-3  # identity error of equal frames ~ 0


def test_sequence_loss_structure(rng):
    b, h, w = 2, 16, 24
    target = jnp.asarray(rng.random((b, h, w, 3), dtype=np.float32))
    source = jnp.asarray(rng.random((b, h, w, 3), dtype=np.float32))
    disp = jnp.asarray(rng.random((b, h, w, 1), dtype=np.float32))
    losses = compute_losses_sequence(
        target, source, disp, jnp.zeros((b, 1, 3)), jnp.zeros((b, 1, 3)),
        jax.random.PRNGKey(0))
    assert set(losses) == {"total", "depth", "smoothness", "automask_frac"}
    np.testing.assert_allclose(
        float(losses["total"]),
        float(losses["depth"]) + float(losses["smoothness"]), rtol=1e-6)
    assert all(np.isfinite(float(v)) for v in losses.values())


# ------------------------------------------------------------ pair dataset
def _write_frames(root, n, h=40, w=56, source="rover", split="train"):
    d = root / source / split
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(7)
    for i in range(n):
        arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"frame_{i:03d}.png")
    return d


def test_sequence_dataset_pairs_consecutive(tmp_path):
    _write_frames(tmp_path, 4)
    ds = MarsSequenceDataset(str(tmp_path), "train", 32, 48,
                             sources=("rover",), is_train=False,
                             normalize=False)
    assert len(ds) == 3  # 4 frames -> 3 consecutive pairs
    item = ds[0]
    assert item["image"].shape == (32, 48, 6)
    # target channel block = frame i (the single-image dataset's item i),
    # source block = frame i+1
    from monodepth_tpu.data.dataset import MarsImageDataset

    single = MarsImageDataset(str(tmp_path), "train", 32, 48,
                              sources=("rover",), is_train=False,
                              normalize=False)
    np.testing.assert_array_equal(item["image"][..., :3], single[0]["image"])
    item1 = ds[1]
    np.testing.assert_array_equal(item["image"][..., 3:],
                                  item1["image"][..., :3])


def test_sequence_dataset_never_pairs_across_directories(tmp_path):
    _write_frames(tmp_path, 3, source="rover")
    _write_frames(tmp_path, 3, source="satellite")
    ds = MarsSequenceDataset(str(tmp_path), "train", 16, 24,
                             sources=("rover", "satellite"))
    # 3 frames per dir -> 2 pairs per dir; the rover->satellite seam is not
    # a pair
    assert len(ds) == 4
    import os

    for meta in ds.samples:
        assert (os.path.dirname(meta["path"])
                == os.path.dirname(meta["source_path"]))


def test_sequence_dataset_shared_augmentation(tmp_path):
    """Identical frames must stay identical after train-time augmentation:
    the pair shares ONE jitter/flip draw (independent draws would show up
    as fake appearance change to the photometric loss)."""
    d = tmp_path / "rover" / "train"
    d.mkdir(parents=True)
    arr = (np.random.default_rng(3).random((40, 56, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(d / "a.png")
    Image.fromarray(arr).save(d / "b.png")
    ds = MarsSequenceDataset(str(tmp_path), "train", 32, 48,
                             sources=("rover",), is_train=True,
                             normalize=False)
    for seed in range(5):
        item = ds.get(0, rng=np.random.default_rng(seed))
        np.testing.assert_array_equal(item["image"][..., :3],
                                      item["image"][..., 3:])


# ---------------------------------------------------------- adapter e2e
@pytest.fixture(scope="module")
def seq_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("seq_data")
    _write_frames(root, 6, split="train")
    _write_frames(root, 3, split="val")
    return str(root)


def _seq_cfg(tmp_path, seq_data, **kw):
    return TrainConfig(
        model=ModelConfig(pretrained=False),
        data_dir=seq_data,
        loss_mode="sequence",
        batch_size=2,
        num_epochs=1,
        height=32,
        width=48,
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=1,
        num_workers=0,
        **kw,
    )


def test_adapter_sequence_mode_trains(seq_data, tmp_path):
    adapter = MarsDomainAdapter(_seq_cfg(tmp_path, seq_data))
    assert "pose" in adapter.params

    def snap(tree):
        return [np.asarray(x).copy() for x in jax.tree_util.tree_leaves(tree)]

    def max_delta(before, tree):
        return max(np.abs(np.asarray(x) - b).max()
                   for b, x in zip(before, jax.tree_util.tree_leaves(tree)))

    pose0 = snap(adapter.params["pose"])
    enc0 = snap(adapter.params["encoder"])
    losses = adapter.train_one_epoch()
    assert np.isfinite(losses["total"])
    # pose and depth nets both moved: this is JOINT training.  (Max over the
    # whole subtree: individual leaves like channel_reduce_0 legitimately
    # get no gradient — ("disp", 0) is emitted at the coarsest decoder level
    # BEFORE the skip that consumes encoder feature 0, the reference's
    # scale-index quirk.)
    assert max_delta(pose0, adapter.params["pose"]) > 0
    assert max_delta(enc0, adapter.params["encoder"]) > 0
    # validation runs on the target frame of each pair
    val_losses, metrics = adapter.validate()
    assert np.isfinite(val_losses["total"])
    assert np.isfinite(metrics["abs_rel"])


def test_adapter_sequence_checkpoint_roundtrip(seq_data, tmp_path):
    cfg = _seq_cfg(tmp_path, seq_data)
    a = MarsDomainAdapter(cfg)
    a.train_one_epoch()
    a.epoch = 1
    a.save_model()

    b = MarsDomainAdapter(_seq_cfg(tmp_path, seq_data, resume=True))
    assert b.epoch == 1
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(a.params["pose"])[0]),
        np.asarray(jax.tree_util.tree_leaves(b.params["pose"])[0]))


def test_sequence_mesh_train_step_matches_unsharded(rng):
    """One TP+DP+FSDP-sharded sequence (depth+pose) train step equals the
    single-device step: the joint params tree (pose subtree replicated, ViT
    under the Megatron+FSDP rules) and the 6-channel pair batch compose
    with the mesh exactly like the single-frame modes."""
    from monodepth_tpu.parallel.mesh import (
        create_mesh, shard_batch, shard_params,
    )
    from monodepth_tpu.train.adapter import make_optimizer, make_train_step

    cfg = TrainConfig(model=ModelConfig(pretrained=False),
                      loss_mode="sequence", batch_size=4,
                      height=32, width=48, checkpoint_dir="")
    from monodepth_tpu.models import build_model

    model = build_model(cfg.model)
    pose_net = PoseNet()
    images = jnp.asarray(rng.random((4, 32, 48, 6), dtype=np.float32))
    scales = jnp.ones((4,), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), images[:1, ..., :3],
                           train=False)
    params = dict(variables["params"])
    params["pose"] = dict(
        pose_net.init(jax.random.PRNGKey(2), images[:1])["params"])
    stats = dict(variables["batch_stats"])
    step_rng = jax.random.PRNGKey(1)

    def one_step(params, stats, mesh):
        tx = make_optimizer(params, cfg, steps_per_epoch=1)
        if mesh is None:
            opt_state = tx.init(params)
            step = make_train_step(model, tx, cfg, pose_net=pose_net)
            return step(params, stats, opt_state, images, scales, step_rng)
        placed = shard_params({"params": params, "batch_stats": stats},
                              mesh, fsdp=True)
        params, stats = placed["params"], placed["batch_stats"]
        opt_state = tx.init(params)
        shard_of = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda x: getattr(x, "sharding", None), t)
        step = make_train_step(
            model, tx, cfg, pose_net=pose_net,
            state_shardings=(shard_of(params), shard_of(opt_state)))
        with mesh:
            ims, scs = shard_batch((images, scales), mesh)
            return step(params, stats, opt_state, ims, scs, step_rng)

    import copy

    ref_params, _, _, ref_losses = one_step(
        copy.deepcopy(params), copy.deepcopy(stats), None)
    mesh = create_mesh(jax.devices()[:8], model=2)
    new_params, _, _, losses = one_step(params, stats, mesh)

    np.testing.assert_allclose(float(losses["total"]),
                               float(ref_losses["total"]),
                               rtol=1e-5, atol=1e-6)
    for leaf_got, leaf_want in zip(
            jax.tree_util.tree_leaves(new_params["pose"]),
            jax.tree_util.tree_leaves(ref_params["pose"])):
        np.testing.assert_allclose(np.asarray(leaf_got),
                                   np.asarray(leaf_want),
                                   rtol=1e-4, atol=2e-5)
    got = np.asarray(new_params["encoder"]["vit"]["block_0"]["qkv"]["kernel"])
    want = np.asarray(
        ref_params["encoder"]["vit"]["block_0"]["qkv"]["kernel"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)
