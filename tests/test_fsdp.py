"""FSDP (ZeRO-3-style) sharding tests on the virtual 8-device CPU mesh.

`shard_params(..., fsdp=True)` shards every large ViT param over the
'data' axis on top of the Megatron TP rules; optimizer state created
after placement inherits it (parallel/mesh.py docstring).  These tests
assert (a) the partition rules, (b) that params AND Adam moments are
actually sharded, (c) one FSDP train step equals the unsharded step,
and (d) checkpoint resume re-places the restored state on the mesh.
"""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from monodepth_tpu.config import ModelConfig, TrainConfig
from monodepth_tpu.parallel.mesh import (
    create_mesh,
    param_partition_spec,
    shard_batch,
    shard_params,
)


def test_fsdp_partition_rules():
    z = np.zeros
    vit = ("encoder", "vit", "block_0")
    # column-parallel + FSDP on the in dim
    assert param_partition_spec(vit + ("qkv", "kernel"), z((768, 2304)),
                                fsdp_data=4) == P("data", "model")
    assert param_partition_spec(
        ("encoder", "vit", "block_1", "mlp", "fc1", "kernel"),
        z((768, 3072)), fsdp_data=4) == P("data", "model")
    # row-parallel + FSDP on the out dim
    assert param_partition_spec(vit + ("out_proj", "kernel"), z((768, 768)),
                                fsdp_data=4) == P("model", "data")
    assert param_partition_spec(
        ("encoder", "vit", "block_1", "mlp", "fc2", "kernel"),
        z((3072, 768)), fsdp_data=4) == P("model", "data")
    # un-TP'd large params shard their biggest divisible dim
    assert param_partition_spec(("encoder", "vit", "patch_embed", "kernel"),
                                z((16, 16, 3, 768)), fsdp_data=4) == \
        P(None, None, None, "data")
    assert param_partition_spec(("encoder", "vit", "pos_embedding"),
                                z((1, 197, 768)), fsdp_data=4) == \
        P(None, None, "data")
    # small params stay replicated (below _FSDP_MIN_ELEMENTS)
    assert param_partition_spec(vit + ("ln_1", "scale"), z((768,)),
                                fsdp_data=4) == P()
    assert param_partition_spec(("encoder", "vit", "cls_token"),
                                z((1, 1, 768)), fsdp_data=4) == P()
    # non-ViT params are out of FSDP scope (decoder is tiny)
    assert param_partition_spec(
        ("decoder", "init_conv", "conv3x3", "conv", "kernel"),
        z((3, 3, 256, 256)), fsdp_data=4) == P()
    # fsdp_data=0 keeps the plain TP rules
    assert param_partition_spec(vit + ("qkv", "kernel"), z((768, 2304)),
                                fsdp_data=0) == P(None, "model")


def _leaf_specs(tree):
    out = []
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "sharding"):
            out.append((tuple(getattr(leaf, "shape", ())),
                        getattr(leaf.sharding, "spec", None)))
    return out


def test_fsdp_params_and_optstate_sharded():
    """Params shard (data x model) and the Adam moments inherit it."""
    from monodepth_tpu.models import DepthAnything
    from monodepth_tpu.train.adapter import make_optimizer

    model = DepthAnything()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 48, 3)))
    mesh = create_mesh(jax.devices()[:8], model=2)  # data=4, model=2
    placed = shard_params(dict(variables), mesh, fsdp=True)
    qkv = placed["params"]["encoder"]["vit"]["block_0"]["qkv"]["kernel"]
    # (768, 2304) / (data=4, model=2) -> per-device (192, 1152)
    assert {s.data.shape for s in qkv.addressable_shards} == {(192, 1152)}

    cfg = TrainConfig(model=ModelConfig(pretrained=False), fsdp=True,
                      checkpoint_dir="")
    tx = make_optimizer(placed["params"], cfg, steps_per_epoch=1)
    opt_state = tx.init(placed["params"])
    # every Adam-moment leaf matching the qkv kernel shape carries the
    # param's FSDP sharding (zeros_like preserves placement)
    mu_specs = [spec for shape, spec in _leaf_specs(opt_state)
                if shape == (768, 2304)]
    assert mu_specs, "no Adam moment with the qkv kernel shape found"
    assert all(spec == P("data", "model") for spec in mu_specs), mu_specs


def test_fsdp_train_step_matches_unsharded(rng):
    """One FSDP+TP optimizer step == the single-device step (GSPMD)."""
    from monodepth_tpu.models import DepthAnything
    from monodepth_tpu.train.adapter import make_optimizer, make_train_step

    cfg = TrainConfig(model=ModelConfig(pretrained=False), batch_size=4,
                      height=32, width=48, checkpoint_dir="")
    model = DepthAnything()
    images = jnp.asarray(rng.random((4, 32, 48, 3), dtype=np.float32))
    scales = jnp.ones((4,), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), images[:1], train=False)
    params = dict(variables["params"])
    stats = dict(variables["batch_stats"])
    step_rng = jax.random.PRNGKey(1)

    def one_step(params, stats, mesh):
        tx = make_optimizer(params, cfg, steps_per_epoch=1)
        if mesh is not None:
            placed = shard_params({"params": params, "batch_stats": stats},
                                  mesh, fsdp=True)
            params, stats = placed["params"], placed["batch_stats"]
        opt_state = tx.init(params)
        ims, scs = images, scales
        if mesh is not None:
            shard_of = lambda t: jax.tree_util.tree_map(  # noqa: E731
                lambda x: getattr(x, "sharding", None), t)
            step = make_train_step(
                model, tx, cfg,
                state_shardings=(shard_of(params), shard_of(opt_state)))
            with mesh:
                ims, scs = shard_batch((images, scales), mesh)
                return step(params, stats, opt_state, ims, scs, step_rng)
        return make_train_step(model, tx, cfg)(
            params, stats, opt_state, ims, scs, step_rng)

    import copy

    ref_params, _, _, ref_losses = one_step(
        copy.deepcopy(params), copy.deepcopy(stats), None)
    mesh = create_mesh(jax.devices()[:8], model=2)
    new_params, _, new_opt, losses = one_step(params, stats, mesh)

    np.testing.assert_allclose(float(losses["total"]),
                               float(ref_losses["total"]),
                               rtol=1e-5, atol=1e-6)
    got = np.asarray(new_params["encoder"]["vit"]["block_0"]["qkv"]["kernel"])
    want = np.asarray(
        ref_params["encoder"]["vit"]["block_0"]["qkv"]["kernel"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)
    # the updated param kept its FSDP placement (GSPMD propagated it
    # through the jitted step rather than gathering to replicated)
    out_spec = new_params["encoder"]["vit"]["block_0"]["qkv"][
        "kernel"].sharding.spec
    assert out_spec == P("data", "model"), out_spec
    # ... and so did the updated Adam moments
    mu_specs = [spec for shape, spec in _leaf_specs(new_opt)
                if shape == (768, 2304)]
    assert mu_specs and all(
        spec == P("data", "model") for spec in mu_specs), mu_specs


@pytest.fixture()
def tiny_data(tmp_path):
    # batch_size=4 on a data=4 mesh: batches must be exact multiples of 4
    # or the mesh path trims them away (8 train / 8 val -> 2 full batches)
    root = tmp_path / "data"
    rng = np.random.default_rng(0)
    for split, n in (("train", 8), ("val", 8)):
        d = root / "rover" / split
        d.mkdir(parents=True)
        for i in range(n):
            arr = (rng.random((40, 56, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"img_{i}.png")
    return str(root)


def test_fsdp_adapter_resume_replaces_on_mesh(tiny_data, tmp_path):
    """Resume restores host arrays; the adapter re-places params AND the
    optimizer state on the mesh with their FSDP shardings."""
    from monodepth_tpu.train.adapter import MarsDomainAdapter

    def cfg(**kw):
        return TrainConfig(model=ModelConfig(pretrained=False),
                           data_dir=tiny_data, batch_size=4, num_epochs=1,
                           height=32, width=48, num_workers=0,
                           checkpoint_dir=str(tmp_path / "ckpt"),
                           checkpoint_every=1, fsdp=True, **kw)

    mesh = create_mesh(jax.devices()[:8], model=2)
    adapter = MarsDomainAdapter(cfg(), mesh=mesh)
    qkv = adapter.params["encoder"]["vit"]["block_0"]["qkv"]["kernel"]
    assert {s.data.shape for s in qkv.addressable_shards} == {(192, 1152)}
    adapter.finetune(1)
    step = adapter.step
    del adapter

    resumed = MarsDomainAdapter(cfg(resume=True), mesh=mesh)
    assert resumed.step == step
    qkv = resumed.params["encoder"]["vit"]["block_0"]["qkv"]["kernel"]
    assert {s.data.shape for s in qkv.addressable_shards} == {(192, 1152)}
    mu_specs = [spec for shape, spec in _leaf_specs(resumed.opt_state)
                if shape == (768, 2304)]
    assert mu_specs and all(
        spec == P("data", "model") for spec in mu_specs), mu_specs
    # and training continues from the restored sharded state
    losses = resumed.validate()[0]
    assert np.isfinite(losses["total"])
