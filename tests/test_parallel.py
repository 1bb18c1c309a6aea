"""Sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4 item 4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from monodepth_tpu.parallel.mesh import (
    create_mesh,
    param_partition_spec,
    shard_batch,
    shard_params,
)


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_create_mesh_shapes():
    mesh = create_mesh(jax.devices()[:8], model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh_dp = create_mesh(jax.devices()[:8])
    assert mesh_dp.shape == {"data": 8, "model": 1}
    with pytest.raises(AssertionError):
        create_mesh(jax.devices()[:8], model=3)


def test_param_partition_rules():
    assert param_partition_spec(("encoder", "vit", "block_0", "qkv", "kernel"), None) == P(None, "model")
    assert param_partition_spec(("encoder", "vit", "block_3", "out_proj", "kernel"), None) == P("model", None)
    assert param_partition_spec(("encoder", "vit", "block_1", "mlp", "fc1", "kernel"), None) == P(None, "model")
    assert param_partition_spec(("encoder", "vit", "block_1", "mlp", "fc2", "kernel"), None) == P("model", None)
    assert param_partition_spec(("decoder", "init_conv", "conv3x3", "conv", "kernel"), None) == P()
    assert param_partition_spec(("encoder", "vit", "block_0", "ln_1", "scale"), None) == P()


def test_sharded_forward_matches_single_device(rng):
    """TP+DP sharded forward == single-device forward (GSPMD correctness)."""
    from monodepth_tpu.models import DepthAnything

    model = DepthAnything()
    x = jnp.asarray(rng.random((4, 48, 64, 3), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    want = np.asarray(model.apply(variables, x, 1.0)[("disp", 0)])

    mesh = create_mesh(jax.devices()[:8], model=2)
    with mesh:
        placed = shard_params(variables, mesh)
        xs = shard_batch(x, mesh)
        fwd = jax.jit(lambda v, xx: model.apply(v, xx, 1.0)[("disp", 0)])
        got = np.asarray(fwd(placed, xs))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_params_actually_sharded():
    from monodepth_tpu.models import DepthAnything

    model = DepthAnything()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 64, 3)))
    mesh = create_mesh(jax.devices()[:8], model=2)
    placed = shard_params(variables, mesh)
    qkv = placed["params"]["encoder"]["vit"]["block_0"]["qkv"]["kernel"]
    # column-parallel: the out dim (2304) is split over 2 model shards
    shard_shapes = {s.data.shape for s in qkv.addressable_shards}
    assert shard_shapes == {(768, 1152)}
    conv = placed["params"]["decoder"]["dispconv_0"]["kernel"]
    assert {s.data.shape for s in conv.addressable_shards} == {conv.shape}


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ran = ge.dryrun_multichip(8)
    # Every flagship leg must actually execute (round-4 regression: a stray
    # `legs = []` made the dryrun a no-op that still printed OK).
    assert any(leg.startswith("standard-train") for leg in ran), ran
    assert any(leg.startswith("enhanced-train") for leg in ran), ran
    assert any(leg.startswith("sequence-train") for leg in ran), ran
    assert any(leg.startswith("sharded-predict") for leg in ran), ran
    assert len(ran) == 4, ran


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 384, 512, 1)
    assert bool(jnp.isfinite(out).all())


def test_dryrun_multichip_four_devices():
    """Odd mesh factorization path (4 devices -> data:2 x model:2).
    One cheap leg at a small shape — the full 4-leg real-shape run is
    test_dryrun_multichip_entrypoint's job."""
    import __graft_entry__ as ge

    ran = ge.dryrun_multichip(4, legs=("standard",),
                              standard_shape=(96, 128))
    assert len(ran) == 1 and ran[0].startswith("standard-train@96x128"), ran


def test_sharded_enhanced_forward_matches_single_device(rng):
    """TP+DP GSPMD correctness for the ENHANCED model: the Megatron rules
    cover the ViT projections; the enhanced-only modules (spatial
    attention convs, uncertainty, refinement, fusion) stay replicated and
    must still produce identical outputs under the mesh."""
    from monodepth_tpu.models import EnhancedDepthAnything

    model = EnhancedDepthAnything(light_outputs=True)
    x = jnp.asarray(rng.random((4, 48, 64, 3), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    want = np.asarray(model.apply(variables, x, 1.0)[("disp", 0)])

    mesh = create_mesh(jax.devices()[:8], model=2)
    with mesh:
        placed = shard_params(variables, mesh)
        xs = shard_batch(x, mesh)
        fwd = jax.jit(lambda v, xx: model.apply(v, xx, 1.0)[("disp", 0)])
        got = np.asarray(fwd(placed, xs))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
