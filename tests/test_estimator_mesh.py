"""Mesh-sharded serving path: MarsDepthEstimator(mesh=...) shards device
batches over 'data' (+ Megatron TP over 'model') with outputs numerically
identical to the single-device estimator — the serving-side counterpart of
parallel.inference.ShardedInference (SURVEY.md §2.3)."""

import numpy as np
import pytest

import jax

from monodepth_tpu.config import ModelConfig
from monodepth_tpu.inference import MarsDepthEstimator
from monodepth_tpu.parallel.mesh import create_mesh, parse_mesh_spec


def test_parse_mesh_spec():
    assert parse_mesh_spec(None) is None
    assert parse_mesh_spec("") is None
    m = parse_mesh_spec("data=4,model=2")
    assert m.shape == {"data": 4, "model": 2}
    m2 = parse_mesh_spec(m)
    assert m2 is m
    auto = parse_mesh_spec("auto")
    assert auto.shape["data"] * auto.shape["model"] == len(jax.devices())
    with pytest.raises(ValueError):
        parse_mesh_spec("rows=3")
    with pytest.raises(ValueError):
        parse_mesh_spec("data=x")
    with pytest.raises(ValueError):
        parse_mesh_spec("data=0")  # would ZeroDivide in pad math later
    with pytest.raises(ValueError):
        parse_mesh_spec("model=0")


@pytest.fixture(scope="module")
def plain_estimator():
    return MarsDepthEstimator(ModelConfig(pretrained=False))


@pytest.fixture(scope="module")
def batch():
    return np.random.default_rng(0).random((4, 48, 64, 3), dtype=np.float32)


def test_mesh_estimator_matches_plain(plain_estimator, batch):
    est = MarsDepthEstimator(ModelConfig(pretrained=False), mesh="data=4")
    want = plain_estimator.predict_batch(batch)
    got = est.predict_batch(batch)
    np.testing.assert_allclose(got["disp"], want["disp"],
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(got["depth"], want["depth"],
                               atol=1e-3, rtol=1e-4)

    # ragged batch pads to the data axis and slices back
    ragged = est.predict_batch(batch[:3],
                               metadatas=[{"source": "rover",
                                           "terrain_height": 2.0}] * 3)
    assert ragged["disp"].shape == (3, 48, 64)
    want3 = plain_estimator.predict_batch(
        batch[:3], metadatas=[{"source": "rover",
                               "terrain_height": 2.0}] * 3)
    np.testing.assert_allclose(ragged["disp"], want3["disp"],
                               atol=2e-5, rtol=1e-4)

    # single predict rides the padded batch path under a mesh
    single = est.predict(batch[0])
    np.testing.assert_allclose(single["disp"], want["disp"][0],
                               atol=2e-5, rtol=1e-4)
    assert single["disp"].shape == (48, 64)

    # return_all keeps the unsharded contract: outputs entries keep their
    # leading batch dim of 1 (test_inference_engine asserts the same)
    single_all = est.predict(batch[0], return_all=True)
    for v in single_all["outputs"].values():
        assert v.shape[0] == 1


def test_mesh_estimator_tensor_parallel(plain_estimator, batch):
    """data=4,model=2: ViT projections actually shard; outputs unchanged."""
    est = MarsDepthEstimator(ModelConfig(pretrained=False),
                             mesh=create_mesh(jax.devices()[:8], model=2))
    qkv = est.variables["params"]["encoder"]["vit"]["block_0"]["qkv"][
        "kernel"]
    shard_shape = qkv.sharding.shard_shape(qkv.shape)
    assert shard_shape == (768, 768 * 3 // 2)
    got = est.predict_batch(batch)
    np.testing.assert_allclose(got["disp"],
                               plain_estimator.predict_batch(batch)["disp"],
                               atol=2e-5, rtol=1e-4)


def test_serve_and_run_cli_parse_mesh():
    from monodepth_tpu.cli import run_mars_depth
    from monodepth_tpu.cli.serve import main as _  # noqa: F401 import ok

    args = run_mars_depth.parse_args(["--input", "x.png",
                                      "--mesh", "data=4,model=2"])
    assert args.mesh == "data=4,model=2"
