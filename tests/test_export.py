"""AOT export artifacts (monodepth_tpu/export.py): serialize the depth
program to StableHLO, reload it WITHOUT model code, and match the live
model. Covers the symbolic-batch path (one artifact, any batch size) and
the manifest contract the CLI prints."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_model():
    import jax

    from monodepth_tpu.config import ModelConfig
    from monodepth_tpu.models import DepthAnything

    cfg = ModelConfig(dtype="float32", pretrained=False)
    model = DepthAnything(dtype=np.float32, output_scales=(0,))
    x = np.zeros((1, 96, 128, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return cfg, model, variables


def test_export_roundtrip_symbolic_batch(small_model, tmp_path):
    import jax.numpy as jnp

    from monodepth_tpu.export import export_depth_model, load_exported

    cfg, model, variables = small_model
    out = export_depth_model(cfg, variables, str(tmp_path / "artifact"),
                             height=96, width=128, batch=None)

    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert manifest["input"]["batch"] == "dynamic"
    assert os.path.getsize(os.path.join(out, "model.jaxexp")) > 0
    # the artifact must be a program, not a weight dump
    assert os.path.getsize(os.path.join(out, "model.jaxexp")) < 50 * 2**20

    loaded = load_exported(out)
    rng = np.random.default_rng(0)
    for b in (1, 3):  # symbolic batch: two different sizes, one artifact
        images = rng.random((b, 96, 128, 3), dtype=np.float32)
        scales = np.ones((b,), np.float32)
        got = np.asarray(loaded.predict(variables, images, scales))
        want = np.asarray(model.apply(
            variables, jnp.asarray(images), jnp.asarray(scales)
        )[("disp", 0)][..., 0])
        assert got.shape == (b, 96, 128)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_export_fixed_batch_rejects_other_sizes(small_model, tmp_path):
    from monodepth_tpu.export import export_depth_model, load_exported

    cfg, model, variables = small_model
    out = export_depth_model(cfg, variables, str(tmp_path / "fixed"),
                             height=96, width=128, batch=2)
    loaded = load_exported(out)
    images = np.zeros((2, 96, 128, 3), np.float32)
    res = np.asarray(loaded.predict(variables, images))
    assert res.shape == (2, 96, 128)
    with pytest.raises(Exception):
        loaded.predict(variables, np.zeros((3, 96, 128, 3), np.float32))


def test_artifact_estimator_behind_service(small_model, tmp_path):
    """ArtifactDepthEstimator plugs into the micro-batching service: the
    frozen program serves requests with the raw-reciprocal depth contract,
    and off-contract shapes are rejected."""
    import jax.numpy as jnp

    from monodepth_tpu.export import ArtifactDepthEstimator, export_depth_model
    from monodepth_tpu.serve import DepthService

    cfg, model, variables = small_model
    out = export_depth_model(cfg, variables, str(tmp_path / "srv"),
                             height=96, width=128, batch=None)
    backend = ArtifactDepthEstimator(out, variables)
    service = DepthService(backend, max_batch=2, max_wait_ms=20.0)
    try:
        rng = np.random.default_rng(1)
        imgs = [rng.random((96, 128, 3), dtype=np.float32) for _ in range(3)]
        futs = [service.submit(im, {"source": "rover", "height": 1.5})
                for im in imgs]
        results = [f.result(timeout=60) for f in futs]
        for im, r in zip(imgs, results):
            assert r["disp"].shape == (96, 128)
            np.testing.assert_allclose(
                r["depth"], 1.0 / np.clip(r["disp"], 1e-6, None), rtol=1e-6)
        # scale metadata must flow through disp_scale_factor
        from monodepth_tpu.inference import preprocess_image
        from monodepth_tpu.models import disp_scale_factor

        meta = {"source": "rover", "height": 1.5}
        want = np.asarray(model.apply(
            variables, jnp.asarray(preprocess_image(imgs[0])[None]),
            jnp.asarray([disp_scale_factor(meta)], np.float32)
        )[("disp", 0)][..., 0])[0]
        np.testing.assert_allclose(results[0]["disp"], want, atol=1e-5)

        with pytest.raises(ValueError, match="artifact serves"):
            backend.predict_batch(np.zeros((1, 64, 64, 3), np.float32))
    finally:
        service.close()


def test_microbatcher_fixed_bucket_pads_every_batch():
    """buckets=[N] (fixed-batch artifacts) pads every device batch to N."""
    from monodepth_tpu.serve import MicroBatcher

    seen = []

    def predict(images, metas):
        seen.append(len(images))
        return {"disp": np.zeros((len(images), 4, 4), np.float32)}

    mb = MicroBatcher(predict, max_batch=4, max_wait_ms=5.0, buckets=[4])
    try:
        fut = mb.submit(np.zeros((4, 4, 3), np.float32))
        fut.result(timeout=30)
        assert seen == [4]  # single request still padded to the fixed batch
    finally:
        mb.close()


def test_export_cli(small_model, tmp_path, monkeypatch):
    """The CLI exports + self-verifies against the live estimator."""
    from monodepth_tpu.cli.export_model import main

    rc = main(["--output_dir", str(tmp_path / "cli_artifact"),
               "--height", "96", "--width", "128", "--batch", "2",
               "--dtype", "float32", "--verify"])
    assert rc == 0
    manifest = json.load(
        open(tmp_path / "cli_artifact" / "manifest.json"))
    assert manifest["input"] == {"height": 96, "width": 128, "batch": 2}
