"""Inference engine unit tests: image loading, batching, return_all, config
default regression guards (reference canonical defaults, SURVEY.md §5)."""

import numpy as np
import pytest
from PIL import Image

from monodepth_tpu.config import InferenceConfig, ModelConfig, TrainConfig
from monodepth_tpu.inference import MarsDepthEstimator, load_image, preprocess_image


def test_config_defaults_match_reference():
    """Canonical reference defaults are regression-locked (SURVEY.md §5)."""
    inf = InferenceConfig()
    assert inf.max_size == 1024               # run_mars_depth.py:41
    assert inf.source == "auto"
    tr = TrainConfig()
    assert tr.batch_size == 8                 # mars_finetune.py defaults
    assert tr.num_epochs == 20
    assert tr.learning_rate == 1e-4
    assert tr.encoder_lr_factor == 0.1        # mars_adapter.py:52-55
    assert tr.scheduler_step_size == 15
    assert tr.scheduler_gamma == 0.5
    assert (tr.height, tr.width) == (384, 512)
    assert tr.depth_weight == 1.0
    assert tr.smoothness_weight == 0.001
    assert tr.checkpoint_every == 5           # mars_adapter.py:112
    m = ModelConfig()
    assert (m.min_depth, m.max_depth) == (0.1, 100.0)


def test_load_image_downscale(tmp_path, rng):
    arr = (rng.random((100, 200, 3)) * 255).astype(np.uint8)
    p = tmp_path / "wide.png"
    Image.fromarray(arr).save(p)
    img = load_image(str(p), max_size=50)
    assert max(img.shape[:2]) == 50
    assert img.shape == (25, 50, 3)           # aspect preserved
    assert img.dtype == np.float32 and img.max() <= 1.0
    # no downscale when already small
    img2 = load_image(str(p), max_size=400)
    assert img2.shape == (100, 200, 3)


def test_preprocess_image_dtypes(rng):
    u8 = (rng.random((4, 4, 3)) * 255).astype(np.uint8)
    f = preprocess_image(u8)
    assert f.dtype == np.float32 and f.max() <= 1.0
    f2 = preprocess_image(rng.random((4, 4, 3)).astype(np.float64))
    assert f2.dtype == np.float32


@pytest.fixture(scope="module")
def estimator():
    return MarsDepthEstimator(ModelConfig(pretrained=False))


def test_predict_return_all(estimator, rng):
    img = rng.random((48, 48, 3), dtype=np.float32)
    result = estimator.predict(img, {"source": "rover"}, return_all=True)
    outs = result["outputs"]
    assert set(outs) == {("disp", s) for s in range(4)}
    for v in outs.values():
        assert v.shape == (1, 48, 48, 1)


def test_predict_batch_uniform_and_mixed_sources(estimator, rng):
    imgs = rng.random((3, 48, 48, 3), dtype=np.float32)
    out = estimator.predict_batch(
        imgs, [{"source": "rover"}, {"source": "satellite"},
               {"source": "ingenuity", "altitude": 10.0}]
    )
    assert out["disp"].shape == (3, 48, 48)
    # satellite disparity is 100x smaller than rover for the same weights
    # (not the same image, so compare against its own unit-scale run)
    out_unit = estimator.predict_batch(imgs, None)
    np.testing.assert_allclose(out["disp"][1], out_unit["disp"][1] * 0.01, rtol=1e-4)
    np.testing.assert_allclose(out["disp"][2], out_unit["disp"][2] * 1.0, rtol=1e-4)


def test_enhanced_estimator_has_uncertainty(rng):
    est = MarsDepthEstimator(ModelConfig(enhanced=True, pretrained=False))
    img = rng.random((48, 48, 3), dtype=np.float32)
    result = est.predict(img)
    assert "uncertainty" in result
    assert result["uncertainty"].shape == (48, 48)
    assert (result["uncertainty"] >= 0).all() and (result["uncertainty"] <= 1).all()


def test_tta_blend_properties(rng):
    """Godard post-process: left 5%% edge takes the mirror's prediction,
    right 5%% the original's, middle averages."""
    import jax.numpy as jnp

    from monodepth_tpu.inference import tta_blend

    d = jnp.asarray(rng.random((1, 8, 100, 1), dtype=np.float32))
    df = jnp.asarray(rng.random((1, 8, 100, 1), dtype=np.float32))
    out = np.asarray(tta_blend(d, df))
    np.testing.assert_allclose(out[:, :, 0], np.asarray(df)[:, :, 0],
                               atol=1e-6)
    np.testing.assert_allclose(out[:, :, -1], np.asarray(d)[:, :, -1],
                               atol=1e-6)
    mid = 50
    np.testing.assert_allclose(
        out[:, :, mid],
        0.5 * (np.asarray(d)[:, :, mid] + np.asarray(df)[:, :, mid]),
        atol=1e-6)
    # identical inputs are a fixed point regardless of the ramp
    np.testing.assert_allclose(np.asarray(tta_blend(d, d)), np.asarray(d),
                               rtol=1e-6)


def test_estimator_tta_matches_manual_blend(rng):
    """tta=True must equal blending the plain estimator's prediction with
    its mirrored-input prediction (same seed => same params)."""
    import jax.numpy as jnp

    from monodepth_tpu.inference import tta_blend

    plain = MarsDepthEstimator(ModelConfig(pretrained=False), seed=3)
    tta = MarsDepthEstimator(ModelConfig(pretrained=False, tta=True), seed=3)
    img = rng.random((64, 96, 3), dtype=np.float32)

    got = tta.predict(img, {"source": "rover"})
    d = plain.predict(img, {"source": "rover"})["disp"]
    df = plain.predict(img[:, ::-1, :], {"source": "rover"})["disp"][:, ::-1]
    want = np.asarray(tta_blend(jnp.asarray(d)[None, ..., None],
                                jnp.asarray(df)[None, ..., None]))[0, ..., 0]
    np.testing.assert_allclose(got["disp"], want, atol=2e-5)
    np.testing.assert_allclose(got["depth"], 1.0 / np.clip(want, 1e-6, None),
                               rtol=1e-4)


def test_host_upsample_matches_device_path(rng):
    """host_upsample=True (coarse fetch + f32 host resample, the serving
    default) must match the device full-resolution path.  f32 mode: both
    paths resample in f32 through the SAME two-tap tables, so the only
    difference is summation order."""
    dev = MarsDepthEstimator(ModelConfig(pretrained=False), seed=5)
    host = MarsDepthEstimator(
        ModelConfig(pretrained=False, host_upsample=True), seed=5)
    imgs = rng.random((2, 48, 64, 3), dtype=np.float32)
    metas = [{"source": "rover"}, {"source": "satellite"}]

    want = dev.predict_batch(imgs, metas)
    got = host.predict_batch(imgs, metas)
    assert got["disp"].shape == want["disp"].shape == (2, 48, 64)
    np.testing.assert_allclose(got["disp"], want["disp"], atol=1e-5)
    np.testing.assert_allclose(got["depth"], want["depth"], rtol=1e-4)

    # single-image path shares the epilogue
    one = host.predict(imgs[0], metas[0])
    np.testing.assert_allclose(one["disp"], got["disp"][0], atol=1e-6)


def test_host_upsample_enhanced_uncertainty(rng):
    """Enhanced + host_upsample serves the upsampled uncertainty map too."""
    dev = MarsDepthEstimator(
        ModelConfig(enhanced=True, pretrained=False), seed=7)
    host = MarsDepthEstimator(
        ModelConfig(enhanced=True, pretrained=False, host_upsample=True),
        seed=7)
    img = rng.random((48, 48, 3), dtype=np.float32)
    want = dev.predict(img)
    got = host.predict(img)
    assert got["uncertainty"].shape == (48, 48)
    np.testing.assert_allclose(got["disp"], want["disp"], atol=1e-5)
    np.testing.assert_allclose(got["uncertainty"], want["uncertainty"],
                               atol=1e-5)


def test_host_upsample_rejects_return_all(rng):
    host = MarsDepthEstimator(
        ModelConfig(pretrained=False, host_upsample=True))
    img = rng.random((32, 32, 3), dtype=np.float32)
    with pytest.raises(ValueError, match="return_all"):
        host.predict(img, return_all=True)
    with pytest.raises(ValueError, match="return_all"):
        host.predict_batch(img[None], return_all=True)


def test_resize_bilinear_np_matches_device():
    """The numpy host resample equals the jnp matmul path (shared tables)."""
    import jax.numpy as jnp

    from monodepth_tpu.ops.resize import resize_bilinear, resize_bilinear_np

    r = np.random.default_rng(11)
    x = r.random((2, 7, 9, 1), dtype=np.float32)
    for ac in (False, True):
        want = np.asarray(resize_bilinear(jnp.asarray(x), (30, 41),
                                          align_corners=ac))
        got = resize_bilinear_np(x, (30, 41), align_corners=ac)
        np.testing.assert_allclose(got, want, atol=1e-6)
    # HWC and HW layouts
    np.testing.assert_allclose(
        resize_bilinear_np(x[0], (14, 18)),
        np.asarray(resize_bilinear(jnp.asarray(x[0]), (14, 18))), atol=1e-6)


def test_uint8_feed_matches_float_path(estimator, rng):
    """uint8 batches normalize ON DEVICE (f32/255 inside jit) — within a
    float32 ULP of the host preprocess_image division (XLA may emit a
    reciprocal multiply), at 1/4 the upload bytes."""
    u8 = (rng.random((2, 48, 64, 3)) * 255).astype(np.uint8)
    f32 = u8.astype(np.float32) / 255.0
    got = estimator.predict_batch(u8)
    want = estimator.predict_batch(f32)
    np.testing.assert_allclose(got["disp"], want["disp"], rtol=1e-5)
    one = estimator.predict(u8[0])
    np.testing.assert_allclose(one["disp"], got["disp"][0], rtol=1e-6)


def test_env_default_checkpoint(tmp_path, monkeypatch, rng):
    """MONODEPTH_TPU_CHECKPOINT supplies a default full-model checkpoint to
    any estimator built without an explicit one (the zero-egress stand-in
    for the reference's auto-downloaded weights); an explicit
    ModelConfig.checkpoint wins, and a broken env path degrades to the
    ordinary init with a warning instead of crashing."""
    import warnings

    from monodepth_tpu.config import ModelConfig
    from monodepth_tpu.inference import MarsDepthEstimator

    src = MarsDepthEstimator(ModelConfig(pretrained=False), seed=42)
    pth = str(tmp_path / "trained.pth")
    src.export_reference_checkpoint(pth, dtype="float16")

    monkeypatch.setenv("MONODEPTH_TPU_CHECKPOINT", pth)
    est = MarsDepthEstimator(ModelConfig(pretrained=False), seed=0)
    want = np.asarray(
        src.variables["params"]["decoder"]["dispconv_0"]["kernel"], np.float32)
    got = np.asarray(
        est.variables["params"]["decoder"]["dispconv_0"]["kernel"], np.float32)
    # float16 storage round-trip: exact at half precision
    np.testing.assert_allclose(got, want.astype(np.float16).astype(np.float32))

    # a mismatched/broken env checkpoint must not take down the CLI path
    monkeypatch.setenv("MONODEPTH_TPU_CHECKPOINT", str(tmp_path / "nope.pth"))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        fallback = MarsDepthEstimator(ModelConfig(pretrained=False), seed=0)
    assert any("default checkpoint" in str(x.message) for x in w)
    monkeypatch.setenv("MONODEPTH_TPU_CHECKPOINT", "")
    base = MarsDepthEstimator(ModelConfig(pretrained=False), seed=0)
    np.testing.assert_array_equal(
        np.asarray(fallback.variables["params"]["decoder"]["dispconv_0"]
                   ["kernel"]),
        np.asarray(base.variables["params"]["decoder"]["dispconv_0"]
                   ["kernel"]))


def test_default_checkpoint_resolution(tmp_path, monkeypatch):
    """Resolution order: explicit config > env var ('' disables all
    defaults) > the committed artifacts/mars_depth_v2.pth;
    use_default_checkpoint=False ignores env AND committed defaults."""
    from monodepth_tpu import inference
    from monodepth_tpu.config import ModelConfig
    from monodepth_tpu.inference import MarsDepthEstimator

    # (a) committed-artifact probe: returns the path iff the file exists
    path = inference.default_checkpoint_path()
    import os as _os
    root = _os.path.dirname(_os.path.dirname(
        _os.path.abspath(inference.__file__)))
    want = _os.path.join(root, "artifacts", "mars_depth_v2.pth")
    assert path == (want if _os.path.exists(want) else None)

    # (b) env '' disables every default: weights are the seed init
    monkeypatch.setenv("MONODEPTH_TPU_CHECKPOINT", "")
    a = MarsDepthEstimator(ModelConfig(pretrained=False), seed=0)
    # (c) flag disables defaults even with env var pointing somewhere real
    src = MarsDepthEstimator(ModelConfig(pretrained=False), seed=42)
    pth = str(tmp_path / "t.pth")
    src.export_reference_checkpoint(pth)
    monkeypatch.setenv("MONODEPTH_TPU_CHECKPOINT", pth)
    b = MarsDepthEstimator(
        ModelConfig(pretrained=False, use_default_checkpoint=False), seed=0)
    np.testing.assert_array_equal(
        np.asarray(a.variables["params"]["decoder"]["dispconv_0"]["kernel"]),
        np.asarray(b.variables["params"]["decoder"]["dispconv_0"]["kernel"]))
    # (d) with the flag on, the env var does load
    c = MarsDepthEstimator(ModelConfig(pretrained=False), seed=0)
    np.testing.assert_allclose(
        np.asarray(c.variables["params"]["decoder"]["dispconv_0"]["kernel"]),
        np.asarray(src.variables["params"]["decoder"]["dispconv_0"]["kernel"]),
        rtol=1e-6)


def test_orbax_restore_validates_against_template(tmp_path, monkeypatch):
    """An Orbax checkpoint of a DIFFERENT architecture must fail loudly in
    restore_params (key/shape validation) — which the env-default path
    converts to warn-and-degrade — instead of crashing at the first jitted
    forward with an opaque flax error (round-4 advisor, medium)."""
    import warnings

    import jax

    from monodepth_tpu.config import ModelConfig
    from monodepth_tpu.inference import MarsDepthEstimator
    from monodepth_tpu.train.checkpoints import (
        restore_params, save_checkpoint,
    )

    # Save a STANDARD-model state as an Orbax checkpoint.
    std = MarsDepthEstimator(ModelConfig(
        pretrained=False, use_default_checkpoint=False), seed=0)
    state = {
        "params": jax.tree_util.tree_map(np.asarray, std.variables["params"]),
        "batch_stats": jax.tree_util.tree_map(
            np.asarray, std.variables["batch_stats"]),
    }
    ckpt_dir = str(tmp_path / "std_ckpt")
    save_checkpoint(ckpt_dir, 1, state)

    # Restoring into the SAME architecture round-trips.
    ok = restore_params(ckpt_dir, std.variables)
    np.testing.assert_array_equal(
        np.asarray(ok["params"]["decoder"]["dispconv_0"]["kernel"]),
        np.asarray(std.variables["params"]["decoder"]["dispconv_0"]["kernel"]))

    # Restoring into an ENHANCED template raises (missing enhanced keys).
    enh = MarsDepthEstimator(ModelConfig(
        pretrained=False, enhanced=True, use_default_checkpoint=False),
        seed=0)
    with pytest.raises(ValueError, match="does not match the model"):
        restore_params(ckpt_dir, enh.variables)

    # ... and through the env-default path it degrades with a warning.
    monkeypatch.setenv("MONODEPTH_TPU_CHECKPOINT", ckpt_dir)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        MarsDepthEstimator(ModelConfig(pretrained=False, enhanced=True),
                           seed=0)
    assert any("default checkpoint" in str(x.message) for x in w)


def test_pad_to_bucket_shapes_and_edge_replication(rng):
    from monodepth_tpu.inference import pad_to_bucket

    x = rng.random((1, 30, 45, 3)).astype(np.float32)
    padded, (h, w) = pad_to_bucket(x, 32)
    assert (h, w) == (30, 45)
    assert padded.shape == (1, 32, 64, 3)
    np.testing.assert_array_equal(padded[:, :30, :45], x)
    # edge replication, not zeros: the pad continues the border row/col
    np.testing.assert_array_equal(padded[0, 30, :45], x[0, 29])
    np.testing.assert_array_equal(padded[0, :30, 45], x[0, :, 44])
    np.testing.assert_array_equal(padded[0, 31, 63], x[0, 29, 44])
    # already-aligned input is returned unchanged (no copy, no pad)
    y = rng.random((1, 32, 64, 3)).astype(np.float32)
    same, (h2, w2) = pad_to_bucket(y, 32)
    assert same is y and (h2, w2) == (32, 64)


def test_shape_bucket_crops_maps_and_reuses_compile(rng):
    """Two images of DIFFERENT sizes inside one bucket canvas must produce
    true-size maps from a SINGLE compiled program — the round-5 fix for
    the ~20 s-per-image recompile on heterogeneous folders."""
    est = MarsDepthEstimator(ModelConfig(
        pretrained=False, use_default_checkpoint=False, shape_bucket=32))
    out_a = est.predict(rng.random((30, 45, 3)).astype(np.float32))
    out_b = est.predict(rng.random((27, 52, 3)).astype(np.float32))
    assert out_a["disp"].shape == (30, 45)
    assert out_a["depth"].shape == (30, 45)
    assert out_b["disp"].shape == (27, 52)
    assert np.isfinite(out_a["disp"]).all()
    assert np.isfinite(out_b["disp"]).all()
    cache_size = getattr(est._jitted_forward, "_cache_size", lambda: 1)()
    assert cache_size == 1, (
        f"expected one compiled program for one bucket canvas, "
        f"got {cache_size}")
    # batch path crops too
    batch = est.predict_batch(
        rng.random((2, 30, 45, 3)).astype(np.float32))
    assert batch["disp"].shape == (2, 30, 45)
    assert np.isfinite(batch["disp"]).all()
