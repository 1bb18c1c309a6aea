"""Encoder token-grid quirk unit tests (SURVEY.md §3.6) and checkpoint
loading through the inference engine."""

import numpy as np
import pytest
import torch

from monodepth_tpu.models.encoder import token_grid_shape


def test_grid_224_strips_cls():
    # 224x224 -> 14x14 grid, CLS stripped (encoder.py:83-85)
    assert token_grid_shape(197, 14, 14) == (14, 14, True, 0)


def test_grid_other_sizes_keep_cls_and_pad():
    # any other size: 14x15 grid with CLS kept + 13 zero tokens (SURVEY §3.6)
    for fh, fw in [(24, 32), (64, 64), (6, 8), (14, 15)]:
        gh, gw, strip, pad = token_grid_shape(197, fh, fw)
        assert (gh, gw) == (14, 15)
        assert strip is False
        assert pad == 13


def test_grid_exact_match_no_cls():
    assert token_grid_shape(196, 14, 14) == (14, 14, False, 0)


def test_estimator_loads_reference_pth(tmp_path, rng):
    """torch.save'd reference-format state dict loads via ModelConfig.checkpoint
    and reproduces the oracle's outputs."""
    from tests import torch_oracle as oracle

    gen = torch.Generator().manual_seed(21)
    sd = oracle.make_model_state_dict(gen)
    path = str(tmp_path / "ref_model.pth")
    torch.save(sd, path)

    from monodepth_tpu.config import ModelConfig
    from monodepth_tpu.inference import MarsDepthEstimator

    est = MarsDepthEstimator(ModelConfig(checkpoint=path, pretrained=False))
    img = rng.random((64, 80, 3), dtype=np.float32)
    result = est.predict(img, {"source": "satellite"})

    x = torch.from_numpy(img).permute(2, 0, 1)[None]
    with torch.no_grad():
        want = oracle.model_forward(sd, x, disp_scale=0.01)
    want_disp = want[("disp", 0)][0, 0].numpy()
    np.testing.assert_allclose(result["disp"], want_disp, atol=1e-4, rtol=1e-3)
    # CLI depth contract: raw reciprocal
    np.testing.assert_allclose(
        result["depth"], 1.0 / np.clip(want_disp, 1e-6, None), rtol=1e-3
    )


def test_estimator_convert_to_mars_domain(tmp_path, rng):
    from tests import torch_oracle as oracle

    gen = torch.Generator().manual_seed(22)
    sd = oracle.make_model_state_dict(gen)
    path = str(tmp_path / "mars.pth")
    torch.save(sd, path)

    from monodepth_tpu.config import ModelConfig
    from monodepth_tpu.inference import MarsDepthEstimator

    est = MarsDepthEstimator(ModelConfig(pretrained=False))
    img = rng.random((48, 48, 3), dtype=np.float32)
    before = est.predict(img)["disp"]
    est.convert_to_mars_domain(path)
    after = est.predict(img)["disp"]
    assert not np.allclose(before, after)
    # None is a no-op
    est.convert_to_mars_domain(None)
    np.testing.assert_array_equal(est.predict(img)["disp"], after)


def test_range_normalize_branches(rng):
    """The reference's data-dependent input scaling (encoder.py:131-135):
    [0,255] inputs -> /255 then 2x-1; [0,1] -> 2x-1; already-normalized
    (negative values) -> unchanged."""
    import jax.numpy as jnp

    from monodepth_tpu.models.encoder import _range_normalize

    x255 = rng.random((1, 4, 4, 3)).astype(np.float32) * 255.0
    x255 = np.maximum(x255, 2.0)  # ensure max > 1
    out = np.asarray(_range_normalize(jnp.asarray(x255)))
    np.testing.assert_allclose(out, 2.0 * (x255 / 255.0) - 1.0, rtol=1e-5)

    x01 = rng.random((1, 4, 4, 3)).astype(np.float32)
    out = np.asarray(_range_normalize(jnp.asarray(x01)))
    np.testing.assert_allclose(out, 2.0 * x01 - 1.0, rtol=1e-6)

    xnorm = rng.standard_normal((1, 4, 4, 3)).astype(np.float32)
    xnorm[0, 0, 0, 0] = -2.0  # guarantees min < 0, max < 1 branch skip
    xnorm = np.minimum(xnorm, 0.9)
    out = np.asarray(_range_normalize(jnp.asarray(xnorm)))
    np.testing.assert_allclose(out, xnorm, rtol=1e-6)


def test_weights_roundtrip_export_import():
    """convert -> export -> convert is the identity on every tensor."""
    import jax

    from monodepth_tpu.models.weights import (
        convert_reference_state_dict,
        export_reference_state_dict,
    )
    from tests import torch_oracle as oracle

    gen = torch.Generator().manual_seed(33)
    sd = oracle.make_model_state_dict(gen, enhanced=True)
    params, stats = convert_reference_state_dict(sd, enhanced=True)
    sd2 = export_reference_state_dict(params, stats, enhanced=True)
    params2, stats2 = convert_reference_state_dict(sd2, enhanced=True)

    flat1 = jax.tree_util.tree_leaves_with_path({"p": params, "s": stats})
    flat2 = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path({"p": params2, "s": stats2})
    )
    assert len(flat1) == len(flat2)
    for path, v in flat1:
        key = jax.tree_util.keystr(path)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(flat2[key]), err_msg=key)

    # exported dict matches the original reference keys exactly
    # (torchvision's unused final encoder.ln is the only reference-side extra)
    missing = set(k for k in sd if not k.startswith("encoder.encoder.encoder.ln")) - set(sd2)
    assert not missing, sorted(missing)[:5]


def test_estimator_export_reference_checkpoint(tmp_path, rng):
    """Export current weights as reference .pth; reloading them into a fresh
    estimator reproduces identical predictions."""
    from monodepth_tpu.config import ModelConfig
    from monodepth_tpu.inference import MarsDepthEstimator

    est = MarsDepthEstimator(ModelConfig(pretrained=False), seed=3)
    img = rng.random((48, 48, 3), dtype=np.float32)
    want = est.predict(img, {"source": "rover"})["disp"]

    path = est.export_reference_checkpoint(str(tmp_path / "export.pth"))
    est2 = MarsDepthEstimator(ModelConfig(checkpoint=path, pretrained=False))
    got = est2.predict(img, {"source": "rover"})["disp"]
    np.testing.assert_allclose(got, want, atol=1e-6)
