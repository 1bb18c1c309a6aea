"""Parity against the LITERAL reference implementation (VERDICT r2 item 3).

All other parity tests run through tests/torch_oracle.py — the builder's own
restatement of the reference — so a shared misreading of the reference would
be undetectable.  These tests import /root/reference's actual torch modules
(the three that import without torchvision: layers.py, models/decoder.py,
models/refinement.py) and assert our JAX modules match them bit-for-bit-ish
with shared converted weights.

Skipped gracefully when the reference repo is not mounted.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = os.environ.get("MONODEPTH_REFERENCE", "/root/reference")
if not os.path.isdir(os.path.join(REFERENCE, "models")):
    pytest.skip(f"reference repo not found at {REFERENCE}",
                allow_module_level=True)


@pytest.fixture(scope="module")
def ref():
    """Import the literal reference modules (layers, models.decoder,
    models.refinement, models.enhanced_model) from the mounted reference
    repo.  enhanced_model transitively imports models.encoder, whose only
    import-time external is torchvision (used at *instantiation* time);
    a stub satisfies the import without touching any tested code path."""
    import importlib
    import types

    sys.path.insert(0, REFERENCE)
    stubbed = False
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")
        tv_models.vit_b_16 = None
        tv_models.ViT_B_16_Weights = None
        tv.models = tv_models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models
        stubbed = True
    try:
        mods = {
            "layers": importlib.import_module("layers"),
            "decoder": importlib.import_module("models.decoder"),
            "refinement": importlib.import_module("models.refinement"),
            "enhanced": importlib.import_module("models.enhanced_model"),
        }
    finally:
        sys.path.remove(REFERENCE)
        if stubbed:
            sys.modules.pop("torchvision", None)
            sys.modules.pop("torchvision.models", None)
    return mods


def _np(x):
    return x.detach().cpu().numpy()


def _nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(
        np.moveaxis(x_nhwc, -1, 1))).float()


# ---------------------------------------------------------------- layers.py

def test_disp_to_depth_literal(ref, rng):
    """vs reference layers.py:16-25."""
    from monodepth_tpu.layers import disp_to_depth

    disp = rng.random((2, 8, 9, 1), dtype=np.float32)
    _, want = ref["layers"].disp_to_depth(torch.from_numpy(disp), 0.1, 100.0)
    _, got = disp_to_depth(disp, 0.1, 100.0)
    np.testing.assert_allclose(np.asarray(got), _np(want), rtol=1e-6)


def test_smooth_loss_literal(ref, rng):
    """vs reference layers.py:202-215 (NCHW there, NHWC here)."""
    from monodepth_tpu.layers import get_smooth_loss

    disp = rng.random((2, 12, 14, 1), dtype=np.float32)
    img = rng.random((2, 12, 14, 3), dtype=np.float32)
    want = ref["layers"].get_smooth_loss(_nchw(disp), _nchw(img))
    got = get_smooth_loss(disp, img)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_ssim_literal(ref, rng):
    """vs reference layers.py:218-248 (reflection-padded SSIM module)."""
    from monodepth_tpu.layers import ssim

    x = rng.random((2, 16, 18, 3), dtype=np.float32)
    y = np.clip(x + 0.1 * rng.standard_normal(x.shape, dtype=np.float32), 0, 1)
    m = ref["layers"].SSIM()
    m.eval()
    with torch.no_grad():
        want = m(_nchw(x), _nchw(y))
    got = ssim(x, y)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(got), -1, 1), _np(want), rtol=1e-4, atol=1e-6)


def test_compute_depth_errors_literal(ref, rng):
    """vs reference layers.py:251-269."""
    from monodepth_tpu.layers import compute_depth_errors

    gt = (rng.random((64,), dtype=np.float32) * 50 + 0.5)
    pred = gt * (1 + 0.2 * rng.standard_normal(64).astype(np.float32))
    pred = np.clip(pred, 0.01, None)
    want = ref["layers"].compute_depth_errors(
        torch.from_numpy(gt), torch.from_numpy(pred))
    got = compute_depth_errors(gt, pred)
    want = [float(w) for w in want]
    names = ["abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"]
    got_list = [float(got[n]) for n in names] if isinstance(got, dict) else [
        float(g) for g in got]
    np.testing.assert_allclose(got_list, want, rtol=1e-5)


def test_backproject_project_literal(ref, rng):
    """vs reference layers.py:139-193 (BackprojectDepth + Project3D)."""
    from monodepth_tpu.layers import (backproject_depth, default_intrinsics,
                                      project_3d,
                                      transformation_from_parameters)

    b, h, w = 2, 10, 12
    depth = (rng.random((b, h, w), dtype=np.float32) * 10 + 0.5)
    K, inv_K = default_intrinsics(b, h, w)
    K_np, inv_K_np = np.asarray(K), np.asarray(inv_K)

    bp = ref["layers"].BackprojectDepth(b, h, w)
    with torch.no_grad():
        cam_ref = bp(torch.from_numpy(depth)[:, None],
                     torch.from_numpy(inv_K_np))
    cam = backproject_depth(depth, inv_K)
    np.testing.assert_allclose(np.asarray(cam), _np(cam_ref), rtol=1e-4,
                               atol=1e-4)

    axisangle = rng.standard_normal((b, 1, 3)).astype(np.float32) * 0.1
    translation = rng.standard_normal((b, 1, 3)).astype(np.float32) * 0.1
    T_ref = ref["layers"].transformation_from_parameters(
        torch.from_numpy(axisangle), torch.from_numpy(translation))
    T = transformation_from_parameters(axisangle, translation)
    np.testing.assert_allclose(np.asarray(T), _np(T_ref), rtol=1e-5, atol=1e-6)

    proj = ref["layers"].Project3D(b, h, w)
    with torch.no_grad():
        pix_ref = proj(cam_ref, torch.from_numpy(K_np), T_ref)  # [B,H,W,2]
    pix = project_3d(cam, K, T, h, w)
    # reference returns pixel coords in grid_sample [-1,1]-normalized form
    np.testing.assert_allclose(np.asarray(pix), _np(pix_ref), rtol=1e-3,
                               atol=1e-4)


# ----------------------------------------------------------- models/decoder

def test_decoder_literal_parity(ref, rng):
    """Our decoder vs the literal reference DepthAnythingDecoder with its own
    state_dict() converted (the VERDICT r2 probe: matched at 1.2e-7)."""
    import jax.numpy as jnp

    from monodepth_tpu.models.decoder import DepthAnythingDecoder
    from monodepth_tpu.models.weights import convert_decoder_state_dict

    torch.manual_seed(0)
    ref_dec = ref["decoder"].DepthAnythingDecoder(
        np.array([256, 256, 256, 256]))
    ref_dec.eval()

    feats_nhwc = [rng.standard_normal((1, 14, 15, 256)).astype(np.float32)
                  for _ in range(4)]
    with torch.no_grad():
        want = ref_dec([_nchw(f) for f in feats_nhwc])

    params, stats = convert_decoder_state_dict(
        ref_dec.state_dict(), prefix="convs.")
    ours = DepthAnythingDecoder()
    got = ours.apply({"params": params, "batch_stats": stats},
                     [jnp.asarray(f) for f in feats_nhwc])

    assert set(got) == set(want)
    for key in want:
        g = np.moveaxis(np.asarray(got[key]), -1, 1)
        np.testing.assert_allclose(g, _np(want[key]), atol=5e-6,
                                   err_msg=str(key))


# -------------------------------------------------------- models/refinement

def _conv_params(mod):
    return {"kernel": _np(mod.weight).transpose(2, 3, 1, 0),
            "bias": _np(mod.bias)}


def test_texture_refinement_literal_parity(ref, rng, monkeypatch):
    """Our TextureAwareRefinementModule vs reference refinement.py:8-107.

    The literal reference forward CRASHES on its own dead code: lines 88-89
    convolve the 1-channel depth map with the 3-channel Sobel kernel
    (RuntimeError), and the result `depth_edge_magnitude` is never used.
    We neutralize exactly those two F.conv2d calls (their output is dead)
    so the live data path executes literally.
    """
    import jax.numpy as jnp

    from monodepth_tpu.models.refinement import TextureAwareRefinementModule

    torch.manual_seed(1)
    ref_mod = ref["refinement"].TextureAwareRefinementModule(features=16)
    ref_mod.eval()

    depth = rng.random((2, 20, 24, 1), dtype=np.float32)
    rgb = rng.random((2, 20, 24, 3), dtype=np.float32)
    orig_conv2d = ref["refinement"].F.conv2d

    def conv2d_neutralizing_dead_calls(input, weight, *args, **kwargs):
        groups = args[4] if len(args) > 4 else kwargs.get("groups", 1)
        if input.shape[1] != weight.shape[1] * groups:
            return torch.zeros_like(input)  # the reference's dead lines 88-89
        return orig_conv2d(input, weight, *args, **kwargs)

    monkeypatch.setattr(ref["refinement"].F, "conv2d",
                        conv2d_neutralizing_dead_calls)
    with torch.no_grad():
        want = ref_mod(_nchw(depth), _nchw(rgb))

    params = {
        name: _conv_params(getattr(ref_mod, name))
        for name in ("rgb_conv1", "rgb_conv2", "depth_conv1", "depth_conv2",
                     "combined_conv1", "combined_conv2", "output_conv")
    }
    ours = TextureAwareRefinementModule(features=16)
    got = ours.apply({"params": params}, jnp.asarray(depth), jnp.asarray(rgb))
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1),
                               _np(want), atol=5e-6)


def test_enhanced_self_attention_literal_parity(ref, rng):
    """Our SelfAttentionBlock vs reference enhanced_model.py:11-39."""
    import jax.numpy as jnp

    from monodepth_tpu.models.enhanced import SelfAttentionBlock

    torch.manual_seed(3)
    ref_mod = ref["enhanced"].SelfAttentionBlock(in_channels=32)
    ref_mod.eval()
    with torch.no_grad():
        ref_mod.gamma.fill_(0.7)  # non-zero so the attention path matters

    x = rng.standard_normal((2, 9, 11, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref_mod(_nchw(x))

    params = {name: _conv_params(getattr(ref_mod, name))
              for name in ("query", "key", "value")}
    params["gamma"] = _np(ref_mod.gamma)
    got = SelfAttentionBlock().apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1),
                               _np(want), atol=1e-5)


def test_enhanced_uncertainty_literal_parity(ref, rng):
    """Our UncertaintyModule vs reference enhanced_model.py:41-54."""
    import jax.numpy as jnp

    from monodepth_tpu.models.enhanced import UncertaintyModule

    torch.manual_seed(4)
    ref_mod = ref["enhanced"].UncertaintyModule(in_channels=16)
    ref_mod.eval()
    x = rng.standard_normal((2, 10, 12, 16)).astype(np.float32)
    with torch.no_grad():
        want = ref_mod(_nchw(x))
    params = {f"conv{j}": _conv_params(getattr(ref_mod, f"conv{j}"))
              for j in (1, 2, 3)}
    got = UncertaintyModule().apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1),
                               _np(want), atol=1e-6)


def test_enhanced_fusion_literal_parity(ref, rng):
    """Our MultiScaleFeatureFusion vs reference enhanced_model.py:56-82,
    including the resize-to-coarsest target quirk (SURVEY §3.2)."""
    import jax.numpy as jnp

    from monodepth_tpu.models.enhanced import MultiScaleFeatureFusion

    torch.manual_seed(5)
    ref_mod = ref["enhanced"].MultiScaleFeatureFusion(scales=[0, 1, 2])
    ref_mod.eval()
    with torch.no_grad():
        ref_mod.weights.copy_(torch.tensor([0.5, 0.3, 0.2]))

    sizes = [(6, 8), (12, 16), (24, 32)]
    feats = {s: rng.random((1, h, w, 1), dtype=np.float32)
             for s, (h, w) in enumerate(sizes)}
    with torch.no_grad():
        want = ref_mod({s: _nchw(f) for s, f in feats.items()})
    got = MultiScaleFeatureFusion(scales=(0, 1, 2)).apply(
        {"params": {"weights": _np(ref_mod.weights)}},
        {s: jnp.asarray(f) for s, f in feats.items()})
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1),
                               _np(want), atol=1e-5)


def test_enhanced_texture_refinement_literal_parity(ref, rng):
    """Our TextureAwareRefinement vs reference enhanced_model.py:84-113
    (incl. the depth-features-then-RGB concat order through the conv1
    weight conversion)."""
    import jax.numpy as jnp

    from monodepth_tpu.models.enhanced import TextureAwareRefinement

    torch.manual_seed(6)
    ref_mod = ref["enhanced"].TextureAwareRefinement(in_channels=24)
    ref_mod.eval()
    feats = rng.standard_normal((2, 8, 10, 24)).astype(np.float32)
    rgb = rng.random((2, 16, 20, 3), dtype=np.float32)  # resized inside
    with torch.no_grad():
        want = ref_mod(_nchw(feats), _nchw(rgb))
    params = {f"conv{j}": _conv_params(getattr(ref_mod, f"conv{j}"))
              for j in (1, 2, 3)}
    got = TextureAwareRefinement().apply(
        {"params": params}, jnp.asarray(feats), jnp.asarray(rgb))
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1),
                               _np(want), atol=2e-5)


def test_multi_scale_fusion_literal_parity(ref, rng):
    """Our MultiScaleDepthFusion vs reference refinement.py:109-183."""
    import jax.numpy as jnp

    from monodepth_tpu.models.refinement import MultiScaleDepthFusion

    torch.manual_seed(2)
    ref_mod = ref["refinement"].MultiScaleDepthFusion(scales=[0, 1, 2, 3])
    ref_mod.eval()

    sizes = [(24, 28), (12, 14), (6, 7), (3, 4)]
    scales_nhwc = {("disp", s): rng.random((1, h, w, 1), dtype=np.float32)
                   for s, (h, w) in enumerate(sizes)}
    with torch.no_grad():
        want = ref_mod({k: _nchw(v) for k, v in scales_nhwc.items()})

    params = {f"confidence_conv_{i}": _conv_params(ref_mod.confidence_conv[i])
              for i in range(4)}
    params["fusion_conv"] = _conv_params(ref_mod.fusion_conv)
    ours = MultiScaleDepthFusion(scales=(0, 1, 2, 3))
    got = ours.apply({"params": params},
                     {k: jnp.asarray(v) for k, v in scales_nhwc.items()})
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1),
                               _np(want), atol=5e-6)
