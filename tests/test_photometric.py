"""Photometric self-supervision: bilinear sampling, synthetic-pair warp
geometry, and the loss_mode='photometric' training objective (VERDICT r1
item 5; reference layers.py:139-248 intent)."""

import numpy as np

import jax
import jax.numpy as jnp

from monodepth_tpu.layers import (
    backproject_depth,
    bilinear_sample,
    default_intrinsics,
    get_translation_matrix,
    project_3d,
)
from monodepth_tpu.train.losses import (
    compute_losses_photometric,
    photometric_error,
    synthetic_pair,
)


def _identity_grid(b, h, w):
    ys, xs = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w),
                         indexing="ij")
    grid = np.stack([xs, ys], axis=-1)[None]
    return jnp.asarray(np.repeat(grid, b, axis=0), jnp.float32)


def test_bilinear_sample_identity(rng):
    img = jnp.asarray(rng.random((2, 17, 23, 3), dtype=np.float32))
    got = bilinear_sample(img, _identity_grid(2, 17, 23))
    np.testing.assert_allclose(np.asarray(got), np.asarray(img), atol=1e-6)


def test_bilinear_sample_integer_shift(rng):
    """A one-pixel x-shift of the grid samples the neighboring column."""
    h, w = 16, 20
    img = jnp.asarray(rng.random((1, h, w, 1), dtype=np.float32))
    grid = np.array(_identity_grid(1, h, w))
    grid[..., 0] += 2.0 / (w - 1)  # +1 pixel in normalized coords
    got = np.asarray(bilinear_sample(img, jnp.asarray(grid)))
    want = np.asarray(img)[:, :, 1:, :]
    np.testing.assert_allclose(got[:, :, :-1, :], want, atol=1e-5)


def test_reproject_constant_depth_translation():
    """Backproject a constant-depth plane, translate the camera in x, and
    project: every pixel shifts by f * tx / depth (pinhole parallax)."""
    b, h, w = 1, 32, 48
    depth_val, tx = 2.0, 0.1
    K, inv_K = default_intrinsics(b, h, w)
    depth = jnp.full((b, h, w), depth_val)
    T = get_translation_matrix(jnp.asarray([[tx, 0.0, 0.0]]))
    pix = project_3d(backproject_depth(depth, inv_K), K, T, h, w)
    # normalized -> pixel x
    x_pix = (np.asarray(pix)[0, ..., 0] + 1) / 2 * (w - 1)
    base = np.arange(w, dtype=np.float32)[None, :]
    f = 0.7 * max(h, w)
    np.testing.assert_allclose(x_pix - base,
                               np.full((h, w), f * tx / depth_val),
                               atol=1e-3)


def test_synthetic_pair_roundtrip_at_true_depth(rng):
    """Warping the synthetic source back through the *generating* plane
    depth reconstructs the original image (away from borders).  The
    translation is chosen for an exactly 1-pixel parallax so double
    bilinear resampling is lossless."""
    b, h, w = 1, 48, 64
    plane = 1.0
    f = 0.7 * max(h, w)
    tx = plane / f  # 1-pixel shift at the plane
    images = jnp.asarray(rng.random((b, h, w, 3), dtype=np.float32))
    T = get_translation_matrix(jnp.asarray([[tx, 0.0, 0.0]]))
    T_inv = get_translation_matrix(jnp.asarray([[-tx, 0.0, 0.0]]))
    src = synthetic_pair(images, T_inv, plane)

    K, inv_K = default_intrinsics(b, h, w)
    depth = jnp.full((b, h, w), plane)
    pix = project_3d(backproject_depth(depth, inv_K), K, T, h, w)
    back = np.asarray(bilinear_sample(src, pix))
    want = np.asarray(images)
    # interior only: border pixels clamp at the pad
    err = np.abs(back - want)[:, 4:-4, 4:-4, :]
    assert err.mean() < 1e-4


def test_photometric_error_zero_on_identical(rng):
    x = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
    assert float(jnp.mean(photometric_error(x, x))) < 1e-6


def test_photometric_losses_finite_and_differentiable(rng):
    images = jnp.asarray(rng.random((2, 32, 48, 3), dtype=np.float32))
    disp = jnp.asarray(rng.random((2, 32, 48, 1), dtype=np.float32)) * 0.5 + 0.2

    def total(d):
        return compute_losses_photometric(images, d, jax.random.PRNGKey(0))["total"]

    val, grad = jax.value_and_grad(total)(disp)
    assert np.isfinite(float(val))
    g = np.asarray(grad)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0  # parallax gradients actually flow


def test_photometric_train_step_decreases_loss():
    """3 steps of loss_mode='photometric' on the full model: the objective
    must decrease (the synthetic-pair optimum is reachable)."""
    from monodepth_tpu.config import ModelConfig, TrainConfig
    from monodepth_tpu.models import DepthAnything
    from monodepth_tpu.train.adapter import make_optimizer, make_train_step

    cfg = TrainConfig(model=ModelConfig(pretrained=False), loss_mode="photometric",
                      height=48, width=64, checkpoint_dir="")
    model = DepthAnything()
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((2, 48, 64, 3), dtype=np.float32))
    scales = jnp.ones((2,), jnp.float32)

    variables = model.init(jax.random.PRNGKey(0), images, train=False)
    params = dict(variables["params"])
    stats = dict(variables["batch_stats"])
    tx = make_optimizer(params, cfg, steps_per_epoch=1)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, cfg)

    losses0 = None
    key = jax.random.PRNGKey(1)
    for i in range(3):
        # fixed rng => fixed pose pair; the model must fit it
        params, stats, opt_state, losses = step(
            params, stats, opt_state, images, scales, key)
        if losses0 is None:
            losses0 = float(losses["total"])
    assert float(losses["total"]) < losses0
