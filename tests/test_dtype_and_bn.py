"""bf16 perf-path consistency and train-mode BatchNorm parity vs torch."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

import flax.linen as nn


def test_bf16_outputs_close_to_f32(rng):
    """The bf16 perf path stays within a documented tolerance of f32."""
    from monodepth_tpu.models import DepthAnything

    x = jnp.asarray(rng.random((1, 64, 80, 3), dtype=np.float32))
    f32 = DepthAnything(dtype=jnp.float32)
    bf16 = DepthAnything(dtype=jnp.bfloat16)
    variables = f32.init(jax.random.PRNGKey(0), x)
    out32 = np.asarray(f32.apply(variables, x, 1.0)[("disp", 0)])
    out16 = np.asarray(bf16.apply(variables, x, 1.0)[("disp", 0)], dtype=np.float32)
    # disparities live in [0, 1]; bf16 keeps them within ~2e-2 absolute
    assert np.abs(out16 - out32).max() < 2e-2
    assert np.abs(out16 - out32).mean() < 5e-3


def test_batchnorm_train_mode_matches_torch(rng):
    """flax BatchNorm(momentum=0.9) == torch BatchNorm(momentum=0.1):
    same normalized output and same running-stat update (module-level check
    that underpins training parity)."""
    c = 3
    x = rng.standard_normal((4, 8, 8, c), dtype=np.float32)

    bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out, mutated = bn.apply(variables, jnp.asarray(x), mutable=["batch_stats"])

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    tbn = torch.nn.BatchNorm2d(c, momentum=0.1, eps=1e-5)
    tbn.train()
    with torch.no_grad():
        want = tbn(xt).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["mean"]),
        tbn.running_mean.numpy(), atol=1e-5,
    )
    # torch tracks the *unbiased* batch variance in running stats while flax
    # tracks the biased one — a (n/(n-1)) factor difference.  Document it:
    n = x.shape[0] * x.shape[1] * x.shape[2]
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["var"]),
        # convert torch's unbiased running var back to biased for comparison
        1.0 * 0.9 + 0.1 * (torch.var(xt, dim=(0, 2, 3), unbiased=True).numpy()
                            * (n - 1) / n),
        atol=1e-5,
    )


def test_eval_mode_batchnorm_parity(rng):
    """Eval-mode BN with shared running stats matches torch exactly."""
    c = 3
    x = rng.standard_normal((2, 6, 6, c), dtype=np.float32)
    mean = rng.standard_normal(c).astype(np.float32) * 0.1
    var = 1 + rng.random(c).astype(np.float32) * 0.2
    scale = 1 + rng.standard_normal(c).astype(np.float32) * 0.05
    bias = rng.standard_normal(c).astype(np.float32) * 0.05

    bn = nn.BatchNorm(use_running_average=True, epsilon=1e-5)
    variables = {
        "params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        "batch_stats": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)},
    }
    got = np.asarray(bn.apply(variables, jnp.asarray(x)))

    want = F.batch_norm(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(mean), torch.from_numpy(var),
        torch.from_numpy(scale), torch.from_numpy(bias),
        training=False, eps=1e-5,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)
