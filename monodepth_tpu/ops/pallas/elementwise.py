"""Fused residual-add + LayerNorm Pallas TPU kernel.

The pre-LN transformer block (models/vit.py EncoderBlock) pays for its
elementwise chain in HBM round trips over [B, S, D] activations: the
residual add writes x2, then LayerNorm re-reads x2 — and x2 must ALSO
persist (it is the next residual).  Fusing the two into one kernel

    x2 = x + y;  ln = (x2 - mean) * rsqrt(var + eps) * gamma + beta

reads x, y once and writes x2, ln once: 4 full-tensor HBM passes instead
of the unfused 5 (add: R x, R y, W x2; LN: R x2, W ln).  On the native
tower this applies at the attention-residual -> ln_2 site of every block
(12 sites at [8, 4097, 768]), and — with the loop carrying a pending
residual — at the mlp-residual -> next ln_1 site too.

Statistics are computed in f32 regardless of IO dtype (matches flax
LayerNorm + the torchvision reference).  The op is differentiable via a
custom VJP whose backward is plain jnp (the standard LN backward closed
form) — the fused forward is an inference/serving lever; training takes
the same numerics through XLA's backward fusion.

Validated against the jnp reference in interpret mode on CPU
(tests/test_fused_elementwise.py) and by the on-chip gate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_add_ln", "add_ln_reference"]


def add_ln_reference(x, y, gamma, beta, eps: float = 1e-6):
    """jnp reference: (x2, ln) with f32 statistics, IO dtype preserved."""
    x2f = x.astype(jnp.float32) + y.astype(jnp.float32)
    mean = jnp.mean(x2f, axis=-1, keepdims=True)
    d = x2f - mean
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    ln = d * jax.lax.rsqrt(var + eps)
    ln = ln * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return x2f.astype(x.dtype), ln.astype(x.dtype)


def _add_ln_kernel(x_ref, y_ref, g_ref, b_ref, x2_ref, ln_ref, *, eps):
    x2 = x_ref[:].astype(jnp.float32) + y_ref[:].astype(jnp.float32)
    x2_ref[:] = x2.astype(x2_ref.dtype)
    mean = jnp.mean(x2, axis=-1, keepdims=True)
    d = x2 - mean
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    ln = d * jax.lax.rsqrt(var + eps)
    ln_ref[:] = (ln * g_ref[:].astype(jnp.float32)
                 + b_ref[:].astype(jnp.float32)).astype(ln_ref.dtype)


def _fused_add_ln_fwd_impl(x, y, gamma, beta, eps, block_rows, interpret):
    orig_shape = x.shape
    d = orig_shape[-1]
    n = 1
    for s in orig_shape[:-1]:
        n *= s
    x2d = x.reshape(n, d)
    y2d = y.reshape(n, d)
    g2d = gamma.reshape(1, d)
    b2d = beta.reshape(1, d)

    rows = min(block_rows, n)
    pad = (-n) % rows
    if pad:
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
        y2d = jnp.pad(y2d, ((0, pad), (0, 0)))
    grid = ((n + pad) // rows,)

    x2, ln = pl.pallas_call(
        functools.partial(_add_ln_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, d), lambda i: (i, 0)),
            pl.BlockSpec((rows, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((rows, d), lambda i: (i, 0)),
            pl.BlockSpec((rows, d), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(((n + pad), d), x.dtype),
            jax.ShapeDtypeStruct(((n + pad), d), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x2d, y2d, g2d, b2d)
    if pad:
        x2, ln = x2[:n], ln[:n]
    return x2.reshape(orig_shape), ln.reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_add_ln(x, y, gamma, beta, eps: float = 1e-6,
                 block_rows: int = 512, interpret: bool = False):
    """(x2, ln) = (x + y, LayerNorm(x + y) * gamma + beta), one HBM pass.

    x, y: [..., D]; gamma, beta: [D].  Returns both the residual sum and
    the normalized tensor (both are live in a pre-LN transformer block).
    """
    return _fused_add_ln_fwd_impl(x, y, gamma, beta, eps, block_rows,
                                  interpret)


def _fused_add_ln_fwd(x, y, gamma, beta, eps, block_rows, interpret):
    x2, ln = _fused_add_ln_fwd_impl(x, y, gamma, beta, eps, block_rows,
                                    interpret)
    return (x2, ln), (x2, gamma)


def _fused_add_ln_bwd(eps, block_rows, interpret, res, cts):
    """Standard LN backward in plain jnp (XLA fuses it with the rest of the
    backward graph); dx == dy because x and y enter only as x + y."""
    x2, gamma = res
    dx2_direct, dln = cts

    x2f = x2.astype(jnp.float32)
    dlnf = dln.astype(jnp.float32)
    gf = gamma.astype(jnp.float32)

    mean = jnp.mean(x2f, axis=-1, keepdims=True)
    d = x2f - mean
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = d * inv

    dgamma = jnp.sum(dlnf * xhat,
                     axis=tuple(range(x2.ndim - 1))).astype(gamma.dtype)
    dbeta = jnp.sum(dlnf, axis=tuple(range(x2.ndim - 1))).astype(gamma.dtype)

    dxhat = dlnf * gf
    dx2_ln = inv * (dxhat - jnp.mean(dxhat, axis=-1, keepdims=True)
                    - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    dx = (dx2_direct.astype(jnp.float32) + dx2_ln).astype(x2.dtype)
    return dx, dx, dgamma, dbeta


fused_add_ln.defvjp(_fused_add_ln_fwd, _fused_add_ln_bwd)
