"""Fused Dense(fc1) + GELU Pallas TPU kernel.

Why this kernel exists (measured, docs/PERF_STUDY.md §00): on the native
tower XLA does NOT fuse the exact-erf GELU into the fc1 matmul — it runs as
a separate VPU pass costing ~1.6 ms/layer over [B, 4097, 3072] activations
(~20 ms of the 12-layer tower's 106.6 ms; transcendental-compute-bound, not
HBM-bound).  Computing GELU inside the matmul kernel's epilogue, on the f32
accumulator block while it is still in VMEM:

- removes the intermediate bf16 round trip (read + write of the fc1 output,
  ~0.5 ms/layer of HBM), and
- lets Mosaic's software pipeline overlap the VPU epilogue of block i with
  the MXU work and DMA of block i+1 (the matmul result is awaited per-block,
  not per-op), instead of running ALL matmul blocks then ALL gelu blocks.

Round-5 on-chip verdict (scripts/dev_gelu_probe.py under the trained v2
weights): the kernel now COMPILES on real hardware (the A&S erf below) but
LOSES to XLA's own fusion — native forward 67.4 img/s fused vs 69.6 plain
XLA vs 84.0 with the plain-XLA tanh GELU ('xla_tanh', the shipped default
for bf16 native serving via ModelConfig.mlp_impl='auto').  The kernel is
retained as a measurement baseline and Pallas epilogue exemplar, not a
recommendation.

Accuracy: the epilogue applies GELU to the f32 accumulator and rounds ONCE
to the IO dtype; the unfused XLA path rounds the matmul output to bf16
*before* the GELU.  Fewer roundings does NOT make it strictly more
accurate in practice: Mosaic tiles the K-dim accumulation in a different
order than XLA, and at bf16 input precision that reassociation dominates —
measured max rel err vs f32 truth 3.6e-3 (kernel) vs 2.3e-3 (XLA bf16)
on [4096, 768] x [768, 3072] (round-5 probe).  Same order, different
constant; neither path is uniformly closer to f32.
`gelu_impl='erf'` is the torch-parity exact form (reference torchvision MLP,
torch.nn.GELU default); 'tanh' is the cheaper standard approximation whose
deviation from erf (max ~1e-3 absolute) is of the same order as bf16 output
rounding — a measured-quality serving knob, never a silent default.

Mosaic (the Pallas TPU compiler) has no erf primitive — `jax.lax.erf`
raises NotImplementedError at lowering (measured on-chip, round 4:
/tmp/chip/gelu_probe.log).  Inside the kernel the 'erf' path therefore
uses the Abramowitz & Stegun 7.1.26 rational approximation (exp-based,
mathematical bound |error| <= 1.5e-7; evaluated in f32 the polynomial's
own rounding brings the measured max to ~4.6e-7 over [-6, 6], asserted
< 1e-6 by test_kernel_erf_approximation_accuracy) — still orders of
magnitude below one bf16 output rounding, so the kernel's 'erf' is
strictly more accurate than the unfused XLA bf16 path.
The jnp reference (`dense_gelu_reference`) keeps the true `lax.erf`;
interpret-mode tests bound the kernel-vs-reference gap.

Differentiable via a custom VJP whose backward is the plain jnp reference
(XLA fuses the recomputed z = x @ W + b into the backward graph).

Validated against the jnp reference in interpret mode on CPU
(tests/test_fused_matmul.py); on-chip compile + A/B via
scripts/dev_gelu_probe.py (round-5 session log in docs/PERF_STUDY.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_dense_gelu", "dense_gelu_reference", "gelu_f32"]

_SQRT_2 = 1.4142135623730951
_TANH_C0 = 0.7978845608028654   # sqrt(2/pi)
_TANH_C1 = 0.044715


def _erf_as7126_f32(x):
    """erf via Abramowitz & Stegun 7.1.26 (max |error| 1.5e-7): the only
    transcendental it needs is exp, which Mosaic lowers; `jax.lax.erf`
    does not (NotImplementedError on TPU Pallas)."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def gelu_f32(z, impl: str = "erf", in_kernel: bool = False):
    """GELU on an f32 tensor. 'erf' = exact (torch default); 'tanh' = the
    Hendrycks & Gimpel approximation.  in_kernel=True swaps `lax.erf` for
    the A&S 7.1.26 form Mosaic can lower (module docstring, Accuracy)."""
    if impl == "erf":
        erf = _erf_as7126_f32 if in_kernel else jax.lax.erf
        return z * 0.5 * (1.0 + erf(z * (1.0 / _SQRT_2)))
    assert impl == "tanh", impl
    return 0.5 * z * (1.0 + jnp.tanh(_TANH_C0 * (z + _TANH_C1 * z * z * z)))


def dense_gelu_reference(x, w, b, gelu_impl: str = "erf"):
    """jnp reference: gelu(x @ w + b) with f32 accumulation/epilogue and one
    final rounding to x.dtype — the kernel's exact numeric contract."""
    z = jnp.dot(x, w, preferred_element_type=jnp.float32)
    z = z + b.astype(jnp.float32)
    return gelu_f32(z, gelu_impl).astype(x.dtype)


def _dense_gelu_kernel(x_ref, w_ref, b_ref, o_ref, *, gelu_impl):
    z = jax.lax.dot_general(
        x_ref[...], w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    z = z + b_ref[...].astype(jnp.float32)
    o_ref[...] = gelu_f32(z, gelu_impl, in_kernel=True).astype(o_ref.dtype)


def _fused_dense_gelu_impl(x, w, b, gelu_impl, block_m, block_n, interpret):
    orig_shape = x.shape
    k = orig_shape[-1]
    n_out = w.shape[-1]
    m = 1
    for s in orig_shape[:-1]:
        m *= s
    x2d = x.reshape(m, k)

    bm = min(block_m, ((m + 7) // 8) * 8)
    bn = min(block_n, n_out)
    assert n_out % bn == 0, (n_out, bn)
    m_pad = ((m + bm - 1) // bm) * bm
    if m_pad != m:
        x2d = jnp.pad(x2d, ((0, m_pad - m), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_dense_gelu_kernel, gelu_impl=gelu_impl),
        # N outer so the (k, bn) weight block stays VMEM-resident across the
        # whole M sweep (one HBM read of w per N block).
        grid=(n_out // bn, m_pad // bm),
        in_specs=[
            pl.BlockSpec((bm, k), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_out), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(x2d, w.astype(x.dtype), b.reshape(1, n_out))
    if m_pad != m:
        out = out[:m]
    return out.reshape(*orig_shape[:-1], n_out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_dense_gelu(x, w, b, gelu_impl: str = "erf", block_m: int = 512,
                     block_n: int = 3072, interpret: bool = False):
    """gelu(x @ w + b) in one Pallas kernel (GELU on the f32 accumulator).

    x: [..., K]; w: [K, N]; b: [N].  Returns [..., N] in x.dtype.
    gelu_impl: 'erf' (torch-parity exact) | 'tanh' (cheaper approximation,
    quality-gated knob).
    """
    return _fused_dense_gelu_impl(x, w, b, gelu_impl, block_m, block_n,
                                  interpret)


def _fused_dense_gelu_fwd(x, w, b, gelu_impl, block_m, block_n, interpret):
    out = _fused_dense_gelu_impl(x, w, b, gelu_impl, block_m, block_n,
                                 interpret)
    return out, (x, w, b)


def _fused_dense_gelu_bwd(gelu_impl, block_m, block_n, interpret, res, g):
    x, w, b = res
    _, vjp = jax.vjp(
        lambda xx, ww, bb: dense_gelu_reference(xx, ww, bb, gelu_impl),
        x, w, b)
    return vjp(g)


fused_dense_gelu.defvjp(_fused_dense_gelu_fwd, _fused_dense_gelu_bwd)
