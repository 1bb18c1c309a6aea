"""Fused attention Pallas TPU kernels (flash: K/V-blocked online softmax).

Two public entry points, both with jnp reference implementations in
`monodepth_tpu.ops.attention` used for validation (interpret mode on CPU):

- `fused_mha(q, k, v, num_heads)` — multi-head attention for the ViT
  (197 tokens in parity mode, 4096+ in native-resolution mode).
- `fused_spatial_attention(q, k, v)` — the enhanced model's HWxHW non-local
  attention (reference enhanced_model.py:24-33; unscaled logits).

Both route through one generic flash kernel: grid (G, q-blocks, k-blocks)
with the k dimension innermost (sequential on TPU), so K/V stream through
VMEM in `block_k` tiles while per-q-block running max / normalizer / value
accumulator live in VMEM scratch across the k iterations.  The [S, S]
attention matrix never exists anywhere, VMEM use is O(block_q * block_k)
independent of sequence length (tested to 16k tokens), and accumulation is
f32 regardless of input dtype.  Masked (padded) keys use a -1e30 logit so
no inf/nan arithmetic ever occurs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_mha", "fused_mha_short", "fused_window_mha",
           "fused_spatial_attention"]

_NEG_BIG = -1e30  # softmax mask value: exp(-1e30 - m) underflows to exactly 0


def _compiler_params(dim_sem):
    """Mosaic dimension semantics: output-tiling dims are 'parallel', the
    online-softmax K sweep is 'arbitrary' (sequential reduction carrying
    VMEM scratch).  None = let Mosaic infer (the pre-round-3 behavior,
    kept for within-run A/B via the dim_sem=None override).

    MONODEPTH_TPU_NO_DIMSEM=1 disables the hints globally; it is read at
    TRACE time, so a dev harness can flip it between two jit builds in one
    process for a within-run whole-model A/B (dev_native_ablate)."""
    import os

    if dim_sem is None or os.environ.get("MONODEPTH_TPU_NO_DIMSEM") == "1":
        return None
    return pltpu.CompilerParams(dimension_semantics=tuple(dim_sem))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, acc_scr, *scratch,
                  s_real: int, scale: float, block_k: int, num_k: int,
                  dv: int, packed_norm: bool):
    """One (q-block, k-block) grid step of online-softmax attention.

    q_ref: [1, BQ, Dk]; k_ref: [1, BK, Dk]; v_ref: [1, BK, Dv_ext] where
    column `dv` of v is a packed ONES column: the PV matmul then produces
    the softmax normalizer sum_k p[q,k] in acc[:, dv] for free (Dv=64 pads
    to the 128-lane MXU tile anyway), eliminating a whole VPU reduction
    pass over the logits — the kernel is VPU-bound on exactly those passes
    at long sequence.  o_ref: [1, BQ, Dv_ext] (caller slices [:dv]).
    Scratch: m [BQ, 128] f32 (lane-replicated running max), acc
    [BQ, Dv_ext] f32 (value accumulator + normalizer column).  k-blocks
    iterate innermost; scratch carries state across them.
    """
    kb = pl.program_id(2)
    l_scr = scratch[0] if scratch else None  # unpacked-normalizer variant

    @pl.when(kb == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_BIG)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        if l_scr is not None:
            l_scr[:] = jnp.zeros_like(l_scr)

    # Softmax in base 2: exp(x) == exp2(x * log2(e)); folding log2(e) into
    # the logits scale makes every softmax elementwise op an exp2 — the
    # cheaper primitive.
    # Matmul inputs stay in the INPUT dtype (bf16 on the perf path) with f32
    # accumulation; softmax statistics (max / accumulator) remain f32.
    # The scale*log2(e) multiply happens on the f32 LOGITS, not on q:
    # pre-scaling bf16 q re-rounds q*c to bf16 (rel ~2^-9), which at
    # unscaled-logit magnitudes (|s|~25 for the spatial block's 4096 keys)
    # perturbs the softmax by ~5e-2 — measured on-chip 2.2x WORSE than the
    # XLA-bf16 baseline.  Post-matmul, the multiply joins the sub/exp2
    # elementwise chain (one VMEM pass either way) and the matmul operands
    # match the XLA baseline bit-for-bit.
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32
    ) * (scale * 1.4426950408889634)  # [BQ, BK] f32, scaled by s*log2(e)

    # Mask keys at/after s_real (sequence padding).
    if num_k * block_k > s_real:
        col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < s_real, s, _NEG_BIG)

    m_prev = m_scr[:, :1]                       # [BQ, 1]
    row_max = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, row_max)        # [BQ, 1]
    p = jnp.exp2(s - m_new)                     # [BQ, BK]
    correction = jnp.exp2(m_prev - m_new)       # [BQ, 1]

    v = v_ref[0]                   # [BK, Dv_ext]; packed: ones column at dv
    pb = p.astype(v.dtype)
    pv = jax.lax.dot_general(
        pb, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32
    )  # [BQ, Dv_ext]; packed variant: normalizer lands in [:, dv]

    acc_scr[:] = acc_scr[:] * correction + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    if l_scr is not None:
        # Dv already a 128-multiple (e.g. spatial attention's 256): a packed
        # ones column would cost a whole extra MXU tile, so the normalizer
        # stays a VPU reduction into its own scratch.
        l_new = l_scr[:, :1] * correction + jnp.sum(p, axis=-1, keepdims=True)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(kb == num_k - 1)
    def _finalize():
        norm = (acc_scr[:, dv:dv + 1] if packed_norm else l_scr[:, :1])
        o_ref[0] = (acc_scr[:] / norm).astype(o_ref.dtype)


def _flash_attention(q, k, v, *, scale: float, block_q: int = 512,
                     block_k: int = 1024, interpret: bool = False,
                     valid_len: int = None, full_kv: bool = None,
                     dim_sem=("parallel", "parallel", "arbitrary")):
    """Generic flash attention: q [G, Sq, Dk], k [G, Sk, Dk], v [G, Sk, Dv].

    Returns [G, Sq, Dv].  G = batch*heads (MHA) or batch (spatial).  Sq and
    Sk may differ (cross-attention / pooled-KV).  Keys at index >= valid_len
    are masked out of the softmax.  full_kv: None = auto (whole-sequence
    K/V when the f32 logits block fits the VMEM heuristic), True/False =
    force; the auto heuristic is right for the ViT's Dv=64 head slices but
    wrong for the spatial block's Dv=256 (see dev_spatial_ablate.py).
    """
    g, s, dk = q.shape
    sk = k.shape[1]
    dv = v.shape[-1]
    if valid_len is None:
        valid_len = sk
    # q rows and k/v columns pad independently to their own block multiples.
    block_q = min(block_q, _round_up(s, 128))
    block_k = min(block_k, _round_up(sk, 128))
    # Whole-sequence K/V when the f32 logits block fits VMEM: num_k=1 keeps
    # K/V resident across the q sweep and cuts grid steps ~num_k-fold
    # (measured 14.1 -> 10.1 ms/layer at 4097 tokens, batch 8).
    sk_full = _round_up(sk, 128)
    if full_kv is None:
        full_kv = block_q * sk_full * 4 <= (9 << 20)
    if full_kv and sk_full > block_k:
        block_k = sk_full
    sq_pad = _round_up(s, block_q)
    sk_pad = _round_up(sk, block_k)
    if sq_pad != s:
        q = jnp.pad(q, [(0, 0), (0, sq_pad - s), (0, 0)])
    if sk_pad != sk:
        k = jnp.pad(k, [(0, 0), (0, sk_pad - sk), (0, 0)])
        v = jnp.pad(v, [(0, 0), (0, sk_pad - sk), (0, 0)])
    num_q = sq_pad // block_q
    num_k = sk_pad // block_k

    # Pack a ones column at index dv of v when the 128-lane padding is FREE
    # (dv=64 pads to one MXU tile anyway): the PV matmul then emits the
    # softmax normalizer alongside the values — see _flash_kernel.  When Dv
    # is already a 128-multiple (spatial attention's 256) the extra tile
    # would cost real MXU/DMA work, so the normalizer stays a VPU sum.
    packed_norm = dv % 128 != 0
    if packed_norm:
        dv_ext = _round_up(dv + 1, 128)
        v = jnp.pad(v, [(0, 0), (0, 0), (0, dv_ext - dv)])
        ones_col = (jnp.arange(dv_ext) == dv).astype(v.dtype)
        v = v + ones_col[None, None, :]
    else:
        dv_ext = dv

    kernel = functools.partial(
        _flash_kernel, s_real=valid_len, scale=scale,
        block_k=block_k, num_k=num_k, dv=dv, packed_norm=packed_norm,
    )
    out = pl.pallas_call(
        kernel,
        grid=(g, num_q, num_k),
        in_specs=[
            pl.BlockSpec((1, block_q, dk), lambda i, j, kb: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dk), lambda i, j, kb: (i, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dv_ext), lambda i, j, kb: (i, kb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dv_ext), lambda i, j, kb: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, sq_pad, dv_ext), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),     # running max
            pltpu.VMEM((block_q, dv_ext), jnp.float32),  # acc (+ packed norm)
        ] + ([] if packed_norm
             else [pltpu.VMEM((block_q, 128), jnp.float32)]),  # normalizer
        compiler_params=_compiler_params(dim_sem),
        interpret=interpret,
    )(q, k, v)
    return out[:, :s, :dv]


def fused_mha(q, k, v, *, num_heads: int, interpret: bool = False,
              valid_len=None, block_q: int = 512, block_k: int = 1024):
    """Multi-head attention over [B, S, D] q/k/v (already projected).

    Equivalent to ops.attention._mha_xla; softmax scale 1/sqrt(head_dim).
    valid_len masks keys beyond that index (pre-padded sequences).
    """
    b, s, dim = q.shape
    hd = dim // num_heads

    def split(x):
        return (x.reshape(b, x.shape[1], num_heads, hd)
                 .transpose(0, 2, 1, 3)
                 .reshape(b * num_heads, x.shape[1], hd))

    scale = float(1.0 / (hd ** 0.5))
    out = _flash_attention(split(q), split(k), split(v), scale=scale,
                           block_q=block_q, block_k=block_k,
                           interpret=interpret,
                           valid_len=valid_len)
    return (out.reshape(b, num_heads, s, hd)
               .transpose(0, 2, 1, 3)
               .reshape(b, s, dim))


def _short_mha_kernel(q_ref, k_ref, v_ref, o_ref, *, heads_per_block: int,
                      head_dim: int, s_real: int, scale: float):
    """Whole-sequence MHA for short sequences, several heads per program.

    Refs are [1, S_pad, heads_per_block * head_dim] slices of the packed
    [B, S_pad, D] q/k/v — the head split happens on the lane dim inside the
    kernel, so no [B, H, S, hd] transpose ever materializes in HBM, and the
    f32 logits/softmax live only in VMEM (the parity path's 208-token
    attention spent ~2.3 ms/call on exactly that HBM traffic at batch 32).
    """
    s_pad = q_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    needs_mask = s_real < s_pad
    for h in range(heads_per_block):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        # base-2 softmax: scale*log2(e) applied to the f32 logits (NOT
        # pre-folded into bf16 q — see _flash_kernel); matmul operands stay
        # in input dtype (bf16 on chip) with f32 accumulation — all-f32 MXU
        # matmuls run at ~1/4 the bf16 rate
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32
                                ) * (scale * 1.4426950408889634)
        if needs_mask:
            s = jnp.where(col < s_real, s, _NEG_BIG)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0, :, sl]
        o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


def fused_mha_short(q, k, v, *, num_heads: int, interpret: bool = False,
                    valid_len=None, heads_per_block: int = 2):
    """Fused MHA for short sequences (S up to ~1024): packed-head layout.

    q, k, v: [B, S, D] (already projected, heads packed on the last dim).
    Each grid program computes `heads_per_block` full heads with the whole
    sequence resident in VMEM — no online softmax needed, no head transpose,
    no HBM logits.  Numerically equivalent to ops.attention._mha_xla.
    """
    b, s, dim = q.shape
    hd = dim // num_heads
    assert num_heads % heads_per_block == 0, (num_heads, heads_per_block)
    assert k.shape[1] == s and v.shape[1] == s, (
        f"fused_mha_short requires equal q/k/v lengths, got q {s}, "
        f"k {k.shape[1]} (use fused_mha for cross-attention)")
    valid_len = s if valid_len is None else valid_len

    s_pad = _round_up(s, 128)
    if s_pad != s:
        pad = [(0, 0), (0, s_pad - s), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    lanes = heads_per_block * hd
    kernel = functools.partial(
        _short_mha_kernel, heads_per_block=heads_per_block, head_dim=hd,
        s_real=valid_len, scale=float(1.0 / (hd ** 0.5)),
    )
    # NOTE: a batched-head variant (one 3-D dot_general over [hpb, S, hd]
    # instead of the per-head loop) was correct in interpret mode but does
    # not compile under this Mosaic version (in-kernel non-minor transpose);
    # the per-head loop stands.
    spec = pl.BlockSpec((1, s_pad, lanes), lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b, num_heads // heads_per_block),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, s_pad, dim), v.dtype),
        compiler_params=_compiler_params(("parallel", "parallel")),
        interpret=interpret,
    )(q, k, v)
    return out[:, :s, :]


def _window_mha_kernel(q_ref, k_ref, v_ref, o_ref, *, heads_per_block: int,
                       head_dim: int, scale: float, window: int,
                       windows_per_block: int):
    """Attention for one ROW of windows x `heads_per_block` heads, read
    directly from the token grid.

    Refs are [1, W, gw*W, heads_per_block * head_dim] row-of-windows tiles
    of the [B, nh, nw, D] grid — a fully CONTIGUOUS slab (whole grid rows),
    so the DMA is dense and the 6-D HBM transpose the XLA path needs
    (to_windows / inverse) never happens.  The kernel loops over the
    `windows_per_block` windows in the row and the heads in its lane slice;
    each window's [W*W, W*W] logits live only in registers/VMEM.
    """
    w = window
    n = w * w
    for wj in range(windows_per_block):
        cols = slice(wj * w, (wj + 1) * w)
        q = q_ref[0, :, cols, :].reshape(n, heads_per_block * head_dim)
        k = k_ref[0, :, cols, :].reshape(n, heads_per_block * head_dim)
        v = v_ref[0, :, cols, :].reshape(n, heads_per_block * head_dim)
        for h in range(heads_per_block):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            # bf16 matmul operands, f32 accumulation; scale*log2(e) applied
            # to the f32 logits, not pre-folded into bf16 q (_flash_kernel)
            qh = q[:, sl]
            kh = k[:, sl]
            s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32
                                    ) * (scale * 1.4426950408889634)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            vh = v[:, sl]
            o = jax.lax.dot_general(p.astype(vh.dtype), vh,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o_ref[0, :, cols, sl] = o.reshape(w, w, head_dim).astype(
                o_ref.dtype)


def fused_window_mha(q, k, v, *, num_heads: int, grid_hw, window: int,
                     interpret: bool = False, heads_per_block: int = 6):
    """ViTDet window-local MHA over grid tokens [B, nh*nw, D] (no CLS).

    Each grid program computes one row of windows x `heads_per_block` heads
    with the tokens read straight out of the [B, nh, nw, D] token grid by
    the BlockSpec (dense contiguous DMA) — no host- or XLA-side window
    transpose, and per-program work is large enough to amortize dispatch
    (the one-window-per-program variant measured 17 us/program against
    ~8 us of compute).  Numerically equivalent to _mha_xla per window.

    heads_per_block sweep on chip (b8, 4096 tokens, window 16):
    hpb 12 -> 2.19 ms, 6 -> 2.05, 4 -> 2.10, 2 -> 2.82; default 6.
    """
    b, s, dim = q.shape
    nh, nw = grid_hw
    assert s == nh * nw, (s, grid_hw)
    assert nh % window == 0 and nw % window == 0, (grid_hw, window)
    hd = dim // num_heads
    heads_per_block = min(heads_per_block, num_heads)
    while num_heads % heads_per_block:
        heads_per_block -= 1
    gh, gw = nh // window, nw // window
    lanes = heads_per_block * hd

    grid4 = lambda x: x.reshape(b, nh, nw, dim)
    spec = pl.BlockSpec((1, window, nw, lanes),
                        lambda bi, wi, hg: (bi, wi, 0, hg),
                        memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _window_mha_kernel, heads_per_block=heads_per_block, head_dim=hd,
        scale=float(1.0 / (hd ** 0.5)), window=window, windows_per_block=gw,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, gh, num_heads // heads_per_block),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, nh, nw, dim), v.dtype),
        compiler_params=_compiler_params(("parallel", "parallel", "parallel")),
        interpret=interpret,
    )(grid4(q), grid4(k), grid4(v))
    return out.reshape(b, s, dim)


def fused_spatial_attention(q, k, v, *, block_q: int = 512,
                            block_k: int = 1024, interpret: bool = False,
                            full_kv: bool = None,
                            dim_sem=("parallel", "parallel", "arbitrary")):
    """Spatial non-local attention: q, k [B, N, Cq], v [B, N, C] -> [B, N, C].

    out_i = sum_j softmax_j(<q_i, k_j>) v_j  (no scaling, matching the
    reference SelfAttentionBlock, enhanced_model.py:24-33).
    """
    n = q.shape[1]
    return _flash_attention(q, k, v, scale=1.0, block_q=block_q,
                            block_k=block_k, interpret=interpret,
                            valid_len=n, full_kv=full_kv, dim_sem=dim_sem)
