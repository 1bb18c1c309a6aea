"""Pallas TPU kernels for the hot ops (fused attention, fused resize+conv).

Each kernel has a jnp reference implementation in `monodepth_tpu.ops` used for
validation (interpret mode on CPU) and as the non-TPU fallback.
"""
