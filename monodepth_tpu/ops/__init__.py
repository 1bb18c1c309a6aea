"""TPU-native image / tensor ops.

`monodepth_tpu.ops.resize` provides bilinear / nearest resizes with *exact*
PyTorch `F.interpolate` semantics (both `align_corners` modes) — the reference
mixes both (decoder upsample uses align_corners=True, final output resizes use
False; reference decoder.py:120 vs model.py:99), so faithful resampling is a
core numeric requirement.
"""

from monodepth_tpu.ops.resize import (  # noqa: F401
    resize_bilinear,
    resize_nearest,
    upsample2x_nearest,
)
