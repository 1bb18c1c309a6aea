"""ctypes bindings for the C++ host-side runtime (native/monodepth_native.cpp).

Provides fast host preprocessing (bilinear resize, fused normalize, Mars
augmentation) and binary PLY serialization.  The library is built on demand
with the bundled Makefile (g++); every entry point has a pure-numpy fallback,
so the framework works without a compiler — the native path is an
optimization, not a requirement.

Use `available()` to check, `resize_bilinear_u8` / `normalize_u8` /
`mars_augment_` / `write_ply` as the API.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libmonodepth_native.so")
_SRC_DIR = os.path.join(os.path.dirname(__file__), os.pardir, os.pardir, "native")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.abspath(_SRC_DIR)
    if not os.path.exists(os.path.join(src, "Makefile")):
        return False
    try:
        subprocess.run(["make", "-C", src], check=True, capture_output=True,
                       timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.md_resize_bilinear_u8.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        u8p, ctypes.c_int, ctypes.c_int,
    ]
    lib.md_normalize_u8_f32.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, f32p, f32p, f32p,
    ]
    lib.md_mars_augment_f32.argtypes = [f32p, ctypes.c_int, ctypes.c_uint64]
    lib.md_write_ply.argtypes = [
        ctypes.c_char_p, f32p, u8p, ctypes.c_int64,
    ]
    lib.md_write_ply.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def resize_bilinear_u8(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """uint8 [H, W, C] -> uint8 [out_h, out_w, C], PyTorch bilinear convention."""
    lib = _load()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if lib is None:
        # numpy fallback via the jnp-free tap formulation
        from monodepth_tpu.ops.resize import _linear_index_weights

        ylo, yhi, wy = _linear_index_weights(h, out_h, False)
        xlo, xhi, wx = _linear_index_weights(w, out_w, False)
        f = img.astype(np.float32)
        rows = f[ylo] * (1 - wy)[:, None, None] + f[yhi] * wy[:, None, None]
        out = (rows[:, xlo] * (1 - wx)[None, :, None]
               + rows[:, xhi] * wx[None, :, None])
        return (out + 0.5).astype(np.uint8)
    out = np.empty((out_h, out_w, c), dtype=np.uint8)
    lib.md_resize_bilinear_u8(_ptr(img, ctypes.c_uint8), h, w, c,
                              _ptr(out, ctypes.c_uint8), out_h, out_w)
    return out


def normalize_u8(img: np.ndarray, mean: np.ndarray, std: np.ndarray) -> np.ndarray:
    """uint8 [H, W, C] -> float32 (x/255 - mean) / std."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    mean = np.ascontiguousarray(mean, dtype=np.float32)
    std = np.ascontiguousarray(std, dtype=np.float32)
    lib = _load()
    if lib is None:
        return (img.astype(np.float32) / 255.0 - mean) / std
    h, w, c = img.shape
    out = np.empty((h, w, c), dtype=np.float32)
    lib.md_normalize_u8_f32(_ptr(img, ctypes.c_uint8), h * w, c,
                            _ptr(mean, ctypes.c_float), _ptr(std, ctypes.c_float),
                            _ptr(out, ctypes.c_float))
    return out


def mars_augment_(img: np.ndarray, seed: int) -> np.ndarray:
    """In-place Mars photometric augmentation on float32 [0,1] [H, W, 3]."""
    assert img.dtype == np.float32 and img.flags["C_CONTIGUOUS"]
    lib = _load()
    if lib is None:
        from monodepth_tpu.data.synthetic import mars_style_augment

        img[:] = mars_style_augment(img, np.random.default_rng(seed))
        return img
    lib.md_mars_augment_f32(_ptr(img, ctypes.c_float), img.shape[0] * img.shape[1],
                            ctypes.c_uint64(seed).value or 1)
    return img


def write_ply(path: str, points: np.ndarray,
              colors: Optional[np.ndarray] = None) -> str:
    """Binary PLY writer (float32 xyz + optional uint8 rgb)."""
    points = np.ascontiguousarray(points, dtype=np.float32)
    rgb = None
    if colors is not None:
        c = np.asarray(colors)
        if c.dtype != np.uint8:
            c = c.astype(np.float64)
            if c.max() <= 1.0:
                c = c * 255
            c = c.astype(np.uint8)
        rgb = np.ascontiguousarray(c[:, :3])
    lib = _load()
    if lib is None:
        from monodepth_tpu.utils.terrain import TerrainReconstructor

        return TerrainReconstructor.save_point_cloud(points, rgb, path)
    rc = lib.md_write_ply(
        path.encode(), _ptr(points, ctypes.c_float),
        _ptr(rgb, ctypes.c_uint8) if rgb is not None else None,
        len(points),
    )
    if rc != 0:
        raise IOError(f"md_write_ply failed with code {rc} for {path}")
    return path
