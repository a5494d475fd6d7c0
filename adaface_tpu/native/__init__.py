"""ctypes bindings for the native host image-pipeline library.

`imgops.cpp` implements the per-item CPU work of the training data loader
(NEAREST resize, flip, scale-into-canvas, roll shift, normalize) as a C
library; `load_imgops()` compiles it on first use (g++ is in the image)
and the data pipeline falls back to the numpy/PIL path when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _build(so_path: str) -> bool:
    src = os.path.join(os.path.dirname(__file__), "imgops.cpp")
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", so_path, src],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load_imgops():
    """→ ctypes lib with typed signatures, or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so_path = os.path.join(os.path.dirname(__file__), "libimgops.so")
    if not os.path.exists(so_path) and not _build(so_path):
        return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i = ctypes.c_int
    lib.resize_nearest_u8.argtypes = [u8p, i, i, i, u8p, i, i]
    lib.hflip_u8.argtypes = [u8p, i, i, i]
    lib.roll_u8.argtypes = [u8p, u8p, i, i, i, i, i]
    lib.normalize_to_pm1.argtypes = [u8p, f32p, ctypes.c_int64]
    lib.prepare_item.argtypes = [u8p, i, i, u8p, i, i, i, i, i, i,
                                 f32p, f32p, f32p, u8p]
    lib.prepare_item.restype = i
    _LIB = lib
    return _LIB


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def prepare_item_native(
    image: np.ndarray,  # [H, W, 3] uint8
    fg_mask: np.ndarray | None,  # [H, W] uint8 (0/255) or None
    out_size: int,
    do_flip: bool,
    scale: float,  # <1 shrinks into canvas; >=1 no scaling
    dy: int,
    dx: int,
):
    """→ (image [S,S,3] f32 in [-1,1], fg_mask [S,S] f32, aug_mask [S,S])
    or None when the native lib is unavailable."""
    lib = load_imgops()
    if lib is None:
        return None
    image = np.ascontiguousarray(image, np.uint8)
    if fg_mask is not None:
        fg_mask = np.ascontiguousarray(fg_mask, np.uint8)
    s = out_size
    out_img = np.empty((s, s, 3), np.float32)
    out_fg = np.empty((s, s), np.float32)
    out_aug = np.empty((s, s), np.float32)
    scratch = np.empty((3 * s * s * 3,), np.uint8)
    num, den = (max(int(round(scale * 1000)), 1), 1000) if scale < 1 else (1, 1)
    rc = lib.prepare_item(
        _u8(image), image.shape[0], image.shape[1],
        _u8(fg_mask) if fg_mask is not None else None,
        s, int(do_flip), num, den, int(dy), int(dx),
        _f32(out_img), _f32(out_fg), _f32(out_aug), _u8(scratch))
    if rc != 0:
        return None
    return out_img, out_fg, out_aug
