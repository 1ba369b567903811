"""ctypes bindings for the native preprocessing library (preprocess.cpp).

The .so builds on first import with g++ (cached next to the source); if the toolchain is
missing the package degrades gracefully to the PIL path (``lib() is None``). Python worker
threads calling into the library drop the GIL for the duration of each call, so host-side
resize scales across cores while the TPU computes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "preprocess.cpp")
_SO = os.path.join(_DIR, "libpreprocess.so")
_lib = None
_tried = False


def lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC, "-lpthread"],
                check=True, capture_output=True,
            )
        _lib = ctypes.CDLL(_SO)
        _lib.resize_lanczos_u8.restype = ctypes.c_int
        _lib.resize_lanczos_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ]
    except Exception:
        _lib = None
    return _lib


def resize_lanczos_u8(src: np.ndarray, out_h: int, out_w: int) -> np.ndarray | None:
    """(H, W, C) uint8 -> (out_h, out_w, C) uint8 via the native Pillow-exact resampler;
    None if the library is unavailable (caller falls back to PIL)."""
    l = lib()
    if l is None:
        return None
    src = np.ascontiguousarray(src, np.uint8)
    h, w, ch = src.shape
    dst = np.empty((out_h, out_w, ch), np.uint8)
    rc = l.resize_lanczos_u8(
        src.ctypes.data_as(ctypes.c_void_p), h, w, ch,
        dst.ctypes.data_as(ctypes.c_void_p), out_h, out_w,
    )
    return dst if rc == 0 else None
