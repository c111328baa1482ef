"""Native (C++) host-side data-path kernels with transparent numpy fallback.

Builds codec.cpp on first use (g++ -O3 -shared) and binds it via ctypes —
no pybind11 dependency. If the toolchain is unavailable the numpy paths in
utils/seg.py / data/common.py are used instead.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libsahs_codec.so")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> bool:
    src = os.path.join(_HERE, "codec.cpp")
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.palette_to_labels.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        lib.labels_to_onehot.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        lib.labels_to_colors_bgr.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def palette_to_labels(bgr: np.ndarray) -> Optional[np.ndarray]:
    """(H, W, 3) uint8 BGR-read parse map -> (H, W) uint8 labels, or None
    if the native lib is unavailable (caller falls back to numpy)."""
    lib = get_lib()
    if lib is None:
        return None
    bgr = np.ascontiguousarray(bgr, dtype=np.uint8)
    h, w = bgr.shape[:2]
    out = np.empty((h * w,), np.uint8)
    lib.palette_to_labels(bgr.ctypes.data, h * w, out.ctypes.data)
    return out.reshape(h, w)


def labels_to_onehot(labels: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    labels = np.ascontiguousarray(labels, dtype=np.uint8)
    out = np.empty(labels.shape + (12,), np.float32)
    lib.labels_to_onehot(labels.ctypes.data, labels.size, out.ctypes.data)
    return out
