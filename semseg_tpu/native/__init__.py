"""ctypes bindings for the native host-preprocessing library.

Build (one-time, also triggered lazily on import):

    g++ -O3 -march=native -shared -fPIC preprocess.cpp -o libssgnative.so

All entry points release the GIL (plain ctypes calls), so the threaded
loaders scale across cores. Every function has a PIL/numpy fallback —
``available()`` reports whether the native path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libssgnative.so")
_SRC = os.path.join(_DIR, "preprocess.cpp")

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i = ctypes.c_int
    lib.ssg_resize_bilinear_u8.argtypes = [u8p, i, i, i, u8p, i, i]
    lib.ssg_resize_nearest_u8.argtypes = [u8p, i, i, i, u8p, i, i]
    lib.ssg_normalize_pad.argtypes = [u8p, i, i, f32p, i, i, f32p, f32p]
    lib.ssg_preprocess.argtypes = [u8p, i, i, i, i, i, i, f32p, f32p, f32p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _u8(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize_bilinear_u8(src: np.ndarray, size) -> np.ndarray:
    """Pillow-parity bilinear resize of (H, W[, C]) uint8 to (th, tw)."""
    lib = _load()
    th, tw = size
    squeeze = src.ndim == 2
    if squeeze:
        src = src[:, :, None]
    src = np.ascontiguousarray(src, np.uint8)
    sh, sw, ch = src.shape
    dst = np.empty((th, tw, ch), np.uint8)
    lib.ssg_resize_bilinear_u8(_u8(src), sh, sw, ch, _u8(dst), th, tw)
    return dst[:, :, 0] if squeeze else dst


def resize_nearest_u8(src: np.ndarray, size) -> np.ndarray:
    lib = _load()
    th, tw = size
    squeeze = src.ndim == 2
    if squeeze:
        src = src[:, :, None]
    src = np.ascontiguousarray(src, np.uint8)
    sh, sw, ch = src.shape
    dst = np.empty((th, tw, ch), np.uint8)
    lib.ssg_resize_nearest_u8(_u8(src), sh, sw, ch, _u8(dst), th, tw)
    return dst[:, :, 0] if squeeze else dst


def normalize_pad(src: np.ndarray, padded_size, mean, std) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(src, np.uint8)
    h, w, _ = src.shape
    ph, pw = padded_size
    dst = np.empty((ph, pw, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib.ssg_normalize_pad(_u8(src), h, w, _f32(dst), ph, pw, _f32(mean), _f32(std))
    return dst


def preprocess(src: np.ndarray, target_size, padded_size, mean, std) -> np.ndarray:
    """Fused resize + normalize + pad: uint8 (H, W, 3) -> f32 (ph, pw, 3)."""
    lib = _load()
    src = np.ascontiguousarray(src, np.uint8)
    sh, sw, _ = src.shape
    th, tw = target_size
    ph, pw = padded_size
    dst = np.empty((ph, pw, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib.ssg_preprocess(
        _u8(src), sh, sw, th, tw, ph, pw, _f32(mean), _f32(std), _f32(dst)
    )
    return dst
