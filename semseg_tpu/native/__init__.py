"""ctypes bindings for the native host-preprocessing library.

Build (one-time, also triggered lazily on import):

    g++ -O3 -march=native -shared -fPIC preprocess.cpp -o libssgnative-<cpu-fingerprint>.so

All entry points release the GIL (plain ctypes calls), so the threaded
loaders scale across cores. Every function has a PIL/numpy fallback —
``available()`` reports whether the native path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "preprocess.cpp")

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False
_load_lock = threading.Lock()


def _so_path() -> str:
    # -march=native tunes the binary to THIS host's ISA extensions; a
    # working dir migrating to a weaker host would load the stale .so and
    # SIGILL inside a loader thread. Namespace the artifact by the same
    # CPU-flags fingerprint the XLA cache dir uses (compile_cache.py).
    from semseg_tpu.utils.compile_cache import host_fingerprint

    return os.path.join(_DIR, f"libssgnative-{host_fingerprint()}.so")


def _build(so: str) -> bool:
    # Compile to a unique temp name and rename: concurrent PROCESSES both
    # missing the cache must not interleave writes into one output file
    # (threads are already serialized by _load_lock).
    fd, tmp = tempfile.mkstemp(prefix="libssgnative.", suffix=".so", dir=_DIR)
    os.close(fd)
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", tmp],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, so)
        return True
    except Exception:
        return False
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    with _load_lock:
        if _lib is not None or _load_attempted:
            return _lib
        lib = _load_locked()
        # Cache failure too: available() runs once per batch per loader
        # worker, and a host where the build fails must not pay a fresh
        # g++ subprocess (seconds) on every call.
        _lib = lib
        _load_attempted = True
        return _lib


def _load_locked() -> Optional[ctypes.CDLL]:
    so = _so_path()
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(_SRC):
        if not _build(so):
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None

    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i = ctypes.c_int
    lib.ssg_resize_bilinear_u8.argtypes = [u8p, i, i, i, u8p, i, i]
    lib.ssg_resize_nearest_u8.argtypes = [u8p, i, i, i, u8p, i, i]
    lib.ssg_normalize_pad.argtypes = [u8p, i, i, f32p, i, i, f32p, f32p]
    lib.ssg_preprocess.argtypes = [u8p, i, i, i, i, i, i, f32p, f32p, f32p]
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
