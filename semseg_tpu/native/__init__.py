"""ctypes bindings for the native host-preprocessing library.

Build (one-time, also triggered lazily on import):

    g++ -O3 -march=native -shared -fPIC -DSSG_HAVE_JPEG=1 preprocess.cpp \
        -ljpeg -o libssgnative-<cpu-fingerprint>.so

(the -DSSG_HAVE_JPEG/-ljpeg pair is dropped automatically on hosts
without libjpeg — every non-decode entry point still builds).

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
    base = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", tmp]
    # Preferred: with libjpeg decode support. Hosts without jpeglib.h /
    # libjpeg keep every other native entry point (the C++ stubs report
    # ssg_has_jpeg() == 0 and decode falls back to PIL).
    attempts = [base + ["-DSSG_HAVE_JPEG=1", "-ljpeg"], base]
    try:
        for cmd in attempts:
            proc = subprocess.run(cmd, capture_output=True)
            if proc.returncode == 0:
                os.replace(tmp, so)
                return True
        return False
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
    ip = ctypes.POINTER(ctypes.c_int)
    sz = ctypes.c_size_t
    lib.ssg_resize_bilinear_u8.argtypes = [u8p, i, i, i, u8p, i, i, i]
    lib.ssg_resize_nearest_u8.argtypes = [u8p, i, i, i, u8p, i, i, i]
    lib.ssg_normalize_pad.argtypes = [u8p, i, i, f32p, i, i, f32p, f32p]
    lib.ssg_preprocess.argtypes = [u8p, i, i, i, i, i, i, f32p, f32p, f32p, i]
    lib.ssg_jpeg_dims.argtypes = [u8p, sz, i, ip, ip]
    lib.ssg_jpeg_dims.restype = i
    lib.ssg_decode_jpeg.argtypes = [u8p, sz, i, u8p, i, i]
    lib.ssg_decode_jpeg.restype = i
    lib.ssg_jpeg_class.argtypes = [u8p, sz]
    lib.ssg_jpeg_class.restype = i
    lib.ssg_jpeg_meta.argtypes = [u8p, sz, i, ip, ip]
    lib.ssg_jpeg_meta.restype = i
    lib.ssg_has_jpeg.restype = i
    return lib


def available() -> bool:
    return _load() is not None


def _u8(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize_bilinear_u8(src: np.ndarray, size, *, flip: bool = False) -> np.ndarray:
    """Pillow-parity bilinear resize of (H, W[, C]) uint8 to (th, tw).

    ``flip=True`` resizes the horizontally mirrored source (bit-identical
    to ``FLIP_LEFT_RIGHT`` + resize) without materializing the flipped
    copy — the mirror happens inside the horizontal resampling pass.
    """
    lib = _load()
    th, tw = size
    squeeze = src.ndim == 2
    if squeeze:
        src = src[:, :, None]
    src = np.ascontiguousarray(src, np.uint8)
    sh, sw, ch = src.shape
    dst = np.empty((th, tw, ch), np.uint8)
    lib.ssg_resize_bilinear_u8(_u8(src), sh, sw, ch, _u8(dst), th, tw, int(flip))
    return dst[:, :, 0] if squeeze else dst


def resize_nearest_u8(src: np.ndarray, size, *, flip: bool = False) -> np.ndarray:
    lib = _load()
    th, tw = size
    squeeze = src.ndim == 2
    if squeeze:
        src = src[:, :, None]
    src = np.ascontiguousarray(src, np.uint8)
    sh, sw, ch = src.shape
    dst = np.empty((th, tw, ch), np.uint8)
    lib.ssg_resize_nearest_u8(_u8(src), sh, sw, ch, _u8(dst), th, tw, int(flip))
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


def preprocess(src: np.ndarray, target_size, padded_size, mean, std,
               *, flip: bool = False) -> np.ndarray:
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
        _u8(src), sh, sw, th, tw, ph, pw, _f32(mean), _f32(std), _f32(dst),
        int(flip),
    )
    return dst


def jpeg_available() -> bool:
    lib = _load()
    return bool(lib is not None and lib.ssg_has_jpeg())


def decode_jpeg_dims(data: bytes, scale_num: int = 8):
    """(H, W) the decoder would produce for ``scale_num``/8, or None.

    Header-parse only (cheap) — used to pick the smallest covering
    DCT-domain scale before committing to a decode.
    """
    lib = _load()
    if lib is None or not lib.ssg_has_jpeg():
        return None
    buf = np.frombuffer(data, np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.ssg_jpeg_dims(_u8(buf), buf.size, scale_num,
                         ctypes.byref(h), ctypes.byref(w)):
        return None
    return h.value, w.value


def _bomb_guard_ok(h: int, w: int) -> bool:
    """Defer oversized images to the PIL path (returning None does that).

    The native decode would otherwise ``np.empty((h, w, 3))`` straight
    from header-CLAIMED dimensions — a tiny crafted stream declaring
    65500x65500 allocates ~12.8 GB before a single pixel is validated.
    Pillow guards this with ``Image.MAX_IMAGE_PIXELS`` (DecompressionBomb
    warning/error); routing anything past that threshold to PIL keeps its
    policy (including user overrides of the limit) in force.
    """
    try:
        from PIL import Image

        max_px = Image.MAX_IMAGE_PIXELS
    except Exception:
        max_px = 89478485  # Pillow's default limit
    return max_px is None or h * w <= max_px


def decode_jpeg(data: bytes, scale_num: int = 8) -> Optional[np.ndarray]:
    """libjpeg decode of a JPEG byte stream to RGB uint8 (H, W, 3).

    ``scale_num``/8 is the decoder's DCT-domain output scale (8 = full
    resolution; output dims are ``ceil(dim * scale_num / 8)``, exactly
    Pillow's ``Image.draft`` engine). Returns None on any decode problem
    (corrupt stream, exotic color space, no libjpeg at build time) —
    callers fall back to PIL.
    """
    lib = _load()
    if lib is None or not lib.ssg_has_jpeg():
        return None
    buf = np.frombuffer(data, np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.ssg_jpeg_dims(_u8(buf), buf.size, scale_num,
                         ctypes.byref(h), ctypes.byref(w)):
        return None
    if not _bomb_guard_ok(h.value, w.value):
        return None
    dst = np.empty((h.value, w.value, 3), np.uint8)
    if lib.ssg_decode_jpeg(_u8(buf), buf.size, scale_num, _u8(dst),
                           h.value, w.value):
        return None
    return dst


_decode_disabled = False
_trusted_classes: set = set()


def decode_jpeg_verified(data: bytes) -> Optional[np.ndarray]:
    """Full-resolution ``decode_jpeg`` behind a per-decode-class oracle.

    JPEG decode is not bit-exactness-mandated by the spec, and Pillow
    bundles its own libjpeg-turbo which may diverge from the system
    library this module links — *per decode path*: e.g. merged/fancy
    chroma-upsampling SIMD only runs for 4:2:0 sources, so bit-equality
    on one image proves nothing about a 4:4:4 or progressive one. The
    first stream of each decode class (``ssg_jpeg_class``: progressive
    flag x color space x per-component sampling) is decoded with BOTH
    libraries and compared: bit-equal -> that class is trusted for the
    rest of the process; any mismatch anywhere -> native decode is
    permanently disabled (a divergent build is not worth per-class
    hairsplitting). One extra PIL decode per class buys a per-host,
    per-path bit-exactness guarantee instead of an assumption.
    """
    global _decode_disabled
    if _decode_disabled:
        return None
    lib = _load()
    if lib is None or not lib.ssg_has_jpeg():
        return None
    buf = np.frombuffer(data, np.uint8)
    # One combined header parse (class signature + full-res dims), then
    # the decode's own — instead of class + dims + decode parses.
    h = ctypes.c_int()
    w = ctypes.c_int()
    cls = lib.ssg_jpeg_meta(_u8(buf), buf.size, 8,
                            ctypes.byref(h), ctypes.byref(w))
    if cls < 0:
        return None
    if not _bomb_guard_ok(h.value, w.value):
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    if lib.ssg_decode_jpeg(_u8(buf), buf.size, 8, _u8(out),
                           h.value, w.value):
        return None
    if cls not in _trusted_classes:
        import io

        from PIL import Image

        ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        if ref.shape != out.shape or not np.array_equal(ref, out):
            _decode_disabled = True
            return None
        _trusted_classes.add(cls)
    return out
