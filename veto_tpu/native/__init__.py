"""Native host-ops bindings (ctypes) with lazy compilation.

``host_ops.cpp`` is compiled once per machine into ``libveto_host.so`` next
to this file (g++ -O3 -fopenmp); all entry points degrade gracefully to the
pure-NumPy/PIL implementations in :mod:`veto_tpu.data.transforms` when no
compiler is available, so nothing hard-depends on the native path.

pybind11 is not available in this environment; plain C ABI + ctypes keeps
the binding dependency-free (reference builds its native code through torch
cpp_extension, setup.py:1-72 — not applicable here).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "host_ops.cpp")
_LIB_PATH = os.path.join(_HERE, "libveto_host.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-fopenmp", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.resize_bilinear_f32.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, ctypes.c_int, ctypes.c_int,
        ]
        lib.normalize_bgr255_pad.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int,
            f32p, ctypes.c_int, ctypes.c_int,
            f32p, f32p, ctypes.c_int,
        ]
        lib.standardize_pad.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int,
            f32p, ctypes.c_int, ctypes.c_int,
        ]
        u8p = ctypes.POINTER(ctypes.c_ubyte)
        lib.resize_normalize_u8_pad.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int,
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, f32p, ctypes.c_int,
        ]
        lib.resize_standardize_pad.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int,
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize_bilinear(image: np.ndarray, oh: int, ow: int) -> Optional[np.ndarray]:
    """(H, W, C) float32 → (oh, ow, C) float32, PIL-BILINEAR semantics.
    Returns None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(image, dtype=np.float32)
    h, w, c = src.shape
    dst = np.empty((oh, ow, c), np.float32)
    lib.resize_bilinear_f32(_fptr(src), h, w, c, _fptr(dst), oh, ow)
    return dst


def normalize_bgr255_pad(
    image: np.ndarray, ph: int, pw: int, mean, std, to_bgr255: bool = True
) -> Optional[np.ndarray]:
    """RGB float[0,1] (H, W, 3) → normalized BGR*255 padded to (ph, pw, 3)."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(image, dtype=np.float32)
    h, w, _ = src.shape
    dst = np.empty((ph, pw, 3), np.float32)
    m = np.ascontiguousarray(mean, np.float32)
    s = np.ascontiguousarray(std, np.float32)
    lib.normalize_bgr255_pad(
        _fptr(src), h, w, _fptr(dst), ph, pw, _fptr(m), _fptr(s),
        1 if to_bgr255 else 0,
    )
    return dst


def standardize_pad(depth: np.ndarray, ph: int, pw: int) -> Optional[np.ndarray]:
    """(H, W, 1) float32 → per-image standardized, padded to (ph, pw, 1)."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(depth[..., 0], dtype=np.float32)
    h, w = src.shape
    dst = np.empty((ph, pw), np.float32)
    lib.standardize_pad(_fptr(src), h, w, _fptr(dst), ph, pw)
    return dst[..., None]


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))


def resize_normalize_u8_into(
    image_u8: np.ndarray, oh: int, ow: int, dst: np.ndarray,
    mean, std, to_bgr255: bool = True,
) -> bool:
    """Fused loader fast path: u8 RGB (H, W, 3) → resize (PIL BILINEAR)
    → BGR255-normalize → write into the (ph, pw, 3) float32 ``dst`` slot
    (zero-padded).  Exact vs the [0,1]-float pipeline (resize is linear so
    the /255·x255 pair cancels).  Returns False if the native lib is
    unavailable (caller falls back to the NumPy path)."""
    lib = _load()
    if lib is None:
        return False
    src = np.ascontiguousarray(image_u8, dtype=np.uint8)
    h, w, _ = src.shape
    assert dst.dtype == np.float32 and dst.flags.c_contiguous
    ph, pw, _ = dst.shape
    m = np.ascontiguousarray(mean, np.float32)
    s = np.ascontiguousarray(std, np.float32)
    lib.resize_normalize_u8_pad(
        _u8ptr(src), h, w, _fptr(dst), oh, ow, ph, pw, _fptr(m), _fptr(s),
        1 if to_bgr255 else 0,
    )
    return True


def resize_standardize_into(
    depth: np.ndarray, oh: int, ow: int, dst: np.ndarray,
) -> bool:
    """Fused depth path: (H, W[, 1]) float32 → resize → per-image
    standardize (of the resized map) → (ph, pw[, 1]) ``dst`` slot."""
    lib = _load()
    if lib is None:
        return False
    src = depth[..., 0] if depth.ndim == 3 else depth
    src = np.ascontiguousarray(src, dtype=np.float32)
    h, w = src.shape
    d2 = dst[..., 0] if dst.ndim == 3 else dst
    assert d2.dtype == np.float32 and d2.flags.c_contiguous
    ph, pw = d2.shape
    lib.resize_standardize_pad(_fptr(src), h, w, _fptr(d2), oh, ow, ph, pw)
    return True
