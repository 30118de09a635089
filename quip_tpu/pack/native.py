"""ctypes bindings for the native C++ packing library (native/packlib.cpp).

Auto-builds the shared library on first use (g++ is in the image); every
entry point falls back to the pure-numpy implementation if the toolchain is
unavailable, so the package never hard-depends on the build.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libquippack.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR],
                               check=True, capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        for name, argtypes in (
            ("quip_pack", [ctypes.c_void_p, ctypes.c_void_p,
                           ctypes.c_int64, ctypes.c_int64,
                           ctypes.c_int, ctypes.c_int]),
            ("quip_unpack", [ctypes.c_void_p, ctypes.c_void_p,
                             ctypes.c_int64, ctypes.c_int64,
                             ctypes.c_int, ctypes.c_int]),
            ("quip_dequant_qfnb", [ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_int64, ctypes.c_int64,
                                   ctypes.c_int, ctypes.c_float,
                                   ctypes.c_int]),
        ):
            fn = getattr(lib, name)
            fn.argtypes = argtypes
            fn.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _threads() -> int:
    return min(16, os.cpu_count() or 1)


def pack_np(codes: np.ndarray, bits: int) -> np.ndarray:
    """(m, d) uint8 codes -> (m, d*bits/32) int32, slab-major (identical
    layout to pack/format.py:_pack_plane)."""
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    m, d = codes.shape
    cpw = 32 // bits
    assert d % cpw == 0
    nw = d // cpw
    lib = _load()
    if lib is not None:
        out = np.empty((m, nw), np.uint32)
        rc = lib.quip_pack(codes.ctypes.data, out.ctypes.data, m, d, bits,
                           _threads())
        if rc == 0:
            return out.view(np.int32)
    # numpy fallback
    c = codes.astype(np.uint32).reshape(m, cpw, nw)
    word = np.zeros((m, nw), np.uint32)
    for b in range(cpw):
        word |= c[:, b, :] << (bits * b)
    return word.view(np.int32)


def unpack_np(words: np.ndarray, bits: int, d: int) -> np.ndarray:
    words = np.ascontiguousarray(words).view(np.uint32)
    m = words.shape[0]
    lib = _load()
    if lib is not None:
        out = np.empty((m, d), np.uint8)
        rc = lib.quip_unpack(words.ctypes.data, out.ctypes.data, m, d, bits,
                             _threads())
        if rc == 0:
            return out
    cpw = 32 // bits
    nw = d // cpw
    mask = np.uint32(2**bits - 1)
    slabs = [((words >> np.uint32(bits * b)) & mask).astype(np.uint8)
             for b in range(cpw)]
    return np.concatenate(slabs, axis=1)


def dequant_qfnb_np(words: np.ndarray, bits: int, d: int,
                    scale: float) -> np.ndarray:
    """Packed words -> dense float32 on the qfn-b grid (transcoding path)."""
    words = np.ascontiguousarray(words).view(np.uint32)
    m = words.shape[0]
    lib = _load()
    if lib is not None and bits in (2, 4, 8):
        out = np.empty((m, d), np.float32)
        rc = lib.quip_dequant_qfnb(words.ctypes.data, out.ctypes.data, m, d,
                                   bits, float(scale), _threads())
        if rc == 0:
            return out
    q = unpack_np(words, bits, d).astype(np.float32)
    maxq = float(2**bits - 1)
    return ((q / maxq) * 2 - 1) * scale
