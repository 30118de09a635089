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


def pack_plane_np(codes: np.ndarray, field_bits: int) -> np.ndarray:
    """(m, d) uint8 codes (< 2**field_bits, field_bits in {1,2,4}) ->
    (d*field_bits/32, m) int32 halfword-spread transposed plane (identical
    layout to pack/format.py:_pack_plane)."""
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    m, d = codes.shape
    fph = 16 // field_bits
    cpw = 2 * fph
    assert d % cpw == 0
    nw = d // cpw
    lib = _load()
    if lib is not None:
        out = np.empty((nw, m), np.uint32)
        rc = lib.quip_pack(codes.ctypes.data, out.ctypes.data, m, d,
                           field_bits, _threads())
        if rc == 0:
            return out.view(np.int32)
    # numpy fallback: fan-in column c = k*(2*nw) + 2*j + h -> axes (k, j, h)
    c = codes.astype(np.uint32).T.reshape(fph, nw, 2, m)
    word = np.zeros((nw, m), np.uint32)
    for k in range(fph):
        for h in range(2):
            word |= c[k, :, h, :] << (16 * h + field_bits * k)
    return word.view(np.int32)


def unpack_plane_np(words: np.ndarray, field_bits: int, d: int) -> np.ndarray:
    words = np.ascontiguousarray(words).view(np.uint32)
    nw, m = words.shape
    lib = _load()
    if lib is not None:
        out = np.empty((m, d), np.uint8)
        rc = lib.quip_unpack(words.ctypes.data, out.ctypes.data, m, d,
                             field_bits, _threads())
        if rc == 0:
            return out
    fph = 16 // field_bits
    mask = np.uint32(2**field_bits - 1)
    c = np.stack(
        [np.stack([(words >> np.uint32(16 * h + field_bits * k)) & mask
                   for h in range(2)], axis=1)
         for k in range(fph)], axis=0)            # (fph, nw, 2, m)
    return c.reshape(d, m).T.astype(np.uint8)


def _plane_splits(bits: int):
    from quip_tpu.pack.format import PLANE_SPLITS
    return PLANE_SPLITS[bits]


def pack_np(codes: np.ndarray, bits: int):
    """(m, d) uint8 codes -> tuple of int32 planes, mirroring
    pack/format.py:pack_codes (composite widths split across planes)."""
    planes = []
    shift = 0
    for field_bits, _ in _plane_splits(bits):
        part = (codes >> shift) & ((1 << field_bits) - 1)
        planes.append(pack_plane_np(part.astype(np.uint8), field_bits))
        shift += field_bits
    return tuple(planes)


def unpack_np(planes, bits: int, d: int) -> np.ndarray:
    out = None
    shift = 0
    for plane, (field_bits, _) in zip(planes, _plane_splits(bits)):
        part = unpack_plane_np(plane, field_bits, d).astype(np.uint8)
        out = part << shift if out is None else out | (part << shift)
        shift += field_bits
    return out


def dequant_qfnb_np(planes, bits: int, d: int, scale: float) -> np.ndarray:
    """Packed planes -> dense float32 on the qfn-b grid (transcoding path)."""
    lib = _load()
    if lib is not None and bits in (2, 4):
        words = np.ascontiguousarray(planes[0]).view(np.uint32)
        m = words.shape[1]
        out = np.empty((m, d), np.float32)
        rc = lib.quip_dequant_qfnb(words.ctypes.data, out.ctypes.data, m, d,
                                   bits, float(scale), _threads())
        if rc == 0:
            return out
    q = unpack_np(planes, bits, d).astype(np.float32)
    maxq = float(2**bits - 1)
    return ((q / maxq) * 2 - 1) * scale
