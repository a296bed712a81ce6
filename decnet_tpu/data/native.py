"""ctypes bridge to the native host library (native/libdecnet_native.so).

Provides the C++ detail-mask pipeline and PFM decoder; every entry point has
a pure-Python fallback so the framework runs without the native build
(`make -C native`).
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native",
        "libdecnet_native.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        pf = ctypes.POINTER(ctypes.c_float)
        lib.decnet_detail_masks.argtypes = [
            pf, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.POINTER(pf)]
        lib.decnet_detail_masks_batch.argtypes = [
            pf, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.POINTER(pf),
            ctypes.c_int]
        lib.decnet_decode_pfm.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, pf,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.decnet_decode_pfm.restype = ctypes.c_int
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def _as_float_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def detail_masks(img: np.ndarray, scale: int = 3, levels: int = 3,
                 thold: float = 0.3) -> List[np.ndarray]:
    """C++ detail masks; returns coarsest-first like masks.detail_masks_np."""
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.float32)
    H, W, C = img.shape
    outs = [np.empty((H // scale ** i, W // scale ** i), np.float32)
            for i in range(levels)]
    ptrs = (ctypes.POINTER(ctypes.c_float) * levels)(
        *[_as_float_ptr(o) for o in outs])
    lib.decnet_detail_masks(_as_float_ptr(img), H, W, C, scale, levels,
                            ctypes.c_float(thold), ptrs)
    return outs[::-1]


def detail_masks_batch(imgs: np.ndarray, scale: int = 3, levels: int = 3,
                       thold: float = 0.3, num_threads: int = 0
                       ) -> List[List[np.ndarray]]:
    """Batched threaded masks: imgs (N,H,W,C) -> per-image coarsest-first."""
    lib = _load()
    assert lib is not None
    imgs = np.ascontiguousarray(imgs, np.float32)
    N, H, W, C = imgs.shape
    outs = [[np.empty((H // scale ** i, W // scale ** i), np.float32)
             for i in range(levels)] for _ in range(N)]
    flat = [m for per in outs for m in per]
    ptrs = (ctypes.POINTER(ctypes.c_float) * (N * levels))(
        *[_as_float_ptr(o) for o in flat])
    lib.decnet_detail_masks_batch(_as_float_ptr(imgs), N, H, W, C, scale,
                                  levels, ctypes.c_float(thold), ptrs,
                                  num_threads)
    return [per[::-1] for per in outs]


def decode_pfm(data: bytes, max_pixels: int = 1 << 26) -> np.ndarray:
    """PFM decode via C++; returns (H,W) or (H,W,3) float32."""
    lib = _load()
    assert lib is not None
    buf = np.frombuffer(data, np.uint8)
    out = np.empty(max_pixels, np.float32)
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.decnet_decode_pfm(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        _as_float_ptr(out), ctypes.byref(h), ctypes.byref(w), ctypes.byref(c))
    if rc != 0:
        raise ValueError(f"PFM decode failed rc={rc}")
    n = h.value * w.value * c.value
    arr = out[:n].reshape((h.value, w.value, c.value) if c.value == 3
                          else (h.value, w.value)).copy()
    return arr
