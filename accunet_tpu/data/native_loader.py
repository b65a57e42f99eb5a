"""ctypes bindings for the native data-pipeline kernels (dataops.cpp).

Compiled on demand with the system g++ (-O3 -march=native) into a cached
shared object; falls back silently to the numpy implementations in
data/dataset.py when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(os.path.dirname(__file__), "native", "dataops.cpp")
    cache_dir = os.environ.get(
        "ACCUNET_NATIVE_CACHE", os.path.join(tempfile.gettempdir(), "accunet_native")
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, "dataops.so")
    try:
        if not os.path.exists(so_path) or os.path.getmtime(so_path) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", so_path],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(so_path)
    except Exception:
        return None

    fp = ctypes.POINTER(ctypes.c_float)
    lib.resize_bilinear_f32.argtypes = [fp, ctypes.c_int, ctypes.c_int, fp, ctypes.c_int, ctypes.c_int]
    lib.resize_nearest_f32.argtypes = [fp, ctypes.c_int, ctypes.c_int, fp, ctypes.c_int, ctypes.c_int]
    lib.standardize_f32.argtypes = [fp, ctypes.c_long]
    lib.binarize_f32.argtypes = [fp, ctypes.c_long]
    _LIB = lib
    return lib


def available() -> bool:
    return _build_and_load() is not None


def _as_fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize2d(img: np.ndarray, size: int, nearest: bool) -> np.ndarray:
    lib = _build_and_load()
    assert lib is not None
    src = np.ascontiguousarray(img, np.float32)
    dst = np.empty((size, size), np.float32)
    fn = lib.resize_nearest_f32 if nearest else lib.resize_bilinear_f32
    fn(_as_fp(src), src.shape[0], src.shape[1], _as_fp(dst), size, size)
    return dst


def standardize(img: np.ndarray) -> np.ndarray:
    lib = _build_and_load()
    assert lib is not None
    out = np.ascontiguousarray(img, np.float32)
    lib.standardize_f32(_as_fp(out), out.size)
    return out


def binarize(mask: np.ndarray) -> np.ndarray:
    lib = _build_and_load()
    assert lib is not None
    out = np.ascontiguousarray(mask, np.float32)
    lib.binarize_f32(_as_fp(out), out.size)
    return out
