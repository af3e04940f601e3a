"""ctypes binding to the native host-DSP core (native/libqpdsp.so).

The library is optional: `available()` reports whether it was found/built,
and callers (dsp/mlsa.py) fall back to the JAX scan implementation when it
is not.  Build with `make -C native`.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native",
        "libqpdsp.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.environ.get("QPDSP_LIB", _lib_path())
    if not os.path.exists(path):
        # try building it once if the toolchain is around
        makefile = os.path.join(os.path.dirname(path), "Makefile")
        if os.path.exists(makefile):
            os.system(f"make -s -C {os.path.dirname(path)} > /dev/null 2>&1")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        # wrong arch / partial build — fall back to the JAX path
        return None
    lib.qpdsp_mlsa_filter.restype = ctypes.c_int
    lib.qpdsp_mlsa_filter.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.c_int, ctypes.c_double, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double)]
    lib.qpdsp_fir.restype = None
    lib.qpdsp_fir.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double)]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _as_c(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def mlsa_filter(x: np.ndarray, b_frames: np.ndarray, alpha: float,
                hopsize: int, pd: int = 4) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("libqpdsp.so not available")
    x = np.ascontiguousarray(x, np.float64)
    b = np.ascontiguousarray(b_frames, np.float64)
    out = np.empty_like(x)
    rc = lib.qpdsp_mlsa_filter(
        _as_c(x), x.shape[0], _as_c(b), b.shape[0], b.shape[1],
        float(alpha), int(hopsize), int(pd), _as_c(out))
    if rc != 0:
        raise RuntimeError(f"qpdsp_mlsa_filter failed (rc={rc})")
    return out


def fir(x: np.ndarray, taps: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("libqpdsp.so not available")
    x = np.ascontiguousarray(x, np.float64)
    taps = np.ascontiguousarray(taps, np.float64)
    out = np.empty_like(x)
    lib.qpdsp_fir(_as_c(x), x.shape[0], _as_c(taps), taps.shape[0],
                  _as_c(out))
    return out
