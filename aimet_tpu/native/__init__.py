"""Native host-side calibration library (C++ via ctypes).

Built lazily with g++ the first time it is imported (cached in _build/).
``available()`` gates usage so the pure-Python path always works.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "encoding_search.cpp")
_BUILD_DIR = os.path.join(_HERE, "_build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libaimet_host.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False

PDF_SIZE = 512


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
           "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src_mtime = os.path.getmtime(_SRC)
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < src_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    dp = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.aimet_sqnr_search.argtypes = [dp, dp, ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_int, dp]
    lib.aimet_sqnr_search_batch.argtypes = [dp, dp, ctypes.c_int, ctypes.c_int,
                                            ctypes.c_int, ctypes.c_int,
                                            ctypes.c_int, dp]
    lib.aimet_percentile_range.argtypes = [dp, dp, ctypes.c_double, dp]
    lib.aimet_mse_search.argtypes = [dp, dp, ctypes.c_int, ctypes.c_int,
                                     ctypes.c_int, ctypes.c_int, dp]
    lib.aimet_version.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def sqnr_search(xleft: np.ndarray, pdf: np.ndarray, bitwidth: int,
                symmetric: bool, strict_symmetric: bool = False,
                unsigned_symmetric: bool = False
                ) -> Tuple[float, float, float, float]:
    """Returns (min, max, delta, offset)."""
    lib = _load()
    assert lib is not None
    out = np.zeros(4)
    lib.aimet_sqnr_search(
        np.ascontiguousarray(xleft, np.float64),
        np.ascontiguousarray(pdf, np.float64),
        bitwidth, int(symmetric), int(strict_symmetric),
        int(unsigned_symmetric), out)
    return tuple(out)


def sqnr_search_batch(xleft: np.ndarray, pdf: np.ndarray, bitwidth: int,
                      symmetric: bool, strict_symmetric: bool = False,
                      unsigned_symmetric: bool = False) -> np.ndarray:
    """xleft/pdf (n, 512) -> (n, 4) of (min, max, delta, offset)."""
    lib = _load()
    assert lib is not None
    n = xleft.shape[0]
    out = np.zeros((n, 4))
    lib.aimet_sqnr_search_batch(
        np.ascontiguousarray(xleft, np.float64),
        np.ascontiguousarray(pdf, np.float64),
        n, bitwidth, int(symmetric), int(strict_symmetric),
        int(unsigned_symmetric), out)
    return out


def percentile_range(xleft: np.ndarray, pdf: np.ndarray,
                     percentile: float) -> Tuple[float, float]:
    lib = _load()
    assert lib is not None
    out = np.zeros(2)
    lib.aimet_percentile_range(
        np.ascontiguousarray(xleft, np.float64),
        np.ascontiguousarray(pdf, np.float64), percentile, out)
    return float(out[0]), float(out[1])


def mse_search(xleft: np.ndarray, pdf: np.ndarray, bitwidth: int,
               symmetric: bool, strict_symmetric: bool = False,
               unsigned_symmetric: bool = False) -> Tuple[float, float]:
    lib = _load()
    assert lib is not None
    out = np.zeros(2)
    lib.aimet_mse_search(
        np.ascontiguousarray(xleft, np.float64),
        np.ascontiguousarray(pdf, np.float64),
        bitwidth, int(symmetric), int(strict_symmetric),
        int(unsigned_symmetric), out)
    return float(out[0]), float(out[1])
