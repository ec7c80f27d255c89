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
_SRC_SCHED = os.path.join(_HERE, "src", "scheduler.cpp")
_BUILD_DIR = os.path.join(_HERE, "_build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libaimet_host.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False

PDF_SIZE = 512


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, _SRC_SCHED,
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
    src_mtime = max(os.path.getmtime(_SRC), os.path.getmtime(_SRC_SCHED))
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
    # continuous-batching scheduler (src/scheduler.cpp)
    ip = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.cb_create.restype = ctypes.c_void_p
    lib.cb_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.cb_destroy.argtypes = [ctypes.c_void_p]
    lib.cb_submit.restype = ctypes.c_int64
    lib.cb_submit.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                              ctypes.c_int]
    lib.cb_admit.argtypes = [ctypes.c_void_p,
                             ctypes.POINTER(ctypes.c_int64)]
    lib.cb_start.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.cb_record.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.cb_active.argtypes = [ctypes.c_void_p]
    lib.cb_pending.argtypes = [ctypes.c_void_p]
    lib.cb_active_slots.argtypes = [ctypes.c_void_p, ip]
    lib.cb_decode_state.argtypes = [ctypes.c_void_p, ip, ip]
    lib.cb_decode_state.restype = None
    lib.cb_request_done.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.cb_request_generated.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.cb_evict.argtypes = [ctypes.c_void_p, ctypes.c_int64]
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


class NativeScheduler:
    """ctypes wrapper over the C++ continuous-batching scheduler
    (src/scheduler.cpp): admission queue, slot lifecycle, termination."""

    def __init__(self, num_slots: int, max_len: int):
        lib = _load()
        assert lib is not None, "native library unavailable"
        self._lib = lib
        self._h = ctypes.c_void_p(lib.cb_create(num_slots, max_len))
        self.num_slots = num_slots

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.cb_destroy(h)
            self._h = None

    def submit(self, prompt_len: int, max_new_tokens: int,
               eos_id: Optional[int]) -> int:
        return int(self._lib.cb_submit(
            self._h, prompt_len, max_new_tokens,
            -1 if eos_id is None else eos_id))

    def admit(self) -> Tuple[int, Optional[int]]:
        """(slot, uid) for the next admitted request, or (-1, None)."""
        uid = ctypes.c_int64(-1)
        slot = int(self._lib.cb_admit(self._h, ctypes.byref(uid)))
        return slot, (int(uid.value) if slot >= 0 else None)

    def start(self, slot: int, first_token: int) -> bool:
        r = self._lib.cb_start(self._h, slot, first_token)
        if r < 0:
            raise RuntimeError(f"scheduler: slot {slot} has no request")
        return bool(r)

    def record(self, slot: int, token: int) -> bool:
        r = self._lib.cb_record(self._h, slot, token)
        if r < 0:
            raise RuntimeError(f"scheduler: slot {slot} has no request")
        return bool(r)

    @property
    def num_active(self) -> int:
        return int(self._lib.cb_active(self._h))

    @property
    def num_pending(self) -> int:
        return int(self._lib.cb_pending(self._h))

    def active_slots(self):
        out = np.zeros(self.num_slots, np.int32)
        n = int(self._lib.cb_active_slots(self._h, out))
        return out[:n].tolist()

    def decode_state(self):
        """(last_tokens, positions) int32 arrays over all slots."""
        toks = np.zeros(self.num_slots, np.int32)
        pos = np.zeros(self.num_slots, np.int32)
        self._lib.cb_decode_state(self._h, toks, pos)
        return toks, pos

    def request_done(self, uid: int) -> bool:
        return self._lib.cb_request_done(self._h, uid) == 1

    def request_generated(self, uid: int) -> int:
        return int(self._lib.cb_request_generated(self._h, uid))

    def evict(self, uid: int) -> bool:
        """Drop a finished request's record (call after consuming its
        output; keeps long-running servers bounded)."""
        return self._lib.cb_evict(self._h, uid) == 1
