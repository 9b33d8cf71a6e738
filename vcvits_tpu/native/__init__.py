"""ctypes bindings for the C++ host-DSP library (libvcvits_native.so).

Build with `make -C native`. Every function has a NumPy fallback in
vcvits_tpu.dsp; `available()` reports whether the native path is active.
Set VCVITS_NATIVE=0 to force the NumPy fallbacks.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    if os.environ.get("VCVITS_NATIVE", "1") == "0":
        return None
    if _LIB is not None:
        return _LIB
    path = os.environ.get(
        "VCVITS_NATIVE_PATH",
        os.path.join(os.path.dirname(__file__), "libvcvits_native.so"),
    )
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.vn_version.restype = ctypes.c_int
    lib.vn_resample_out_len.restype = ctypes.c_int64
    lib.vn_resample_out_len.argtypes = [ctypes.c_int64, ctypes.c_int, ctypes.c_int]
    lib.vn_resample.restype = ctypes.c_int64
    lib.vn_resample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    lib.vn_pyin_viterbi.restype = None
    lib.vn_pyin_viterbi.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_int32),
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def resample(x: np.ndarray, orig_sr: int, new_sr: int) -> Optional[np.ndarray]:
    """Native polyphase resample; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float32).reshape(-1)
    out_len = lib.vn_resample_out_len(len(x), orig_sr, new_sr)
    out = np.empty(out_len, np.float32)
    got = lib.vn_resample(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x), orig_sr, new_sr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_len,
    )
    return out[:got]


def pyin_viterbi(
    log_obs: np.ndarray, n_bins: int, log_tri: np.ndarray,
    log_stay: float, log_switch: float,
) -> Optional[np.ndarray]:
    """Native banded Viterbi decode; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    log_obs = np.ascontiguousarray(log_obs, dtype=np.float64)
    log_tri = np.ascontiguousarray(log_tri, dtype=np.float64)
    t = log_obs.shape[0]
    states = np.empty(t, np.int32)
    lib.vn_pyin_viterbi(
        log_obs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), t, n_bins,
        len(log_tri),
        log_tri.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        float(log_stay), float(log_switch),
        states.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return states.astype(np.int64)
