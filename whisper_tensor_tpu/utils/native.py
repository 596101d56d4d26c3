"""ctypes bindings for the native C++ module (native/libwtc.so).

Auto-builds with `make -C native` on first use when a toolchain is
available; every caller has a pure-numpy fallback, so the native module
is a pure accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from ..packed_format import PackedFormat

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libwtc.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_DEQUANT_FNS = {
    PackedFormat.Q4_0: "wtc_dequant_q4_0",
    PackedFormat.Q4_1: "wtc_dequant_q4_1",
    PackedFormat.Q5_0: "wtc_dequant_q5_0",
    PackedFormat.Q5_1: "wtc_dequant_q5_1",
    PackedFormat.Q8_0: "wtc_dequant_q8_0",
    PackedFormat.Q8_1: "wtc_dequant_q8_1",
    PackedFormat.Q4_K: "wtc_dequant_q4_k",
    PackedFormat.Q6_K: "wtc_dequant_q6_k",
    PackedFormat.Q8_K: "wtc_dequant_q8_k",
}


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("WT_NO_NATIVE"):
            return None
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        for name in list(_DEQUANT_FNS.values()):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int
            fn.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                           ctypes.POINTER(ctypes.c_float)]
        lib.wtc_quantize_int8.restype = ctypes.c_int
        lib.wtc_quantize_int8.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_float)]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def native_dequantize(data: bytes, fmt: PackedFormat,
                      n_elements: int) -> Optional[np.ndarray]:
    """C++ block dequant; None when the lib or format isn't available."""
    lib = _load()
    if lib is None or fmt not in _DEQUANT_FNS:
        return None
    nblocks = n_elements // fmt.block_size
    out = np.empty(n_elements, dtype=np.float32)
    fn = getattr(lib, _DEQUANT_FNS[fmt])
    rc = fn(data, nblocks, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out if rc == 0 else None


def native_quantize_int8(w: np.ndarray) -> Optional[tuple]:
    lib = _load()
    if lib is None:
        return None
    w = np.ascontiguousarray(w, dtype=np.float32)
    K, N = w.shape
    q = np.empty((K, N), dtype=np.int8)
    s = np.empty(N, dtype=np.float32)
    rc = lib.wtc_quantize_int8(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), K, N,
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return (q, s) if rc == 0 else None
