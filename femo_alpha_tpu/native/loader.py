"""Lazy ctypes build/load of the native meshops library."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "meshops.cpp")
_OUT = os.path.join(os.path.dirname(__file__), "libmeshops.so")


def _build():
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _OUT,
    ]
    subprocess.run(cmd, check=True, capture_output=True, timeout=240)


def get_lib():
    """Returns the loaded ctypes library or None (fallback to numpy)."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            if not os.path.exists(_OUT) or (
                os.path.getmtime(_OUT) < os.path.getmtime(_SRC)
            ):
                _build()
            lib = ctypes.CDLL(_OUT)
            i32p = ctypes.POINTER(ctypes.c_int32)
            lib.build_edges.restype = ctypes.c_int64
            lib.build_edges.argtypes = [
                i32p, ctypes.c_int64, ctypes.c_int32, i32p, ctypes.c_int32,
                i32p, i32p, i32p,
            ]
            lib.build_csr_pattern.restype = ctypes.c_int64
            lib.build_csr_pattern.argtypes = [
                i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int64,
                i32p, i32p, i32p, i32p,
            ]
            lib.rcm_order.restype = None
            lib.rcm_order.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64,
                                      i32p]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def native_available():
    return get_lib() is not None
