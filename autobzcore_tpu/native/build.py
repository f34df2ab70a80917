"""Lazy g++ build + ctypes binding for the native host kernels."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build(src, out):
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-fopenmp",
        src, "-o", out,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, OSError):
        # retry without OpenMP
        try:
            cmd.remove("-fopenmp")
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            return False


def load_symptr_lib():
    """Return the ctypes handle of the symptr kernel library, or None."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        here = os.path.dirname(__file__)
        src = os.path.join(here, "symptr.cpp")
        out = os.path.join(here, "_symptr.so")
        if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
            if not _build(src, out):
                return None
        try:
            lib = ctypes.CDLL(out)
        except OSError:
            return None
        lib.symptr_canonicalize.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.symptr_canonicalize.restype = None
        _LIB = lib
        return _LIB
