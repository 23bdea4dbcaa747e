"""Build + load the native pts loader (lazy, cached, with fallback).

Compiles ``pts_loader.cpp`` to a shared library next to the source the
first time it is needed (g++ -O3; ~1 s), then loads it via ctypes. If no
toolchain is available the caller falls back to the numpy path —
the native loader is an accelerator, not a dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "pts_loader.cpp")
# The lib lives in a non-package subdir so package walkers do not
# mistake it for a CPython extension module.
_LIB = os.path.join(_DIR, "_cache", "libptsloader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _compile() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-pthread", "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded library, building it on first use; None if unavailable."""
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        os.makedirs(os.path.dirname(_LIB), exist_ok=True)
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _compile():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _failed = True
            return None
        lib.parse_pts_file.restype = ctypes.c_int
        lib.parse_pts_file.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.parse_seg_file.restype = ctypes.c_int
        lib.parse_seg_file.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        lib.load_shapes.restype = ctypes.c_int
        lib.load_shapes.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        _lib = lib
        return _lib
