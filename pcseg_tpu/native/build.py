"""On-demand build + ctypes binding of the native host library.

Compiles ``collate.cpp`` into ``libcollate.so`` next to the source the
first time it is needed (or when the source is newer than the binary), via
the baked-in g++. No pybind11 — plain C ABI + ctypes, so there is nothing
to install. Falls back gracefully: ``load_native()`` returns None if no
compiler is available and callers keep their pure-numpy paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "collate.cpp")
_LIB = os.path.join(_HERE, "libcollate.so")
_lock = threading.Lock()
_cached = None
_failed = False


def _compile() -> bool:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, text=True, timeout=120
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def load_native():
    """Return the loaded CDLL with typed signatures, or None."""
    global _cached, _failed
    with _lock:
        if _cached is not None:
            return _cached
        if _failed:
            return None
        stale = (
            not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        )
        if stale and not _compile():
            _failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _failed = True
            return None
        c_f32p = ctypes.POINTER(ctypes.c_float)
        c_i64p = ctypes.POINTER(ctypes.c_int64)
        c_i32p = ctypes.POINTER(ctypes.c_int32)
        c_u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.pack_batch.restype = ctypes.c_int32
        lib.pack_batch.argtypes = [
            c_f32p, c_i64p, c_i32p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            c_f32p, c_i64p, c_u8p,
        ]
        lib.bucket_sort_windows.restype = None
        lib.bucket_sort_windows.argtypes = [
            c_i64p, c_i32p, ctypes.c_int64, ctypes.c_int64,
        ]
        _cached = lib
        return lib
