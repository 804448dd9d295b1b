"""On-demand build + ctypes binding of the native host library.

Compiles ``collate.cpp`` into a per-user cache directory (keyed by a hash
of the source, so upgrades recompile and read-only site-packages installs
still work) the first time it is needed, via the baked-in g++. Falls back
to building next to the source for editable/in-tree use when the cache
dir is unavailable. No pybind11 — plain C ABI + ctypes, so there is
nothing to install. Falls back gracefully: ``load_native()`` returns None
if no compiler is available and callers keep their pure-numpy paths.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "collate.cpp")
_lock = threading.Lock()
_cached = None
_failed = False


def _cache_lib_path() -> str:
    """Per-user cache path keyed by source hash (XDG convention)."""
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return os.path.join(base, "pcseg_tpu", f"libcollate-{digest}.so")


def _compile(out: str) -> bool:
    try:
        os.makedirs(os.path.dirname(out), exist_ok=True)
    except OSError:
        return False
    tmp = f"{out}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", tmp,
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, text=True, timeout=120
        )
        os.replace(tmp, out)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _build_lib() -> str | None:
    """Locate or build the shared library; cache dir first, in-tree second."""
    try:
        cached = _cache_lib_path()
    except OSError:
        cached = None
    if cached is not None:
        if os.path.exists(cached) or _compile(cached):
            return cached
    # fallback: next to the source (editable installs, writable checkouts)
    intree = os.path.join(_HERE, "libcollate.so")
    fresh = (
        os.path.exists(intree)
        and os.path.getmtime(intree) >= os.path.getmtime(_SRC)
    )
    if fresh or _compile(intree):
        return intree
    return None


def load_native():
    """Return the loaded CDLL with typed signatures, or None."""
    global _cached, _failed
    with _lock:
        if _cached is not None:
            return _cached
        if _failed:
            return None
        path = _build_lib()
        if path is None:
            _failed = True
            return None
        try:
            lib = ctypes.CDLL(path)
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
