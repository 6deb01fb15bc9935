"""Native runtime components (C++, bound via ctypes).

``build_native()`` compiles the shared library on first use with g++ (cached beside
the source, keyed by source mtime); everything degrades gracefully to the pure-Python
paths when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "replay_store.cpp")
_LIB = os.path.join(_HERE, "libvoxactb_native.so")
_lock = threading.Lock()
_lib = None


class NativeBuildError(RuntimeError):
    pass


def build_native(force: bool = False) -> str:
    """Compile the native library if needed; returns the .so path."""
    with _lock:
        if (not force and os.path.exists(_LIB)
                and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
            return _LIB
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
            _SRC, "-o", _LIB,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except FileNotFoundError as e:
            raise NativeBuildError("g++ not available") from e
        except subprocess.CalledProcessError as e:
            raise NativeBuildError(f"native build failed:\n{e.stderr}") from e
        return _LIB


def load_native() -> ctypes.CDLL:
    """Build + dlopen with typed signatures (cached)."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
    path = build_native()
    lib = ctypes.CDLL(path)

    u64, vp, cp = ctypes.c_uint64, ctypes.c_void_p, ctypes.c_char_p
    lib.rs_create.restype = vp
    lib.rs_create.argtypes = [cp, u64, u64]
    lib.rs_open.restype = vp
    lib.rs_open.argtypes = [cp]
    for name in ("rs_capacity", "rs_row_bytes", "rs_add_count", "rs_size"):
        getattr(lib, name).restype = u64
        getattr(lib, name).argtypes = [vp]
    lib.rs_add.restype = u64
    lib.rs_add.argtypes = [vp, vp]
    lib.rs_add_batch.restype = None
    lib.rs_add_batch.argtypes = [vp, vp, u64]
    lib.rs_gather.restype = None
    lib.rs_gather.argtypes = [vp, ctypes.POINTER(u64), u64, vp, ctypes.c_int]
    lib.rs_read.restype = None
    lib.rs_read.argtypes = [vp, u64, vp]
    lib.rs_flush.restype = None
    lib.rs_flush.argtypes = [vp]
    lib.rs_close.restype = None
    lib.rs_close.argtypes = [vp]
    lib.bs_start.restype = vp
    lib.bs_start.argtypes = [vp, u64, ctypes.c_int, ctypes.c_int, u64]
    lib.bs_acquire.restype = ctypes.c_int
    lib.bs_acquire.argtypes = [vp]
    lib.bs_buffer.restype = vp
    lib.bs_buffer.argtypes = [vp, ctypes.c_int]
    lib.bs_release.restype = None
    lib.bs_release.argtypes = [vp, ctypes.c_int]
    lib.bs_stop.restype = None
    lib.bs_stop.argtypes = [vp]

    with _lock:
        _lib = lib
    return lib
