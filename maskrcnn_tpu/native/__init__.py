"""Native (C++) runtime components, loaded via ctypes.

Build is lazy and cached: the first import compiles `src/*.cpp` with g++ into
`build/librle.so` (a few seconds, once). Pure-numpy fallbacks exist for every
function so the framework degrades gracefully without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "src", "rle.cpp")
_BUILD_DIR = os.path.join(_HERE, "build")
_SO = os.path.join(_BUILD_DIR, "librle.so")

_lock = threading.Lock()
_lib = None
_lib_error: str | None = None


def _build() -> None:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o",
           _SO + ".tmp"]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    os.replace(_SO + ".tmp", _SO)


def get_rle_lib():
    """The compiled librle, or None if the toolchain is unavailable."""
    global _lib, _lib_error
    with _lock:
        if _lib is not None or _lib_error is not None:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
        except Exception as e:  # missing g++, bad cache, ...
            _lib_error = f"{type(e).__name__}: {e}"
            return None

        i64 = ctypes.c_int64
        u64 = ctypes.c_uint64
        p_u8 = ctypes.POINTER(ctypes.c_uint8)
        p_u32 = ctypes.POINTER(ctypes.c_uint32)
        p_i64 = ctypes.POINTER(ctypes.c_int64)
        p_f64 = ctypes.POINTER(ctypes.c_double)

        lib.rle_encode.restype = i64
        lib.rle_encode.argtypes = [p_u8, i64, i64, p_u32]
        lib.rle_decode.restype = None
        lib.rle_decode.argtypes = [p_u32, i64, i64, i64, p_u8]
        lib.rle_area.restype = u64
        lib.rle_area.argtypes = [p_u32, i64]
        lib.rle_intersection.restype = u64
        lib.rle_intersection.argtypes = [p_u32, i64, p_u32, i64]
        lib.rle_iou_matrix.restype = None
        lib.rle_iou_matrix.argtypes = [p_u32, p_i64, p_i64, i64,
                                       p_u32, p_i64, p_i64, i64, p_u8, p_f64]
        lib.bbox_iou_matrix.restype = None
        lib.bbox_iou_matrix.argtypes = [p_f64, i64, p_f64, i64, p_u8, p_f64]
        lib.poly_rasterize.restype = None
        lib.poly_rasterize.argtypes = [p_f64, i64, i64, i64, p_u8]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_rle_lib() is not None
