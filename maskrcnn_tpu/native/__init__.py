"""Native (C++) runtime components, loaded via ctypes.

Build is lazy and cached: the first use compiles `src/<name>.cpp` with g++
into `build/lib<name>.so` (a few seconds, once). Pure-numpy fallbacks exist
for every function so the framework degrades gracefully without a toolchain.

Libraries:
  * librle       — COCO RLE mask codec + IoU matrices (evalkit backend).
  * libimageio   — JPEG decode (libjpeg) + letterbox resize (data loader).
  * libevalmatch — COCO greedy dt<->gt matching core (evalkit backend).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(__file__)
_BUILD_DIR = os.path.join(_HERE, "build")

_lock = threading.Lock()
_libs: dict[str, object] = {}
_errors: dict[str, str] = {}

i64 = ctypes.c_int64
u64 = ctypes.c_uint64
p_u8 = ctypes.POINTER(ctypes.c_uint8)
p_u32 = ctypes.POINTER(ctypes.c_uint32)
p_i64 = ctypes.POINTER(ctypes.c_int64)
p_f32 = ctypes.POINTER(ctypes.c_float)
p_f64 = ctypes.POINTER(ctypes.c_double)


def _cpu_tag() -> tuple[str, bool]:
    """(cache-key component, precise) tied to the host's ISA: builds use
    -march=native, so an .so cached on one machine (e.g. a shared volume)
    must not be dlopen'd on a CPU lacking those extensions (SIGILL).
    `precise=False` means we could not read real feature flags — the caller
    then builds generic code instead of trusting an arch-only tag."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    return hashlib.sha1(line.encode()).hexdigest()[:8], True
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.machine().encode()).hexdigest()[:8], False


def _load(name: str, link_flags: list[str], bind) -> object | None:
    """Build (if stale) + dlopen + bind signatures; None on any failure."""
    with _lock:
        if name in _libs:
            return _libs[name]
        if name in _errors:
            return None
        src = os.path.join(_HERE, "src", f"{name}.cpp")
        tag, precise = _cpu_tag()
        so = os.path.join(_BUILD_DIR, f"lib{name}-{tag}.so")
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                os.makedirs(_BUILD_DIR, exist_ok=True)
                base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                        src, "-o", so + ".tmp"]
                try:
                    # vectorize for the build host ONLY when the cache key
                    # reflects real feature flags; an arch-only tag can't
                    # distinguish ISA levels, so build generic there
                    if not precise:
                        raise subprocess.CalledProcessError(1, "generic")
                    subprocess.run(base[:1] + ["-march=native"] + base[1:]
                                   + link_flags, check=True,
                                   capture_output=True, text=True)
                except subprocess.CalledProcessError:
                    subprocess.run(base + link_flags, check=True,
                                   capture_output=True, text=True)
                os.replace(so + ".tmp", so)
            lib = ctypes.CDLL(so)
            bind(lib)
        except Exception as e:  # missing g++/headers, bad cache, ...
            _errors[name] = f"{type(e).__name__}: {e}"
            return None
        _libs[name] = lib
        return lib


def _bind_rle(lib) -> None:
    lib.rle_encode.restype = i64
    lib.rle_encode.argtypes = [p_u8, i64, i64, p_u32]
    lib.rle_encode_rowmajor.restype = i64
    lib.rle_encode_rowmajor.argtypes = [p_u8, i64, i64, p_u32]
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


def _bind_imageio(lib) -> None:
    c_char_p = ctypes.c_char_p
    lib.img_jpeg_dims.restype = ctypes.c_int
    lib.img_jpeg_dims.argtypes = [c_char_p, p_i64]
    lib.img_decode_jpeg.restype = ctypes.c_int
    lib.img_decode_jpeg.argtypes = [c_char_p, p_u8, i64, p_i64]
    lib.img_letterbox_rgb8.restype = ctypes.c_int
    lib.img_letterbox_rgb8.argtypes = [p_u8, i64, i64, i64, p_f32, p_f64]
    lib.img_decode_letterbox_jpeg.restype = ctypes.c_int
    lib.img_decode_letterbox_jpeg.argtypes = [c_char_p, i64, p_f32, p_f64]
    lib.img_jpeg_dims_mem.restype = ctypes.c_int
    lib.img_jpeg_dims_mem.argtypes = [p_u8, i64, p_i64]
    lib.img_decode_jpeg_mem.restype = ctypes.c_int
    lib.img_decode_jpeg_mem.argtypes = [p_u8, i64, p_u8, i64, p_i64]
    lib.img_decode_letterbox_jpeg_mem.restype = ctypes.c_int
    lib.img_decode_letterbox_jpeg_mem.argtypes = [p_u8, i64, i64, p_f32,
                                                  p_f64]
    f64 = ctypes.c_double
    lib.img_paste_mask.restype = ctypes.c_int
    lib.img_paste_mask.argtypes = [p_f32, i64, f64, f64, f64, f64,
                                   i64, i64, f64, p_u8]
    lib.img_paste_mask_region.restype = ctypes.c_int
    lib.img_paste_mask_region.argtypes = [p_f32, i64, f64, f64, f64, f64,
                                          i64, i64, f64, p_u8, i64]


def _bind_evalmatch(lib) -> None:
    p_f64_ = p_f64
    lib.eval_match.restype = None
    lib.eval_match.argtypes = [p_f64_, i64, i64, p_u8, p_u8, p_u8, i64,
                               p_f64_, i64, p_i64, p_u8, p_i64]


def get_evalmatch_lib():
    """The compiled libevalmatch (COCO greedy matching core), or None."""
    return _load("evalmatch", [], _bind_evalmatch)


def get_rle_lib():
    """The compiled librle, or None if the toolchain is unavailable."""
    return _load("rle", [], _bind_rle)


def get_imageio_lib():
    """The compiled libimageio, or None (no toolchain / no libjpeg)."""
    return _load("imageio", ["-ljpeg"], _bind_imageio)


def native_available() -> bool:
    return get_rle_lib() is not None
