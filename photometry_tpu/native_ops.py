"""
ctypes bindings to the native host-runtime library (native/fastio.cpp).

The library is compiled on demand with g++ the first time it is needed and
cached next to the sources; every entry point has a NumPy fallback so the
framework works on hosts without a toolchain.  (pybind11 is not available in
this environment; the C ABI + ctypes keeps the binding dependency-free.)
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["native_available", "bswap_f32", "bswap_crop_f32",
           "moving_median_f32", "gunzip", "gzip_compress"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libptfastio.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "fastio.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], capture_output=True,
                       text=True, timeout=120, check=True)
        return os.path.exists(_LIB_PATH)
    except (OSError, subprocess.SubprocessError) as e:
        logger.debug("Native build failed: %s", e)
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("PHOTOMETRY_TPU_NO_NATIVE", "0") == "1":
            # Debug kill switch: force the NumPy fallbacks (e.g. to rule the
            # native library in/out when hunting memory corruption).
            logger.info("Native library disabled by PHOTOMETRY_TPU_NO_NATIVE.")
            return None
        # make is a cheap mtime no-op when the .so is current, and rebuilds
        # it when fastio.cpp is newer (a stale library would silently miss
        # entry points added since it was compiled):
        if not _build() and not os.path.exists(_LIB_PATH):
            logger.info("Native library unavailable; using NumPy fallbacks.")
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.pt_bswap_f32.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        lib.pt_bswap_crop_f32.argtypes = [ctypes.c_void_p] + [ctypes.c_int64] * 6 + [ctypes.c_void_p]
        lib.pt_moving_median_f32.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                             ctypes.c_int64, ctypes.c_int,
                                             ctypes.c_void_p]
        lib.pt_gunzip.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                  ctypes.c_void_p, ctypes.c_int64]
        lib.pt_gunzip.restype = ctypes.c_int64
        lib.pt_version.restype = ctypes.c_int
        version = lib.pt_version()
        if version < 1:
            return None
        if version >= 2:
            lib.pt_gzip.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_int]
            lib.pt_gzip.restype = ctypes.c_int64
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def bswap_f32(raw: bytes) -> np.ndarray:
    """Big-endian float32 buffer -> native float32 array."""
    n = len(raw) // 4
    lib = _load()
    if lib is None:
        return np.frombuffer(raw, dtype=">f4").astype("<f4")
    out = np.empty(n, dtype="<f4")
    buf = np.frombuffer(raw, dtype=np.uint8)
    lib.pt_bswap_f32(buf.ctypes.data, out.ctypes.data, n)
    return out


def bswap_crop_f32(raw: bytes, H: int, W: int, r0: int, r1: int,
                   c0: int, c1: int) -> np.ndarray:
    """Fused byteswap + crop of a big-endian (H, W) float32 image buffer."""
    lib = _load()
    if lib is None:
        img = np.frombuffer(raw, dtype=">f4").reshape(H, W)
        return img[r0:r1, c0:c1].astype("<f4")
    out = np.empty((r1 - r0, c1 - c0), dtype="<f4")
    buf = np.frombuffer(raw, dtype=np.uint8)
    lib.pt_bswap_crop_f32(buf.ctypes.data, H, W, r0, r1, c0, c1, out.ctypes.data)
    return out


def moving_median_f32(x: np.ndarray, window: int) -> np.ndarray:
    """Centred moving median along axis 0 (NaN-ignoring)."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    shape = x.shape
    T = shape[0]
    P = int(np.prod(shape[1:])) if x.ndim > 1 else 1
    lib = _load()
    if lib is None:
        from .utils.mathutils import np_moving_median_central
        return np_moving_median_central(x, window, axis=0).astype(np.float32)
    flat = x.reshape(T, P)
    out = np.empty_like(flat)
    lib.pt_moving_median_f32(flat.ctypes.data, T, P, window, out.ctypes.data)
    return out.reshape(shape)


def gzip_compress(data: bytes, level: int = 2) -> bytes:
    """Gzip a whole buffer (native libdeflate path with Python fallback).

    The per-target light-curve product write is the production drain's hot
    host loop; libdeflate compresses ~3-4x faster than zlib at comparable
    ratios and stamps MTIME=0, making products byte-reproducible.  ``level``
    is deflate effort (1 = fastest; native accepts up to 12, the fallback
    clamps to zlib's 9).  The ctypes call releases the GIL, so the product
    writer thread pool overlaps compressions.
    """
    lib = _load()
    if lib is not None and hasattr(lib, "pt_gzip") and len(data):
        inp = np.frombuffer(data, dtype=np.uint8)
        # gzip overhead is 18 bytes + deflate's worst case of ~n + n/4000:
        cap = len(data) + len(data) // 1000 + 256
        out = np.empty(cap, dtype=np.uint8)
        n = lib.pt_gzip(inp.ctypes.data, len(data), out.ctypes.data, cap,
                        int(level))
        if n < 0 and n == -2:      # capacity miss (shouldn't happen): retry 2x
            cap *= 2
            out = np.empty(cap, dtype=np.uint8)
            n = lib.pt_gzip(inp.ctypes.data, len(data), out.ctypes.data, cap,
                            int(level))
        if n > 0:
            return out[:n].tobytes()
    import gzip as _gz
    # mtime=0 keeps the fallback byte-reproducible like the native path:
    return _gz.compress(data, compresslevel=min(max(int(level), 0), 9), mtime=0)


def gunzip(data: bytes, expected_size: int = 0) -> bytes:
    """Inflate a gzip stream (native zlib path with Python fallback)."""
    lib = _load()
    if lib is None:
        import gzip as _gz
        return _gz.decompress(data)
    cap = max(expected_size, 4 * len(data), 1 << 20)
    inp = np.frombuffer(data, dtype=np.uint8)
    for _ in range(4):
        out = np.empty(cap, dtype=np.uint8)
        n = lib.pt_gunzip(inp.ctypes.data, len(data), out.ctypes.data, cap)
        if n >= 0:
            return out[:n].tobytes()
        if n != -2:
            # corrupt/invalid input — a bigger buffer cannot help; go
            # straight to the Python path for its clear error message:
            break
        cap *= 4          # -2: output capacity exhausted, retry bigger
    import gzip as _gz
    return _gz.decompress(data)
