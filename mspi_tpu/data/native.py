"""ctypes binding for the native C++ data loader (native/mspi_loader.cc).

JPEG decode + PIL-compatible antialiased bilinear resize + threaded clip
decoding.  Builds on first use (make -C native); falls back to the PIL path
transparently when the toolchain or libjpeg is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmspi_loader.so")
_lib = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _build_failed = True
        return None
    lib.mspi_decode_jpeg.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_ubyte),
                                     ctypes.c_int, ctypes.c_int]
    lib.mspi_decode_jpeg.restype = ctypes.c_int
    lib.mspi_decode_clip.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                     ctypes.c_int,
                                     ctypes.POINTER(ctypes.c_ubyte),
                                     ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.mspi_decode_clip.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def load_frame_native(path: str, size: Tuple[int, int]) -> Optional[np.ndarray]:
    """[h, w, 3] uint8 or None on failure."""
    lib = _load()
    if lib is None:
        return None
    h, w = size
    out = np.empty((h, w, 3), dtype=np.uint8)
    rc = lib.mspi_decode_jpeg(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), h, w)
    return out if rc == 0 else None


def load_clip_native(paths: Sequence[str], size: Tuple[int, int],
                     n_threads: int = 4) -> Optional[np.ndarray]:
    """[T, h, w, 3] uint8 decoded by the C++ thread pool, or None."""
    lib = _load()
    if lib is None:
        return None
    h, w = size
    n = len(paths)
    out = np.empty((n, h, w, 3), dtype=np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failed = lib.mspi_decode_clip(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), h, w,
        n_threads)
    return out if failed == 0 else None
