"""ctypes binding for the native codec library (libcodd_io.so).

Auto-builds with g++ on first use (cached); every entry point degrades
gracefully to the numpy codecs in :mod:`codd_tpu.data.io` when the native
library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import List, Optional, Sequence

import numpy as np

__all__ = ["load_library", "native_available", "decode", "decode_batch"]

_NATIVE_DIR = osp.join(osp.dirname(osp.abspath(__file__)), "_native")
_LIB_PATH = osp.join(_NATIVE_DIR, "libcodd_io.so")
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return osp.exists(_LIB_PATH)
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def load_library() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not osp.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.codd_decode.restype = ctypes.POINTER(ctypes.c_float)
    lib.codd_decode.argtypes = [ctypes.c_char_p] + [
        ctypes.POINTER(ctypes.c_int)] * 3
    lib.codd_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.codd_decode_batch.restype = ctypes.c_int
    lib.codd_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return load_library() is not None


def _to_array(lib, ptr, h, w, c) -> np.ndarray:
    n = h * w * c
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    lib.codd_free(ptr)
    a = arr.reshape(h, w, c)
    return a[..., 0] if c == 1 else a


def decode(path: str) -> Optional[np.ndarray]:
    """Decode PFM / .flo / PNG into float32 (H,W[,C]) raw sample values."""
    lib = load_library()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    ptr = lib.codd_decode(path.encode(), ctypes.byref(h), ctypes.byref(w),
                          ctypes.byref(c))
    if not ptr:
        return None
    return _to_array(lib, ptr, h.value, w.value, c.value)


def decode_batch(paths: Sequence[str], num_threads: int = 4
                 ) -> Optional[List[Optional[np.ndarray]]]:
    """Decode many files concurrently in native threads (GIL-free)."""
    lib = load_library()
    if lib is None:
        return None
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    outs = (ctypes.POINTER(ctypes.c_float) * n)()
    hs = (ctypes.c_int * n)()
    ws = (ctypes.c_int * n)()
    cs = (ctypes.c_int * n)()
    lib.codd_decode_batch(c_paths, n, outs, hs, ws, cs, num_threads)
    result: List[Optional[np.ndarray]] = []
    for i in range(n):
        if outs[i]:
            result.append(_to_array(lib, outs[i], hs[i], ws[i], cs[i]))
        else:
            result.append(None)
    return result
