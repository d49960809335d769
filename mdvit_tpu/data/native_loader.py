"""ctypes bridge to the C++ threaded npy loader (csrc/npy_loader.cpp).

Builds the shared library on first use (g++ is in the image); falls back to
numpy when the toolchain or binary is unavailable. Used by
``datasets.load_domain_arrays`` to slurp a whole split of same-shaped uint8
npy files into one dense array.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                    "npy_loader.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_npy_loader.so")


def _build() -> bool:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-pthread", "-o", _SO, src],
            check=True, capture_output=True,
        )
        return True
    except Exception:
        return False


def get_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO) and not _build():
        _LIB = False
        return False
    try:
        lib = ctypes.CDLL(_SO)
        lib.npy_batch_load.restype = ctypes.c_int
        lib.npy_batch_load.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_longlong,
            ctypes.c_int, ctypes.c_int,
        ]
        _LIB = lib
    except OSError:
        _LIB = False
    return _LIB


def batch_load_u8(paths: list[str], item_shape: tuple,
                  n_threads: int = 8) -> np.ndarray | None:
    """Load N same-shaped uint8 npy files into one (N, *item_shape) array via
    the native loader; None if unavailable or on any mismatch (caller falls
    back to numpy)."""
    lib = get_lib()
    if not lib:
        return None
    n = len(paths)
    item_bytes = int(np.prod(item_shape))
    out = np.empty((n,) + tuple(item_shape), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.npy_batch_load(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        item_bytes, 1, n_threads,
    )
    if rc != 0:
        return None
    return out
