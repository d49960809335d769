"""ctypes bridge to the C++ threaded npy loader (csrc/npy_loader.cpp).

Builds the shared library on first use (g++ is in the image) into a cache
location keyed by the source hash — editing csrc/ invalidates the binary, so
stale .so files can never shadow source fixes. Falls back to numpy when the
toolchain is unavailable. Used by ``datasets.load_domain_arrays`` to slurp a
whole split of same-shaped uint8 npy files into one dense array.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_LIB = None


def _find_src() -> str | None:
    """Locate csrc/npy_loader.cpp: explicit env override first, then the
    repo-checkout layout (two levels up from this module). A wheel install
    without the csrc tree simply falls back to the numpy loader."""
    cand = [os.environ.get("MDVIT_CSRC", "")] if os.environ.get(
        "MDVIT_CSRC") else []
    cand.append(os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                             "npy_loader.cpp"))
    for c in cand:
        c = os.path.abspath(c)
        if os.path.isfile(c):
            return c
    return None


def _so_path(src: str) -> str:
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.environ.get(
        "MDVIT_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "mdvit_tpu"),
    )
    try:
        os.makedirs(cache, exist_ok=True)
    except OSError:
        cache = tempfile.gettempdir()
    return os.path.join(cache, f"_npy_loader_{digest}.so")


def _build(src: str, so: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-pthread", "-o", so, src],
            check=True, capture_output=True,
        )
        return True
    except Exception:
        return False


def get_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    src = _find_src()
    if src is None:
        _LIB = False
        return False
    so = _so_path(src)
    if not os.path.exists(so) and not _build(src, so):
        _LIB = False
        return False
    try:
        lib = ctypes.CDLL(so)
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
