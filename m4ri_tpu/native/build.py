"""Build and load the native gf2core library via g++ + ctypes.

The shared object is compiled on demand into the package directory; loading
degrades gracefully (``load() -> None``) if no compiler is available, and
callers fall back to numpy implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "gf2core.cpp")
_SO = os.path.join(_DIR, "libgf2core.so")

_lib = None
_tried = False


def build(force: bool = False) -> str | None:
    """Compile the library for *this* host.  The .so is never shipped in
    the repo (it is built with -march=native, so a foreign binary could
    SIGILL at call time); a stale or foreign file is simply rebuilt."""
    if (not force and os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return _SO
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _SO
    except (OSError, subprocess.CalledProcessError):
        return None


def _open(so: str):
    """dlopen + bind + a tiny selftest; any failure means 'no native'."""
    lib = ctypes.CDLL(so)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64 = ctypes.c_int64
    lib.gf2_pack.argtypes = [u8p, u32p, i64, i64]
    lib.gf2_unpack.argtypes = [u32p, u8p, i64, i64]
    lib.gf2_mul_naive.argtypes = [u32p, u32p, u32p, i64, i64, i64]
    lib.gf2_transpose.argtypes = [u32p, u32p, i64, i64]
    lib.gf2_echelonize.argtypes = [u32p, i64, i64, ctypes.c_int]
    lib.gf2_echelonize.restype = i64
    lib.gf2_srandom.argtypes = [ctypes.c_uint32]
    lib.gf2_random_word.restype = ctypes.c_uint64
    lib.gf2_randomize.argtypes = [u32p, i64, i64]
    # selftest: transpose of a 2x2 identity must round-trip
    src = np.array([[1], [2]], np.uint32)
    dst = np.zeros((2, 1), np.uint32)
    lib.gf2_transpose(_u32(src), _u32(dst), 2, 2)
    if dst.tolist() != [[1], [2]]:
        raise OSError("gf2core selftest failed")
    return lib


def load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    so = build()
    if so is None:
        return None
    try:
        _lib = _open(so)
    except OSError:
        # e.g. a leftover binary from another host: rebuild once, then
        # fall back to the numpy paths
        so = build(force=True)
        if so is not None:
            try:
                _lib = _open(so)
            except OSError:
                _lib = None
    return _lib


def _u32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def native_mul(a_packed: np.ndarray, b_packed: np.ndarray, k: int,
               n: int) -> np.ndarray | None:
    """Packed GF(2) product via the native popcount oracle."""
    lib = load()
    if lib is None:
        return None
    m, kw = a_packed.shape
    a = np.ascontiguousarray(a_packed, np.uint32)
    b = np.ascontiguousarray(b_packed, np.uint32)
    bt = np.zeros((n, kw), np.uint32)
    btmp = np.zeros((n, (k + 31) // 32), np.uint32)
    lib.gf2_transpose(_u32(b), _u32(btmp), k, n)
    bt[:, : btmp.shape[1]] = btmp
    c = np.zeros((m, (n + 31) // 32), np.uint32)
    lib.gf2_mul_naive(_u32(a), _u32(bt), _u32(c), m, n, kw)
    return c


def native_echelonize(a_packed: np.ndarray, n: int, full: bool):
    lib = load()
    if lib is None:
        return None
    a = np.ascontiguousarray(a_packed, np.uint32).copy()
    r = lib.gf2_echelonize(_u32(a), a.shape[0], n, int(full))
    return a, int(r)


def native_randomize(rows: int, cols: int, seed: int = 17) -> np.ndarray | None:
    lib = load()
    if lib is None:
        return None
    lib.gf2_srandom(seed)
    out = np.zeros((rows, (cols + 31) // 32), np.uint32)
    lib.gf2_randomize(_u32(out), rows, cols)
    return out
