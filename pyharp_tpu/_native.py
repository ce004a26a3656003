"""ctypes loader for the native runtime library (csrc/harp_native.cpp).

The native library covers the framework's host side — ASCII table ingestion
and an independent interpolation oracle with the reference's exact clamp
semantics (``/root/reference/src/utils/fileio.cpp``, ``src/math/interpn.h``).
It is compiled on first use with the ambient ``g++`` and cached; every entry
point has a pure-Python fallback, so the framework works without a toolchain.

pybind11 is not part of this toolchain, hence the plain C ABI + ctypes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_ABI_VERSION = 1

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "csrc")
_SRC = os.path.join(_CSRC, "harp_native.cpp")
_SO = os.path.join(_CSRC, "build", "libharp_native.so")

_i64 = ctypes.c_int64
_pd = ctypes.POINTER(ctypes.c_double)


def _build() -> bool:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = ["g++", "-O3", "-fPIC", "-std=c++17", "-shared", "-o", _SO, _SRC]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    return r.returncode == 0 and os.path.exists(_SO)


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("PYHARP_NO_NATIVE"):
            return None
        stale = (not os.path.exists(_SO)
                 or (os.path.exists(_SRC)
                     and os.path.getmtime(_SRC) > os.path.getmtime(_SO)))
        if stale and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        try:
            lib.harp_native_abi_version.restype = _i64
            if lib.harp_native_abi_version() != _ABI_VERSION:
                return None
            lib.harp_locate.restype = _i64
            lib.harp_locate.argtypes = [_pd, ctypes.c_double, _i64]
            lib.harp_interpn.restype = _i64
            lib.harp_interpn.argtypes = [_pd, _pd, _pd, _pd,
                                         ctypes.POINTER(_i64), _i64, _i64, _i64]
            lib.harp_read_table.restype = _i64
            lib.harp_read_table.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(_pd),
                ctypes.POINTER(_i64), ctypes.POINTER(_i64)]
            lib.harp_free.restype = None
            lib.harp_free.argtypes = [ctypes.c_void_p]
        except AttributeError:
            return None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def locate(axis: np.ndarray, x: float) -> int:
    """Native bisection locate; raises RuntimeError if the library is absent."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    axis = np.ascontiguousarray(axis, np.float64)
    return int(lib.harp_locate(axis.ctypes.data_as(_pd), float(x),
                               axis.shape[0]))


def interpn(coords: np.ndarray, data: np.ndarray,
            axes: list[np.ndarray]) -> np.ndarray:
    """Native batched N-D multilinear interpolation.

    Args:
      coords: (nquery, ndim) query coordinates.
      data: (len(axes[0]), ..., len(axes[-1]), *V) sample table.
      axes: list of ascending 1-D axes.

    Returns (nquery, *V) float64.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    coords = np.ascontiguousarray(np.atleast_2d(coords), np.float64)
    ndim = len(axes)
    if coords.shape[1] != ndim:
        raise ValueError(f"coords has {coords.shape[1]} dims, expected {ndim}")
    value_shape = data.shape[ndim:]
    nval = int(np.prod(value_shape)) if value_shape else 1
    data_c = np.ascontiguousarray(data, np.float64)
    axes_c = [np.ascontiguousarray(a, np.float64) for a in axes]
    packed = np.concatenate(axes_c)
    lens = (_i64 * ndim)(*[a.shape[0] for a in axes_c])
    nquery = coords.shape[0]
    out = np.empty((nquery, nval), np.float64)
    rc = lib.harp_interpn(out.ctypes.data_as(_pd), coords.ctypes.data_as(_pd),
                          data_c.ctypes.data_as(_pd),
                          packed.ctypes.data_as(_pd), lens, ndim, nval, nquery)
    if rc != 0:
        raise RuntimeError(f"harp_interpn failed (rc={rc})")
    return out.reshape((nquery,) + value_shape)


def read_table(path: str) -> np.ndarray:
    """Native ASCII table read (comment-stripped, whitespace-separated).

    Raises RuntimeError when the library is absent and ValueError on malformed
    files (mirrors the Python reader's exceptions).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = _pd()
    nrow = _i64()
    ncol = _i64()
    rc = lib.harp_read_table(path.encode(), ctypes.byref(out),
                             ctypes.byref(nrow), ctypes.byref(ncol))
    if rc == -1:
        raise FileNotFoundError(path)
    if rc == -2:
        raise ValueError(f"Empty file: {path}")
    if rc == -3:
        raise ValueError(f"Ragged rows in table: {path}")
    if rc != 0:
        raise ValueError(f"Cannot parse table ({rc}): {path}")
    try:
        n = nrow.value * ncol.value
        arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
    finally:
        lib.harp_free(out)
    return arr.reshape(nrow.value, ncol.value)
