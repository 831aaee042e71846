"""ctypes bridge to the native IO library (native/slamio.cc).

Builds lazily with make on first use; every entry point transparently falls
back to the pure-Python implementations (io/ply.py, datasets/dataset.py) when
the toolchain or the .so is unavailable, so the native layer is a pure
accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libslamio.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.ply_read_xyzt.restype = ctypes.c_long
    lib.ply_read_xyzt.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int)]
    lib.nclt_open.restype = ctypes.c_void_p
    lib.nclt_open.argtypes = [ctypes.c_char_p]
    lib.nclt_close.argtypes = [ctypes.c_void_p]
    lib.nclt_read.restype = ctypes.c_long
    lib.nclt_read.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_long]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def ply_read_xyzt(path, cap: int = 1 << 21
                  ) -> Optional[Tuple[np.ndarray, Optional[np.ndarray]]]:
    """Native PLY vertex decode; None -> caller should use the Python path."""
    lib = _load()
    if lib is None:
        return None
    xyz = np.empty((cap, 3), np.float64)
    ts = np.empty((cap,), np.float64)
    has_time = ctypes.c_int(0)
    n = lib.ply_read_xyzt(
        str(path).encode(), xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), cap,
        ctypes.byref(has_time))
    if n < 0:
        return None  # unsupported flavor (ascii/lists): python fallback
    return xyz[:n].copy(), (ts[:n].copy() if has_time.value else None)


class NcltNativeReader:
    """Streaming native decoder of velodyne_hits.bin."""

    def __init__(self, path):
        lib = _load()
        if lib is None:
            raise RuntimeError("native slamio unavailable")
        self._lib = lib
        self._h = lib.nclt_open(str(path).encode())
        if not self._h:
            raise FileNotFoundError(path)

    def read(self, num_batches: int, skip: bool = False, cap: int = 1 << 21):
        xyz = np.empty((cap, 3), np.float64)
        ts = np.empty((cap,), np.float64)
        n = self._lib.nclt_read(
            self._h, num_batches, 1 if skip else 0,
            xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), cap)
        if n == -2:
            raise ValueError("The batch does not have a matching magic number")
        if n < 0:
            return None
        return xyz[:n].copy(), ts[:n].copy()

    def close(self):
        if self._h:
            self._lib.nclt_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
