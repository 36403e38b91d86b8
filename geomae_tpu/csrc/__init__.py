"""ctypes bindings + build for the native point-prep core.

Builds ``pointprep.cpp`` with g++ on first use (cached .so next to the
source); every public helper has a numpy fallback, so environments without
a toolchain lose only throughput.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "pointprep.cpp")
_SO = os.path.join(_DIR, "libpointprep.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[str]:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
             "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _SO if os.path.exists(_SO) else _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        f64p = ctypes.POINTER(ctypes.c_float)
        lib.prep_sweep.restype = ctypes.c_int64
        lib.prep_sweep.argtypes = [
            f64p, ctypes.c_int64, ctypes.c_int32,
            f64p, f64p, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int32, ctypes.c_int32, f64p,
            f64p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
        lib.shuffle_rows.restype = None
        lib.shuffle_rows.argtypes = [f64p, ctypes.c_int64, ctypes.c_int32,
                                     ctypes.c_uint64]
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.build_scene.restype = ctypes.c_int64
        lib.build_scene.argtypes = (
            [f64p, ctypes.c_int64, ctypes.c_int32]
            + [ctypes.c_float] * 6
            + [ctypes.c_int32] * 8
            + [ctypes.c_int64, ctypes.c_int32]
            + [f64p, i32p, i32p, i32p, i32p, i32p, u8p])
        _lib = lib
        return _lib


def _fp(a: Optional[np.ndarray]):
    if a is None:
        return ctypes.cast(None, ctypes.POINTER(ctypes.c_float))
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def prep_sweep_native(lib, pts: np.ndarray, out: np.ndarray, cursor,
                      R: Optional[np.ndarray], t: Optional[np.ndarray],
                      time_lag: float, remove_close_radius: float,
                      rot: float, scale: float, flip_y: bool, flip_x: bool,
                      pc_range: Optional[np.ndarray]) -> int:
    """One fused sweep-prep call; ``cursor`` is a ctypes.c_int64."""
    assert pts.dtype == np.float32 and pts.flags.c_contiguous
    return lib.prep_sweep(
        _fp(pts), pts.shape[0], pts.shape[1],
        _fp(R), _fp(t), time_lag, remove_close_radius,
        float(np.cos(rot)), float(np.sin(rot)), scale,
        int(flip_y), int(flip_x), _fp(pc_range),
        _fp(out), out.shape[0], ctypes.byref(cursor))
