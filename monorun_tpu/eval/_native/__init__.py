"""ctypes binding + on-demand g++ build of the native eval kernels."""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "kitti_stats.cpp")
_LIB = os.path.join(_DIR, f"libkitti_stats_{sys.platform}.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    stale = not os.path.exists(_LIB) or (
        os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
    )
    if stale and not _build() and not os.path.exists(_LIB):
        return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None

    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")

    lib.kitti_tp_scores.restype = ctypes.c_int
    lib.kitti_tp_scores.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, f32p, i32p, i32p,
        ctypes.c_float, f32p,
    ]
    lib.kitti_stats_thresholds.restype = None
    lib.kitti_stats_thresholds.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, f32p, f32p, f32p, f32p, f32p,
        ctypes.c_int, i32p, i32p, ctypes.c_int, ctypes.c_float, f32p,
        ctypes.c_int, ctypes.c_int, f32p,
    ]
    _lib = lib
    return _lib
