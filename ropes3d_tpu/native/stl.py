"""C++ STL loading binding (falls back to numpy in robot/mesh.py)."""

from __future__ import annotations

import ctypes

import numpy as np

from . import lib


def available() -> bool:
    l = lib.get()
    return l is not None and hasattr(l, "ropes3d_stl_count")


def load_stl(path: str) -> np.ndarray:
    """Load an STL via the native parser into a (T, 3, 3) float32 array."""
    l = lib.get()
    l.ropes3d_stl_count.restype = ctypes.c_long
    l.ropes3d_stl_count.argtypes = [ctypes.c_char_p]
    n = l.ropes3d_stl_count(path.encode())
    if n < 0:
        raise IOError(f"native STL parse failed for {path}")
    out = np.zeros((n, 3, 3), np.float32)
    l.ropes3d_stl_load.restype = ctypes.c_long
    l.ropes3d_stl_load.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
    ]
    got = l.ropes3d_stl_load(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n
    )
    if got != n:
        raise IOError(f"native STL load mismatch for {path}: {got} != {n}")
    return out
