"""C++ bindings: mesh decimation and the golden reference rasterizer."""

from __future__ import annotations

import ctypes

import numpy as np

from . import lib


def available() -> bool:
    l = lib.get()
    return l is not None and hasattr(l, "ropes3d_decimate")


def _call_decimator(symbol: str, tris: np.ndarray, target: int) -> np.ndarray:
    l = lib.get()
    fn = getattr(l, symbol)
    tris = np.ascontiguousarray(tris, np.float32)
    n = tris.shape[0]
    out = np.zeros((n, 3, 3), np.float32)
    fn.restype = ctypes.c_long
    fn.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_float), ctypes.c_long,
    ]
    got = fn(
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, target,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
    )
    return out[:got]


def decimate(tris: np.ndarray, target: int) -> np.ndarray:
    """Native vertex-clustering decimation (same algorithm as robot/mesh.py)."""
    return _call_decimator("ropes3d_decimate", tris, target)


def qem_available() -> bool:
    l = lib.get()
    return l is not None and hasattr(l, "ropes3d_decimate_qem")


def decimate_qem(tris: np.ndarray, target: int) -> np.ndarray:
    """Quadric-error-metric edge-collapse decimation (higher fidelity)."""
    return _call_decimator("ropes3d_decimate_qem", tris, target)


def raster_reference(
    cam_verts: np.ndarray,  # [N, 3, 3] camera-space triangles
    link_ids: np.ndarray,  # [N]
    fx: float, fy: float, cx: float, cy: float,
    h: int, w: int, row0: float = 0.0, col0: float = 0.0,
):
    """Scalar CPU golden rasterizer (independent oracle for TPU kernels)."""
    l = lib.get()
    cam_verts = np.ascontiguousarray(cam_verts, np.float32)
    link_ids = np.ascontiguousarray(link_ids, np.int32)
    depth = np.zeros((h, w), np.float32)
    lid = np.zeros((h, w), np.int32)
    l.ropes3d_raster_reference.restype = None
    l.ropes3d_raster_reference.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ctypes.c_long,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
    ]
    l.ropes3d_raster_reference(
        cam_verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        link_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        cam_verts.shape[0], fx, fy, cx, cy, h, w, row0, col0,
        depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lid.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return depth, lid
