"""Native (C++) runtime components, loaded via ctypes.

The reference keeps its engine infrastructure native (donut C++, NVRHI,
hardware BLAS builds); here the host-side cold paths that are too slow in
Python live in C++: the binned-SAH BVH builder (bvh_builder.cpp). The
library auto-builds on first use if g++ is available and falls back to the
numpy builder otherwise.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libbvh_builder.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["sh", os.path.join(_DIR, "build.sh")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.bvh_build.restype = ctypes.c_int64
    lib.bvh_build.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32]
    lib.bvh_get_nodes.argtypes = [ctypes.POINTER(ctypes.c_float),
                                  ctypes.POINTER(ctypes.c_int32),
                                  ctypes.POINTER(ctypes.c_int32)]
    lib.bvh_get_order.argtypes = [ctypes.POINTER(ctypes.c_int64)]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def build_bvh_native(positions: np.ndarray, indices: np.ndarray,
                     leaf_size: int = 4):
    """Binned-SAH BVH build in C++; returns (bounds (N,12) f32,
    child (N,2) i32, depth (N,) i32, order (T,) i64) or None if the
    native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    positions = np.ascontiguousarray(positions, np.float32)
    indices = np.ascontiguousarray(indices, np.int32)
    t = indices.shape[0]
    n_nodes = lib.bvh_build(
        positions.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        positions.shape[0],
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), t,
        leaf_size)
    if n_nodes <= 0:
        return None
    bounds = np.empty((n_nodes, 12), np.float32)
    child = np.empty((n_nodes, 2), np.int32)
    depth = np.empty((n_nodes,), np.int32)
    order = np.empty((t,), np.int64)
    lib.bvh_get_nodes(
        bounds.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        child.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        depth.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    lib.bvh_get_order(order.ctypes.data_as(
        ctypes.POINTER(ctypes.c_int64)))
    lib.bvh_free()
    return bounds, child, depth, order
