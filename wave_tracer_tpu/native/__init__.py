"""Native (C++) host-side build kernels, loaded via ctypes.

The compute path is JAX/XLA; the host-side runtime around it — SAH BVH
construction for large scenes — is native C++ like the reference's
(reference src/ads/bvh_constructor.cpp + vendored tinybvh). The library is
compiled on first use with g++ and cached next to the source; everything
degrades gracefully to the numpy builders when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "bvh_builder.cpp")
_LIB = os.path.join(_DIR, "libwt_native.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.isfile(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", _LIB, _SRC],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB)
        lib.wt_bvh_build.restype = ctypes.c_int64
        lib.wt_bvh_build.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int]
        lib.wt_bvh_read.restype = None
        lib.wt_bvh_read.argtypes = [ctypes.POINTER(ctypes.c_float)] * 2 \
            + [ctypes.POINTER(ctypes.c_int32)] * 3
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def build_bvh_native(positions: np.ndarray, max_leaf: int = 4):
    """C++ binned-SAH build; returns a FlatBVH or None on failure."""
    lib = _load()
    if lib is None:
        return None
    from wave_tracer_tpu.accel.bvh import FlatBVH

    pos = np.ascontiguousarray(positions, np.float32)
    T = len(pos)
    n_nodes = lib.wt_bvh_build(
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), T, max_leaf)
    node_min = np.zeros((n_nodes, 3), np.float32)
    node_max = np.zeros((n_nodes, 3), np.float32)
    node_left = np.zeros(n_nodes, np.int32)
    node_count = np.zeros(n_nodes, np.int32)
    tri_order = np.zeros(T, np.int32)
    lib.wt_bvh_read(
        node_min.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        node_max.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        node_left.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        node_count.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        tri_order.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return FlatBVH(node_min=node_min, node_max=node_max,
                   node_left=node_left, node_count=node_count,
                   tri_order=tri_order)
