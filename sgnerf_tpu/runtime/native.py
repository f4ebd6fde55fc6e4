"""ctypes bindings for the native host-runtime library, with numpy fallbacks.

See native/sgnerf_native.cpp. The library auto-builds on first import (g++ is
in the image); every entry point has a pure-numpy fallback so the framework
works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        here = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import sys
        sys.path.insert(0, os.path.join(here, "native"))
        try:
            from build import build  # type: ignore
            path = build()
        finally:
            sys.path.pop(0)
        lib = ctypes.CDLL(path)
        lib.compute_linking.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, ctypes.POINTER(ctypes.c_int32)]
        lib.vox_downsample_closest.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        lib.vox_downsample_closest.restype = ctypes.c_int64
        lib.nearest_view.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)]
        _LIB = lib
    except Exception as e:  # pragma: no cover - toolchain missing
        print(f"[native] falling back to numpy ({e})")
        _LIB = None
    return _LIB


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def compute_linking(intrinsic4: np.ndarray, c2w: np.ndarray,
                    coords_world: np.ndarray, depth: np.ndarray,
                    voxel_size: float) -> np.ndarray:
    lib = _load()
    if lib is None:
        from ..models.bpnet.bpnet import compute_linking as py_impl
        return py_impl(intrinsic4, c2w, coords_world, depth, voxel_size)
    xyz = np.ascontiguousarray(coords_world, np.float32)
    depth = np.ascontiguousarray(depth, np.float32)
    c2w16 = np.ascontiguousarray(c2w, np.float64).reshape(16)
    out = np.empty((len(xyz), 3), np.int32)
    lib.compute_linking(
        _fptr(xyz), len(xyz),
        c2w16.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        float(intrinsic4[0, 0]), float(intrinsic4[1, 1]),
        float(intrinsic4[0, 2]), float(intrinsic4[1, 2]),
        _fptr(depth), depth.shape[0], depth.shape[1],
        float(voxel_size), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def vox_downsample_closest(xyz: np.ndarray, vox_res: int) -> np.ndarray:
    """Returns indices of kept (closest-to-centroid) points."""
    lib = _load()
    if lib is None:
        from ..ops.scatter import construct_vox_points_closest
        _, _, idx = construct_vox_points_closest(xyz, vox_res)
        return np.sort(idx)
    x = np.ascontiguousarray(xyz, np.float32)
    out = np.empty(len(x), np.int64)
    m = lib.vox_downsample_closest(
        _fptr(x), len(x), int(vox_res),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out[:m]


def nearest_view(campos: np.ndarray, camdir: np.ndarray,
                 xyz: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None:
        from .scene_model import nearest_view as py_impl
        return py_impl(campos, camdir, xyz)
    x = np.ascontiguousarray(xyz, np.float32)
    cp = np.ascontiguousarray(campos, np.float32)
    cd = np.ascontiguousarray(camdir, np.float32)
    out = np.empty(len(x), np.int32)
    lib.nearest_view(_fptr(x), len(x), _fptr(cp), _fptr(cd), len(cp),
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out.astype(np.int64)
