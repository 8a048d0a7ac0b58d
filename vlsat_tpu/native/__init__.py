"""ctypes loader for the native data-loader core (builds on demand).

``load()`` compiles vlsat_tpu/native/ply_native.cpp with g++ (-O3) into a
cached shared object and returns a small wrapper; returns None when no
toolchain is available, in which case callers fall back to the NumPy
implementations in vlsat_tpu.data.ply / data.dataset.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ply_native.cpp")
_LIB: Optional["NativeLib"] = None
_TRIED = False


class NativeLib:
    def __init__(self, dll: ctypes.CDLL):
        self._dll = dll
        dll.vlsat_read_ply.restype = ctypes.c_int
        dll.vlsat_read_ply.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        dll.vlsat_free.argtypes = [ctypes.c_void_p]
        dll.vlsat_prepare_instances.restype = ctypes.c_int
        dll.vlsat_prepare_instances.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.c_int32, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]

    def read_ply(self, path: str) -> Tuple[np.ndarray, np.ndarray]:
        pts_p = ctypes.POINTER(ctypes.c_float)()
        inst_p = ctypes.POINTER(ctypes.c_int32)()
        n = ctypes.c_int64()
        rc = self._dll.vlsat_read_ply(path.encode(), ctypes.byref(pts_p),
                                      ctypes.byref(inst_p), ctypes.byref(n))
        if rc != 0:
            raise IOError(f"native PLY parse failed ({rc}) for {path}")
        count = n.value
        pts = np.ctypeslib.as_array(pts_p, shape=(count, 3)).copy()
        inst = np.ctypeslib.as_array(inst_p, shape=(count,)).copy()
        self._dll.vlsat_free(pts_p)
        self._dll.vlsat_free(inst_p)
        return pts, inst

    def prepare_instances(self, points: np.ndarray, instances: np.ndarray,
                          node_ids, num_points: int,
                          seed: int) -> Tuple[np.ndarray, np.ndarray]:
        points = np.ascontiguousarray(points, np.float32)
        instances = np.ascontiguousarray(instances, np.int32)
        ids = np.ascontiguousarray(node_ids, np.int32)
        n = len(ids)
        out_pts = np.empty((n, num_points, 3), np.float32)
        out_desc = np.empty((n, 11), np.float32)
        rc = self._dll.vlsat_prepare_instances(
            points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            instances.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(points),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n, num_points, seed,
            out_pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_desc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise ValueError("native prepare_instances failed (empty instance?)")
        return out_pts, out_desc


def _build(out_path: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", out_path],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def load(rebuild: bool = False) -> Optional[NativeLib]:
    global _LIB, _TRIED
    if _LIB is not None and not rebuild:
        return _LIB
    if _TRIED and not rebuild:
        return _LIB
    _TRIED = True
    cache = os.environ.get("VLSAT_NATIVE_CACHE",
                           os.path.join(_HERE, "_build"))
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, "libvlsat_ply.so")
    if rebuild or not os.path.exists(so) or (
        os.path.getmtime(so) < os.path.getmtime(_SRC)
    ):
        if not _build(so):
            return None
    try:
        _LIB = NativeLib(ctypes.CDLL(so))
    except OSError:
        _LIB = None
    return _LIB
