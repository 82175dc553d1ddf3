"""Native (C++) host-runtime components, loaded via ctypes.

pbrt's entire runtime is C++; here the device compute path is JAX/Pallas and
C++ is reserved for host-side build work that profiles too slow in NumPy —
currently the SAH BVH builder (bvh_builder.cpp; pbrt src/accelerators/bvh.cpp
analog). The shared library is compiled on first use with g++ into
grail/native/_build/ and cached; every entry point has a NumPy fallback, so a
missing toolchain only costs build speed, never capability.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger("grail")

_HERE = os.path.dirname(os.path.abspath(__file__))
_BUILD_DIR = os.path.join(_HERE, "_build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libgrail_bvh.so")
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _compile():
    os.makedirs(_BUILD_DIR, exist_ok=True)
    src = os.path.join(_HERE, "bvh_builder.cpp")
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src,
           "-o", _LIB_PATH]
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)


def _load():
    """Load (compiling if needed) the native library; None when unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH) or (
                    os.path.getmtime(_LIB_PATH)
                    < os.path.getmtime(os.path.join(_HERE, "bvh_builder.cpp"))):
                _compile()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.grail_build_bvh.restype = ctypes.c_long
            lib.grail_build_bvh.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_long,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
            _lib = lib
        except Exception as e:   # toolchain missing, compile error, ...
            log.warning("native BVH builder unavailable (%s); "
                        "falling back to NumPy", e)
            _lib_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def build_bvh_native(verts, tris, max_prims=4, force_leaf=0):
    """C++ binned-SAH build; same output dict as scene/bvh.py build_bvh.

    Returns None if the native library can't be built/loaded."""
    lib = _load()
    if lib is None:
        return None
    verts = np.ascontiguousarray(verts, np.float32)
    tris = np.ascontiguousarray(tris, np.int32)
    T = tris.shape[0]
    cap = max(2 * T - 1, 1)
    bmin = np.empty((cap, 3), np.float32)
    bmax = np.empty((cap, 3), np.float32)
    right = np.empty(cap, np.int32)
    prim_off = np.empty(cap, np.int32)
    nprims = np.empty(cap, np.int32)
    axis = np.empty(cap, np.int32)
    prim_ids = np.empty(T, np.int32)

    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    n_nodes = lib.grail_build_bvh(
        verts.ctypes.data_as(fp), verts.shape[0],
        tris.ctypes.data_as(ip), T, int(max_prims), int(force_leaf),
        bmin.ctypes.data_as(fp), bmax.ctypes.data_as(fp),
        right.ctypes.data_as(ip), prim_off.ctypes.data_as(ip),
        nprims.ctypes.data_as(ip), axis.ctypes.data_as(ip),
        prim_ids.ctypes.data_as(ip))
    return {
        "bounds_min": bmin[:n_nodes].copy(),
        "bounds_max": bmax[:n_nodes].copy(),
        "right": right[:n_nodes].copy(),
        "prim_off": prim_off[:n_nodes].copy(),
        "nprims": nprims[:n_nodes].copy(),
        "axis": axis[:n_nodes].copy(),
        "prim_ids": prim_ids,
        "max_prims": np.int32(max_prims),
    }
