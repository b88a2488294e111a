"""ctypes binding for the first-party C++ BVH (native/aabb.cpp).

Builds lazily via `make -C native` when the shared library is missing and
a toolchain is available; raises ImportError otherwise so callers
(meshops.transfer) fall back to the numpy backend.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcape_aabb.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
            )
        except Exception as e:  # no toolchain / build failure
            raise ImportError(f"cannot build native AABB library: {e}") from e
    lib = ctypes.CDLL(_LIB_PATH)
    lib.aabb_build.restype = ctypes.c_void_p
    lib.aabb_build.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
    ]
    lib.aabb_nearest.restype = None
    lib.aabb_nearest.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
    ]
    lib.aabb_free.restype = None
    lib.aabb_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def nearest_triangles(
    verts: np.ndarray, faces: np.ndarray, queries: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """For each query point: (nearest face index, barycentric coords of the
    closest surface point). Exact BVH search."""
    lib = _load()
    verts = np.ascontiguousarray(verts, dtype=np.float64)
    faces = np.ascontiguousarray(faces, dtype=np.int32)
    queries = np.ascontiguousarray(queries, dtype=np.float64)
    nq = len(queries)
    out_face = np.empty(nq, dtype=np.int32)
    out_bary = np.empty((nq, 3), dtype=np.float64)

    handle = lib.aabb_build(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(verts),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(faces),
    )
    try:
        lib.aabb_nearest(
            handle,
            queries.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), nq,
            out_face.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_bary.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
    finally:
        lib.aabb_free(handle)
    return out_face, out_bary
