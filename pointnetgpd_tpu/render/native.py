"""ctypes binding for the native renderer (native/renderer/renderer.cpp).

Builds the shared library on demand with g++ (no pybind11/Boost.Python —
the reference's meshrender needed Boost.Python + OSMesa; this is a plain C
ABI). The .so is cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "renderer")
_LIB_PATH = os.path.join(_NATIVE_DIR, "librenderer.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "renderer.cpp")

_lib = None


def _build():
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB_PATH,
         _SRC_PATH],
        check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC_PATH)):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.render_mesh.restype = ctypes.c_int
    lib.render_mesh.argtypes = [
        ctypes.POINTER(ctypes.c_double),  # proj 3x4
        ctypes.POINTER(ctypes.c_double),  # cam_world 3
        ctypes.c_int, ctypes.c_int,       # width, height
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,  # verts, n_verts
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,     # tris, n_tris
        ctypes.POINTER(ctypes.c_float),   # depth_out
        ctypes.POINTER(ctypes.c_float),   # color_out
        ctypes.POINTER(ctypes.c_uint8),   # mask_out
    ]
    _lib = lib
    return lib


def render_mesh(proj, cam_world, width: int, height: int, vertices, triangles):
    """Render one view: returns (depth (H, W) float32, color (H, W) float32,
    mask (H, W) uint8). ``proj``: 3x4 world->pixel projection K [R | t];
    ``cam_world``: camera center in world coordinates."""
    lib = _load()
    proj = np.ascontiguousarray(proj, np.float64).reshape(3, 4)
    cam = np.ascontiguousarray(cam_world, np.float64).reshape(3)
    verts = np.ascontiguousarray(vertices, np.float64)
    tris = np.ascontiguousarray(triangles, np.int32)
    depth = np.zeros((height, width), np.float32)
    color = np.zeros((height, width), np.float32)
    mask = np.zeros((height, width), np.uint8)
    ret = lib.render_mesh(
        proj.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cam.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        width, height,
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(verts),
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(tris),
        depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        color.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if ret != 0:
        raise RuntimeError(f"render_mesh failed with code {ret}")
    return depth, color, mask
