"""Offscreen rendering: virtual cameras over viewsphere pose grids.

Replaces the reference's renderer stack (reference:
meshpy/meshpy/mesh_renderer.py — VirtualCamera / ViewsphereDiscretizer /
SceneObject / RenderMode around the OSMesa ``meshrender`` C++ module) with a
dependency-free native C++ software rasterizer (native/renderer/renderer.cpp,
ctypes ABI, built on demand with g++)."""

from .camera import (
    CameraIntrinsics,
    RenderMode,
    SceneObject,
    ViewsphereDiscretizer,
    VirtualCamera,
)
from .native import render_mesh

__all__ = ["CameraIntrinsics", "RenderMode", "SceneObject",
           "ViewsphereDiscretizer", "VirtualCamera", "render_mesh"]
