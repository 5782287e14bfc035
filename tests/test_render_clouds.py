"""render_clouds: depth-render -> backprojection round trip.

The synthetic-workflow stand-in for the reference's RGB-D cloud conversion
(ycb_cloud_generate.py:121-184 reprojection) must put every backprojected
point ON the rendered mesh surface, in the object frame."""

import os

import numpy as np

from pointnetgpd_tpu.geometry.mesh import Mesh3D
from pointnetgpd_tpu.pipelines.render_clouds import (
    DEFAULT_INTR,
    backproject_depth,
    render_object_clouds,
    view_ring,
)
from pointnetgpd_tpu.render.camera import RenderMode, VirtualCamera


def _sphere_mesh(r=0.04, nu=32, nv=16):
    from pointnetgpd_tpu.pipelines.parity import _uv_sphere

    return _uv_sphere((r, r, r), nu=nu, nv=nv)


class TestBackprojection:
    def test_points_land_on_the_surface(self):
        r = 0.04
        verts, tris = _sphere_mesh(r)
        cam = VirtualCamera(DEFAULT_INTR)
        t_wc, center = view_ring(radius=0.4, n_views=1)[0]
        depth = cam.images(Mesh3D(verts, tris), [(t_wc, center)],
                           RenderMode.DEPTH)[0]
        assert (depth > 0).sum() > 500
        pts = backproject_depth(depth, DEFAULT_INTR.k, t_wc)
        # every point within a pixel-footprint tolerance of the sphere
        rad = np.linalg.norm(pts, axis=1)
        assert np.abs(rad - r).max() < 4e-3
        assert np.abs(np.median(rad) - r) < 1e-3
        # camera-visible hemisphere only: all points face the camera
        vis = np.sum((center - pts) * pts, axis=1)  # normal == pts/r
        assert (vis > 0).mean() > 0.99

    def test_render_object_clouds_layout(self, tmp_path):
        from pointnetgpd_tpu.geometry.io import write_obj

        verts, tris = _sphere_mesh()
        gdir = tmp_path / "obj1" / "google_512k"
        os.makedirs(gdir)
        write_obj(str(gdir / "nontextured.obj"), verts, tris)
        paths = render_object_clouds(str(tmp_path / "obj1"), n_views=3,
                                     max_points=5000, seed=0)
        assert len(paths) == 3
        for v, p in enumerate(paths):
            assert p.endswith(f"pc_NP3_NP5_{v}.npy")  # dataset.py:400 glob
            pc = np.load(p)
            assert pc.ndim == 2 and pc.shape[1] == 3 and len(pc) > 100
            assert len(pc) <= 5000
        # idempotent re-run (no overwrite): same files returned
        again = render_object_clouds(str(tmp_path / "obj1"), n_views=3,
                                     max_points=5000, seed=0)
        assert again == paths
