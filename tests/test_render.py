"""Native renderer tests: depth/mask/shading correctness on analytic scenes."""

import numpy as np
import pytest

from pointnetgpd_tpu.geometry.mesh import Mesh3D
from pointnetgpd_tpu.render import (
    CameraIntrinsics,
    RenderMode,
    SceneObject,
    ViewsphereDiscretizer,
    VirtualCamera,
    render_mesh,
)
from pointnetgpd_tpu.render.camera import look_at_pose

from test_mesh import unit_cube

INTR = CameraIntrinsics(fx=200.0, fy=200.0, cx=32.0, cy=32.0,
                        width=64, height=64)


def _square_mesh(z: float, half: float = 0.5):
    """A square in the plane z=z, centered on the optical axis."""
    v = np.array([[-half, -half, z], [half, -half, z],
                  [half, half, z], [-half, half, z]])
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return v, f


class TestRenderMesh:
    def test_depth_of_frontal_plane(self):
        z0 = 2.0
        v, f = _square_mesh(0.0)
        # camera at -z0 on the z axis looking at the origin
        t = look_at_pose([0, 0, -z0], target=[0, 0, 0], up=[0, 1, 0])
        proj = INTR.k @ t[:3, :]
        depth, color, mask = render_mesh(proj, [0, 0, -z0], 64, 64, v, f)
        hit = mask.astype(bool)
        assert hit.sum() > 1000  # the plane covers much of the image
        np.testing.assert_allclose(depth[hit], z0, atol=1e-5)
        # frontal plane: |n . view| == 1
        np.testing.assert_allclose(color[hit], 1.0, atol=0.02)  # flat shading uses face-center view dirs
        # center pixel is covered
        assert mask[32, 32] == 1

    def test_zbuffer_keeps_nearest(self):
        v1, f1 = _square_mesh(0.0)       # far plane at z=2 from the camera
        v2, f2 = _square_mesh(-1.0, half=0.05)  # near plane at z=1 (20 px wide)
        v = np.concatenate([v1, v2])
        f = np.concatenate([f1, f2 + 4]).astype(np.int32)
        t = look_at_pose([0, 0, -2.0], target=[0, 0, 0], up=[0, 1, 0])
        depth, _, mask = render_mesh(INTR.k @ t[:3, :], [0, 0, -2.0],
                                     64, 64, v, f)
        # the center is covered by the near plane at depth 1
        np.testing.assert_allclose(depth[32, 32], 1.0, atol=1e-5)
        # the periphery only by the far plane at depth 2
        assert abs(depth[5, 5] - 2.0) < 1e-5 or mask[5, 5] == 0

    def test_oblique_shading(self):
        v, f = _square_mesh(0.0)
        # slanted view: shading = |cos| between normal and view dir < 1
        cam = np.array([1.5, 0.0, -1.5])
        t = look_at_pose(cam, target=[0, 0, 0], up=[0, 1, 0])
        depth, color, mask = render_mesh(INTR.k @ t[:3, :], cam, 64, 64, v, f)
        hit = mask.astype(bool)
        assert hit.any()
        assert color[hit].max() < 0.95


class TestVirtualCamera:
    def test_cube_viewsphere_renders(self):
        mesh = Mesh3D(unit_cube().vertices - 0.5, unit_cube().triangles)
        vs = ViewsphereDiscretizer(min_radius=2.0, max_radius=2.0,
                                   num_radii=1, num_elev=2, num_az=4)
        cam = VirtualCamera(INTR)
        depths = cam.images_viewsphere(mesh, vs, RenderMode.DEPTH)
        assert len(depths) == 8
        for d in depths:
            hit = d > 0
            assert hit.sum() > 20
            # cube at distance 2, radius ~0.87: depths within [1, 3]
            assert d[hit].min() > 1.0 and d[hit].max() < 3.0

    def test_scene_objects_composited(self):
        obj = Mesh3D(unit_cube().vertices * 0.2 - 0.1, unit_cube().triangles)
        table = Mesh3D((unit_cube().vertices - [0.5, 0.5, 1.0]) * [4, 4, 0.05],
                       unit_cube().triangles)
        t_table = np.eye(4)
        pose = look_at_pose([0, -1.5, 1.0])
        cam = VirtualCamera(INTR)
        masks = cam.images(obj, [(pose, np.array([0, -1.5, 1.0]))],
                           RenderMode.SEGMASK,
                           scene_objects=[SceneObject(table, t_table)])
        solo = cam.images(obj, [(pose, np.array([0, -1.5, 1.0]))],
                          RenderMode.SEGMASK)
        assert masks[0].sum() > solo[0].sum()  # table adds coverage


def test_viewsphere_pose_count():
    vs = ViewsphereDiscretizer(0.5, 1.0, 2, num_elev=3, num_az=5, num_roll=2)
    assert len(vs.object_to_camera_poses()) == 2 * 3 * 5 * 2
