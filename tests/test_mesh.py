"""Mesh3D invariants on analytic solids (unit cube, tetrahedron) — the
reference's test style (meshpy/test/mesh_test.py: 25 invariant methods on a
tetrahedron fixture)."""

import numpy as np
import pytest

from pointnetgpd_tpu.geometry.mesh import Mesh3D
from pointnetgpd_tpu.geometry.io import read_obj

from conftest import REFERENCE_ROOT, requires_reference


def unit_cube():
    v = np.array([[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
                 dtype=np.float64)
    # 12 triangles, outward winding
    f = np.array([
        [0, 1, 3], [0, 3, 2],      # x = 0 face (normal -x)
        [4, 6, 7], [4, 7, 5],      # x = 1 face (+x)
        [0, 4, 5], [0, 5, 1],      # y = 0 (-y)
        [2, 3, 7], [2, 7, 6],      # y = 1 (+y)
        [0, 2, 6], [0, 6, 4],      # z = 0 (-z)
        [1, 5, 7], [1, 7, 3],      # z = 1 (+z)
    ], dtype=np.int32)
    return Mesh3D(v, f)


class TestMassProperties:
    def test_cube_volume_area_com(self):
        m = unit_cube()
        assert m.volume() == pytest.approx(1.0)
        assert m.surface_area() == pytest.approx(6.0)
        np.testing.assert_allclose(m.center_of_mass(), [0.5, 0.5, 0.5],
                                   atol=1e-12)
        assert m.is_watertight()

    def test_cube_inertia(self):
        m = unit_cube()
        inertia = m.inertia()
        # solid unit cube about COM: I = m/6 * (a^2+b^2)/2... exact: 1/6 per
        # axis for unit mass/side: I_xx = (1/12)(b^2+c^2)*m = 1/6
        np.testing.assert_allclose(np.diag(inertia), 1 / 6, atol=1e-10)
        np.testing.assert_allclose(inertia - np.diag(np.diag(inertia)), 0,
                                   atol=1e-10)

    def test_scaling_laws(self):
        m = unit_cube().rescale(2.0)
        assert m.volume() == pytest.approx(8.0)
        assert m.surface_area() == pytest.approx(24.0)
        assert m.max_dim() == pytest.approx(2.0)

    def test_rescale_dimension_modes(self):
        m = Mesh3D(unit_cube().vertices * [1.0, 2.0, 3.0],
                   unit_cube().triangles)
        assert m.rescale_dimension(1.0, "max").max_dim() == pytest.approx(1.0)
        assert m.rescale_dimension(1.0, "min").min_dim() == pytest.approx(1.0)
        assert m.rescale_dimension(1.0, "diag").diag_dim() == pytest.approx(1.0)


class TestEdits:
    def test_cleanup(self):
        m = unit_cube()
        bad = np.concatenate([m.triangles, [[0, 0, 1], [2, 2, 2]]]).astype(np.int32)
        cleaned = Mesh3D(m.vertices, bad).remove_bad_tris()
        assert len(cleaned.triangles) == 12

    def test_remove_unreferenced(self):
        m = unit_cube()
        v = np.concatenate([m.vertices, [[9.0, 9.0, 9.0]]])
        m2 = Mesh3D(v, m.triangles).remove_unreferenced_vertices()
        assert len(m2.vertices) == 8
        assert m2.volume() == pytest.approx(1.0)

    def test_centering(self):
        m = unit_cube().center_vertices_bb()
        np.testing.assert_allclose(m.bounding_box_center(), 0, atol=1e-12)

    def test_subdivide_preserves_geometry(self):
        m = unit_cube().subdivide()
        assert len(m.triangles) == 48
        assert m.volume() == pytest.approx(1.0)
        assert m.surface_area() == pytest.approx(6.0)

    def test_transform(self):
        t = np.eye(4)
        t[:3, 3] = [1, 2, 3]
        m = unit_cube().transform(t)
        np.testing.assert_allclose(m.center_of_mass(), [1.5, 2.5, 3.5],
                                   atol=1e-12)
        assert m.volume() == pytest.approx(1.0)


class TestSamplingAndHull:
    def test_random_surface_points_on_surface(self):
        m = unit_cube()
        pts, tri_idx = m.random_surface_points(500, np.random.RandomState(0))
        assert pts.shape == (500, 3)
        # every point on the cube boundary: one coordinate is 0 or 1
        on_face = np.isclose(pts, 0).any(axis=1) | np.isclose(pts, 1).any(axis=1)
        assert on_face.all()

    def test_convex_hull_of_cube_is_cube(self):
        m = unit_cube().convex_hull()
        assert len(m.vertices) == 8
        assert m.volume() == pytest.approx(1.0)


class TestStablePoses:
    def test_cube_has_six_equal_poses(self):
        poses = unit_cube().stable_poses()
        assert len(poses) == 6
        probs = [p["p"] for p in poses]
        np.testing.assert_allclose(probs, 1 / 6, atol=1e-9)
        # each rotation places the face down: rotated COM z > 0
        for pose in poses:
            com_rot = pose["r"] @ (unit_cube().center_of_mass() - pose["x0"])
            assert com_rot[2] > 0

    def test_tall_box_prefers_flat_pose(self):
        m = Mesh3D(unit_cube().vertices * [1.0, 1.0, 4.0], unit_cube().triangles)
        poses = m.stable_poses()
        # side faces are 4x the area of the end faces -> much higher prob
        assert poses[0]["p"] > 0.2
        top_face_normalish = abs((poses[0]["r"][2] @ [0, 0, 1]))
        assert top_face_normalish < 0.5  # most probable pose lies on a side


@requires_reference
def test_reference_tetrahedron(rng):
    v, f = read_obj(f"{REFERENCE_ROOT}/meshpy/test/data/tetrahedron.obj")
    m = Mesh3D(v, f)
    assert m.volume() > 0
    assert m.is_watertight()
    assert len(m.stable_poses()) >= 1
