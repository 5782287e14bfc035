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
        # the quasi-static spherical map makes the far-away end faces even
        # less likely than their area fraction -> sides dominate strongly
        assert poses[0]["p"] > 0.2
        top_face_normalish = abs((poses[0]["r"][2] @ [0, 0, 1]))
        assert top_face_normalish < 0.5  # most probable pose lies on a side

    def test_tall_box_end_face_solid_angle(self):
        """The prior of an end face is its exact solid angle from the COM:
        for a 1x1 face at distance d=2, Omega = 4*arcsin(1/((4d^2+1))) ...
        analytically 4*arcsin(a*b / sqrt((4d^2+a^2)(4d^2+b^2)))."""
        m = Mesh3D(unit_cube().vertices * [1.0, 1.0, 4.0], unit_cube().triangles)
        poses = m.stable_poses()
        omega_end = 4 * np.arcsin(1.0 / np.sqrt(17.0 * 17.0))
        p_end = omega_end / (4 * np.pi)
        probs = sorted(p["p"] for p in poses)
        # 6 sinks on a box: 2 end faces (smallest), 4 sides
        assert len(probs) == 6
        np.testing.assert_allclose(probs[:2], p_end, atol=1e-9)
        np.testing.assert_allclose(probs[2:], (1 - 2 * p_end) / 4, atol=1e-9)
        np.testing.assert_allclose(sum(probs), 1.0, atol=1e-9)

    def test_spherical_map_matches_reference_oracle(self):
        """_spherical_projection_areas vs a scalar transcription of the
        reference algorithm (meshpy/mesh.py:1418-1452: per-triangle
        projection to the COM unit sphere + L'Huilier), to 1e-6, on the hulls
        of a tetrahedron, a cube, and an elongated box."""
        import math

        from scipy.spatial import ConvexHull

        from pointnetgpd_tpu.geometry.mesh import _spherical_projection_areas

        def ref_proj_area(verts3, cm):
            proj = [(v - cm) / np.linalg.norm(v - cm) for v in verts3]
            a = math.acos(min(1, max(-1, np.dot(proj[0], proj[1]))))
            b = math.acos(min(1, max(-1, np.dot(proj[0], proj[2]))))
            c = math.acos(min(1, max(-1, np.dot(proj[1], proj[2]))))
            s = (a + b + c) / 2
            return 4 * math.atan(math.sqrt(max(
                math.tan(s / 2) * math.tan((s - a) / 2)
                * math.tan((s - b) / 2) * math.tan((s - c) / 2), 0.0)))

        tetra = Mesh3D(
            np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]]),
            np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], np.int32))
        meshes = [tetra, unit_cube(),
                  Mesh3D(unit_cube().vertices * [1.0, 1.0, 4.0],
                         unit_cube().triangles)]
        for m in meshes:
            cm = m.center_of_mass()
            tris = ConvexHull(m.vertices).simplices
            ours = _spherical_projection_areas(m.vertices, tris, cm)
            want = [ref_proj_area([m.vertices[i] for i in t], cm)
                    for t in tris]
            np.testing.assert_allclose(ours, want, atol=1e-6)
            # projected from an interior point, the triangles tile the sphere
            np.testing.assert_allclose(ours.sum(), 4 * np.pi, rtol=1e-9)


@requires_reference
def test_reference_tetrahedron(rng):
    v, f = read_obj(f"{REFERENCE_ROOT}/meshpy/test/data/tetrahedron.obj")
    m = Mesh3D(v, f)
    assert m.volume() > 0
    assert m.is_watertight()
    assert len(m.stable_poses()) >= 1


class TestMeshExtras:
    def test_vertex_normals_cube(self):
        m = unit_cube()
        vn = m.vertex_normals()
        assert vn.shape == (8, 3)
        # corner normals point diagonally outward from the center
        center = np.array([0.5, 0.5, 0.5])
        outward = m.vertices - center
        cos = np.sum(vn * outward / np.linalg.norm(outward, axis=1,
                                                   keepdims=True), axis=1)
        assert cos.min() > 0.5

    def test_ray_intersections(self):
        m = unit_cube()
        hits = m.ray_intersections([0.5, 0.5, -1.0], [0, 0, 1.0])
        assert len(hits) == 2  # enters at z=0, exits at z=1
        np.testing.assert_allclose(sorted(h[2] for h in hits), [0.0, 1.0],
                                   atol=1e-9)
        misses = m.ray_intersections([5.0, 5.0, -1.0], [0, 0, 1.0])
        assert len(misses) == 0

    def test_merge(self):
        a = unit_cube()
        b = Mesh3D(unit_cube().vertices + [3.0, 0, 0], unit_cube().triangles)
        m = a.merge(b)
        assert m.volume() == pytest.approx(2.0)
        assert m.is_watertight()

    def test_resting_pose(self):
        m = unit_cube()
        t = np.eye(4)  # identity: -z face already down
        pose = m.resting_pose(t)
        # the chosen face normal (outward) is -z in object coords
        np.testing.assert_allclose(pose["r"][2], [0, 0, 1], atol=1e-9)


def test_sdf_transform_dense():
    from pointnetgpd_tpu.geometry.sdf import (
        make_sdf,
        signed_distance,
        transform_dense,
        world_to_grid,
    )
    import jax.numpy as jnp

    DIM, RES, R = 32, 0.008, 0.06
    origin = -RES * (DIM - 1) / 2.0 * np.ones(3)
    ii, jj, kk = np.meshgrid(*(np.arange(DIM),) * 3, indexing="ij")
    pts = origin + RES * np.stack([ii, jj, kk], axis=-1)
    # off-center sphere so the transform is visible
    c0 = np.array([0.02, 0.0, 0.0])
    sdf = make_sdf(np.linalg.norm(pts - c0, axis=-1) - R, origin, RES)
    shift = np.eye(4)
    shift[:3, 3] = [-0.02, 0.0, 0.0]  # moves the sphere to the origin
    moved = transform_dense(sdf, shift)
    v = float(signed_distance(moved, world_to_grid(moved,
                                                   jnp.asarray([[R, 0.0, 0.0]])))[0])
    assert abs(v) < 2 * RES  # surface now passes through (R, 0, 0)


def test_dedupe_grasps():
    from pointnetgpd_tpu.grasping.samplers import dedupe_grasps

    configs = np.zeros((4, 10), np.float32)
    configs[:, 3:6] = [0, 1, 0]
    configs[1, 0] = 1e-4          # near-duplicate of 0
    configs[2, 0] = 0.05          # distinct center
    configs[3, 3:6] = [1, 0, 0]   # same center as 0, orthogonal axis
    kept = dedupe_grasps(configs, min_dist=0.01)
    assert len(kept) == 3  # rows 0, 2, 3 survive


def test_decimate_preserves_shape():
    m0 = unit_cube().subdivide().subdivide().subdivide()  # 768 tris
    m = m0.decimate(200)
    assert len(m.triangles) <= 200
    assert len(m.triangles) < len(m0.triangles) / 3
    # volume within 15% (vertex clustering is approximate)
    assert abs(m.volume() - 1.0) < 0.15
    lo, hi = m.bounding_box()
    assert np.all(hi - lo > 0.8)


class TestDegenerateMeshes:
    def test_stable_poses_reject_degenerate(self):
        flat = Mesh3D(np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], float),
                      np.array([[0, 1, 2]]))
        with pytest.raises(ValueError, match="non-degenerate solid"):
            flat.stable_poses()
        empty = Mesh3D(np.zeros((0, 3)), np.zeros((0, 3), int))
        with pytest.raises(ValueError):
            empty.stable_poses()

    def test_voxelizer_rejects_empty(self):
        from pointnetgpd_tpu.ops.mesh_to_sdf import mesh_to_sdf

        empty = Mesh3D(np.zeros((0, 3)), np.zeros((0, 3), int))
        with pytest.raises(ValueError, match="vertices and"):
            mesh_to_sdf(empty, dim=16)
