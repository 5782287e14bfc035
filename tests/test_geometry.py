"""Geometry-core tests: SDF lookups/gradients/normals against an analytic
sphere SDF, .sdf file round-trip, and the reference OBJ fixtures.

The reference Sdf3D cannot be imported as an oracle here (its autolab_core
dependency is absent), so the oracle is analytic geometry: for a sphere SDF,
distances, gradients, and surface normals have closed forms.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pointnetgpd_tpu.geometry.io import read_obj, read_sdf, write_obj, write_sdf
from pointnetgpd_tpu.geometry.sdf import (
    SdfGrid,
    grid_to_world,
    gradient,
    is_out_of_bounds,
    make_sdf,
    on_surface,
    rescale,
    signed_distance,
    surface_normal,
    world_to_grid,
)

from conftest import REFERENCE_ROOT, requires_reference

DIM = 48
RES = 0.005
CENTER_W = np.array([0.0, 0.0, 0.0])
RADIUS = 0.08


@pytest.fixture(scope="module")
def sphere_sdf():
    """Dense SDF of a sphere: d(x) = ||x - c|| - r, exactly representable."""
    origin = CENTER_W - RES * (DIM - 1) / 2.0
    ii, jj, kk = np.meshgrid(*(np.arange(DIM),) * 3, indexing="ij")
    pts = origin + RES * np.stack([ii, jj, kk], axis=-1)
    data = np.linalg.norm(pts - CENTER_W, axis=-1) - RADIUS
    return make_sdf(data, origin, RES)


class TestSignedDistance:
    def test_exact_at_grid_points(self, sphere_sdf):
        coords = jnp.asarray([[10.0, 20.0, 30.0], [0.0, 0.0, 0.0]])
        v = np.asarray(signed_distance(sphere_sdf, coords))
        pts = np.asarray(grid_to_world(sphere_sdf, coords))
        expected = np.linalg.norm(pts - CENTER_W, axis=-1) - RADIUS
        np.testing.assert_allclose(v, expected, atol=1e-6)

    def test_trilinear_interpolation_error_small(self, sphere_sdf):
        rng = np.random.RandomState(0)
        coords = jnp.asarray(rng.uniform(5, DIM - 6, size=(500, 3)))
        v = np.asarray(signed_distance(sphere_sdf, coords))
        pts = np.asarray(grid_to_world(sphere_sdf, coords))
        exact = np.linalg.norm(pts - CENTER_W, axis=-1) - RADIUS
        # sphere SDF curvature bounds trilinear error by O(res^2 / r)
        assert np.abs(v - exact).max() < RES * RES / RADIUS * 4

    def test_out_of_bounds_fallback(self, sphere_sdf):
        """OOB lookups = grid distance to nearest surface cell (in world
        units) + its sdf value (sdf.py:299-306 semantics)."""
        far = jnp.asarray([[-20.0, 24.0, 24.0]])
        v = float(signed_distance(sphere_sdf, far)[0])
        assert v > 0  # clearly outside the object
        # must exceed the distance from the grid border to the surface
        assert v > RADIUS / 2

    def test_world_grid_round_trip(self, sphere_sdf):
        pts = jnp.asarray(np.random.RandomState(1).randn(10, 3) * 0.05)
        back = grid_to_world(sphere_sdf, world_to_grid(sphere_sdf, pts))
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-7)

    def test_on_surface(self, sphere_sdf):
        # a grid point near the sphere surface
        g = world_to_grid(sphere_sdf, jnp.asarray([[RADIUS, 0.0, 0.0]]))
        on, val = on_surface(sphere_sdf, g)
        assert bool(on[0])
        assert abs(float(val[0])) < float(sphere_sdf.surface_thresh)

    def test_out_of_bounds_flag(self, sphere_sdf):
        coords = jnp.asarray([[-1.0, 0, 0], [0, 0, 0], [DIM - 1.0, 0, 0],
                              [float(DIM), 0, 0]])
        oob = np.asarray(is_out_of_bounds(sphere_sdf, coords))
        assert oob.tolist() == [True, False, False, True]


class TestGradientsAndNormals:
    def test_gradient_is_radial(self, sphere_sdf):
        rng = np.random.RandomState(2)
        coords = jnp.asarray(rng.uniform(8, DIM - 9, size=(200, 3)))
        g = np.asarray(gradient(sphere_sdf, coords))
        pts = np.asarray(grid_to_world(sphere_sdf, coords))
        radial = pts - CENTER_W
        radial /= np.linalg.norm(radial, axis=-1, keepdims=True)
        # np.gradient returns d(sdf)/d(grid index) = RES * d/dx
        g_unit = g / np.maximum(np.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
        cos = np.sum(g_unit * radial, axis=-1)
        assert cos.min() > 0.99

    def test_surface_normal_outward_radial(self, sphere_sdf):
        # surface points on the sphere in several directions
        dirs = np.asarray([[1, 0, 0], [0, 1, 0], [0, 0, 1],
                           [-1, 0, 0], [0.6, 0.8, 0], [0.577, 0.577, 0.577]])
        pts_w = CENTER_W + RADIUS * dirs
        coords = world_to_grid(sphere_sdf, jnp.asarray(pts_w))
        normals, valid = surface_normal(sphere_sdf, coords)
        normals, valid = np.asarray(normals), np.asarray(valid)
        assert valid.all()
        cos = np.sum(normals * dirs / np.linalg.norm(dirs, axis=1, keepdims=True),
                     axis=-1)
        assert cos.min() > 0.97  # outward and radial

    def test_surface_normal_invalid_off_surface(self, sphere_sdf):
        coords = world_to_grid(sphere_sdf, jnp.asarray([[0.0, 0.0, 0.0]]))  # center
        _, valid = surface_normal(sphere_sdf, coords)
        assert not bool(valid[0])


class TestRescaleAndIO:
    def test_rescale(self, sphere_sdf):
        big = rescale(sphere_sdf, 2.0)
        g = world_to_grid(big, jnp.asarray([[2 * RADIUS, 0.0, 0.0]]))
        on, _ = on_surface(big, g)
        assert bool(on[0])

    def test_sdf_file_round_trip(self, sphere_sdf, tmp_path):
        path = str(tmp_path / "sphere.sdf")
        write_sdf(path, sphere_sdf)
        loaded = read_sdf(path)
        np.testing.assert_allclose(np.asarray(loaded.data),
                                   np.asarray(sphere_sdf.data), atol=1e-5)
        np.testing.assert_allclose(np.asarray(loaded.origin),
                                   np.asarray(sphere_sdf.origin), atol=1e-7)
        assert float(loaded.resolution) == pytest.approx(RES)

    def test_obj_round_trip(self, tmp_path):
        verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                           dtype=np.float64)
        faces = np.asarray([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]],
                           dtype=np.int32)
        path = str(tmp_path / "tet.obj")
        write_obj(path, verts, faces)
        v2, f2 = read_obj(path)
        np.testing.assert_allclose(v2, verts)
        np.testing.assert_array_equal(f2, faces)

    @requires_reference
    def test_reference_tetrahedron_fixture(self):
        """The meshpy test fixture must parse: 4 vertices, 4 triangles
        (reference: meshpy/test/mesh_test.py uses the same file)."""
        v, f = read_obj(f"{REFERENCE_ROOT}/meshpy/test/data/tetrahedron.obj")
        assert v.shape == (4, 3)
        assert f.shape == (4, 3)
        assert f.min() == 0 and f.max() == 3
