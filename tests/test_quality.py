"""Quality-metric tests, modeled on the reference's test strategy
(reference: dex-net/test/grasping_test.py): randomized force-closure property
tests, analytic min-norm QP cases, and epsilon-metric checks against an
independent scipy/qhull oracle.
"""

import itertools

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.spatial import ConvexHull
from scipy.optimize import minimize

from pointnetgpd_tpu.grasping.quality import (
    closest_point_on_triangle_to_origin,
    ferrari_canny_l1_force_only,
    force_closure,
    force_closure_qp,
    friction_cone,
    grasp_matrix,
    min_norm_in_simplex,
    tangents_from_direction,
    torques_from_forces,
    wrench_in_positive_span,
)

NUM_CASES = 100


def _random_unit(rng, n=3):
    v = rng.randn(n)
    return v / np.linalg.norm(v)


def _perturb_in_cone(rng, axis, max_angle):
    """Random unit vector within max_angle of axis."""
    angle = rng.uniform(0, max_angle)
    # random orthogonal direction
    t = np.cross(axis, _random_unit(rng))
    while np.linalg.norm(t) < 1e-8:
        t = np.cross(axis, _random_unit(rng))
    t /= np.linalg.norm(t)
    return np.cos(angle) * axis + np.sin(angle) * t


class TestForceClosure:
    """Randomized property test equivalent to grasping_test.py:48-160:
    constructed antipodal pairs must be in force closure, pairs violating the
    cone constraint must not."""

    def test_antipodal_pairs_are_force_closure(self):
        rng = np.random.RandomState(0)
        mu = 0.5
        cone = np.arctan(mu)
        for _ in range(NUM_CASES):
            p1 = rng.randn(3) * 0.05
            d = _random_unit(rng)                # line of action p1 -> p2
            p2 = p1 + rng.uniform(0.02, 0.1) * d
            # inward normals within the cone of the line of action
            n1_in = _perturb_in_cone(rng, d, cone * 0.9)
            n2_in = _perturb_in_cone(rng, -d, cone * 0.9)
            fc = force_closure(jnp.asarray(p1), jnp.asarray(-n1_in),
                               jnp.asarray(p2), jnp.asarray(-n2_in), mu)
            assert int(fc) == 1

    def test_non_antipodal_pairs_rejected(self):
        rng = np.random.RandomState(1)
        mu = 0.5
        cone = np.arctan(mu)
        for _ in range(NUM_CASES):
            p1 = rng.randn(3) * 0.05
            d = _random_unit(rng)
            p2 = p1 + rng.uniform(0.02, 0.1) * d
            # first normal violates its cone by a clear margin
            n1_in = _perturb_in_cone(rng, d, cone)
            bad_angle = rng.uniform(cone * 1.2, np.pi / 2)
            t = np.cross(d, _random_unit(rng))
            t /= np.linalg.norm(t)
            n1_in = np.cos(bad_angle) * d + np.sin(bad_angle) * t
            n2_in = _perturb_in_cone(rng, -d, cone * 0.9)
            fc = force_closure(jnp.asarray(p1), jnp.asarray(-n1_in),
                               jnp.asarray(p2), jnp.asarray(-n2_in), mu)
            assert int(fc) == 0

    def test_same_point_rejected(self):
        p = jnp.asarray([0.0, 0.0, 0.0])
        n = jnp.asarray([0.0, 0.0, 1.0])
        assert int(force_closure(p, n, p, -n, 0.5)) == 0

    def test_batched_vmap(self):
        rng = np.random.RandomState(2)
        p1 = rng.randn(32, 3)
        p2 = p1 + np.tile([0, 0, 0.05], (32, 1))
        n1 = np.tile([0, 0, -1.0], (32, 1))  # outward normals facing apart
        n2 = np.tile([0, 0, 1.0], (32, 1))
        fc = jax.vmap(lambda a, b, c, d: force_closure(a, b, c, d, 0.5))(
            jnp.asarray(p1), jnp.asarray(n1), jnp.asarray(p2), jnp.asarray(n2))
        assert np.asarray(fc).tolist() == [1] * 32


class TestMinNormSimplex:
    """Analytic cases from grasping_test.py:197-214."""

    def test_origin_in_hull_is_zero(self):
        # simplex spanning the origin: +-e_i in 3D
        v = jnp.asarray([[1.0, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                         [0, 0, 1], [0, 0, -1]])
        d, _ = min_norm_in_simplex(v)
        assert float(d) < 1e-4

    def test_standard_simplex_uniform(self):
        # 6 standard basis vectors in 6D: min norm point = mean, coeffs 1/6
        v = jnp.eye(6)
        d, x = min_norm_in_simplex(v, num_iters=400)
        np.testing.assert_allclose(float(d), 1.0 / np.sqrt(6), atol=1e-4)
        np.testing.assert_allclose(np.asarray(x), np.full(6, 1 / 6), atol=1e-4)

    def test_single_point(self):
        v = jnp.asarray([[0.3, 0.4, 0.0]])
        d, x = min_norm_in_simplex(v)
        np.testing.assert_allclose(float(d), 0.5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(x), [1.0])

    def test_batch_matches_per_grasp(self):
        # the SoA lane-packed batch QP is the same FISTA iteration as the
        # per-set function — outputs must agree to reduction-order rounding
        from pointnetgpd_tpu.grasping import min_norm_in_simplex_batch
        rng = np.random.RandomState(11)
        for n, d in [(16, 6), (6, 6), (7, 3), (1, 6)]:
            v = jnp.asarray(rng.randn(13, n, d) * rng.uniform(0.1, 3.0))
            d_batch, x_batch = min_norm_in_simplex_batch(v, num_iters=300)
            d_ref, x_ref = jax.vmap(
                lambda vv: min_norm_in_simplex(vv, num_iters=300))(v)
            np.testing.assert_allclose(np.asarray(d_batch), np.asarray(d_ref),
                                       atol=1e-5)
            np.testing.assert_allclose(np.asarray(x_batch), np.asarray(x_ref),
                                       atol=1e-4)

    def test_matches_scipy_qp(self):
        rng = np.random.RandomState(3)
        for _ in range(20):
            v = rng.randn(7, 6)
            d_ours, _ = min_norm_in_simplex(jnp.asarray(v), num_iters=800)
            # scipy oracle: same QP
            def obj(x):
                y = v.T @ x
                return y @ y
            cons = ({"type": "eq", "fun": lambda x: np.sum(x) - 1},)
            res = minimize(obj, np.full(7, 1 / 7), bounds=[(0, 1)] * 7,
                           constraints=cons, method="SLSQP",
                           options={"ftol": 1e-12, "maxiter": 500})
            np.testing.assert_allclose(float(d_ours), np.sqrt(max(res.fun, 0)),
                                       atol=2e-3)


class TestTriangleDistance:
    def test_matches_scipy_qp(self):
        rng = np.random.RandomState(4)
        for _ in range(50):
            tri = rng.randn(3, 3)
            d_ours = float(closest_point_on_triangle_to_origin(
                jnp.asarray(tri[0]), jnp.asarray(tri[1]), jnp.asarray(tri[2])))

            def obj(x):
                y = tri.T @ x
                return y @ y
            cons = ({"type": "eq", "fun": lambda x: np.sum(x) - 1},)
            res = minimize(obj, np.full(3, 1 / 3), bounds=[(0, 1)] * 3,
                           constraints=cons, method="SLSQP",
                           options={"ftol": 1e-14, "maxiter": 500})
            np.testing.assert_allclose(d_ours, np.sqrt(max(res.fun, 0)), atol=1e-6)


class TestFerrariCanny:
    def test_octahedron_analytic(self):
        """Hull = regular octahedron radius r: facet distance = r/sqrt(3)."""
        r = 2.0
        pts = r * np.asarray([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                              [0, 0, 1], [0, 0, -1]], dtype=np.float64)
        eps = float(ferrari_canny_l1_force_only(jnp.asarray(pts)))
        np.testing.assert_allclose(eps, r / np.sqrt(3), atol=1e-6)

    def test_origin_outside_is_zero(self):
        pts = np.asarray([[1, 0, 0], [2, 0, 0], [1, 1, 0], [1, 0, 1],
                          [2, 1, 1]], dtype=np.float64)
        assert float(ferrari_canny_l1_force_only(jnp.asarray(pts))) == 0.0

    def test_degenerate_coplanar_is_zero(self):
        pts = np.asarray([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0]],
                         dtype=np.float64)  # all z=0
        assert float(ferrari_canny_l1_force_only(jnp.asarray(pts))) == 0.0

    def test_matches_qhull_oracle(self):
        """Random point sets containing the origin: our supporting-triple
        enumeration must equal min over qhull facets of triangle distance."""
        rng = np.random.RandomState(5)
        for _ in range(25):
            pts = rng.randn(16, 3)
            pts -= pts.mean(axis=0) * 1.2  # usually keeps origin inside
            hull = ConvexHull(pts)
            inside = np.all(
                hull.equations[:, :3] @ np.zeros(3) + hull.equations[:, 3] < 0)
            ours = float(ferrari_canny_l1_force_only(jnp.asarray(pts)))
            if not inside:
                assert ours == 0.0
                continue
            oracle = min(
                float(closest_point_on_triangle_to_origin(
                    jnp.asarray(pts[s[0]]), jnp.asarray(pts[s[1]]),
                    jnp.asarray(pts[s[2]])))
                for s in hull.simplices)
            np.testing.assert_allclose(ours, oracle, atol=1e-8)

    def test_batched_vmap(self):
        rng = np.random.RandomState(6)
        pts = rng.randn(8, 12, 3)
        pts -= pts.mean(axis=1, keepdims=True)
        out = jax.vmap(ferrari_canny_l1_force_only)(jnp.asarray(pts))
        assert out.shape == (8,)
        assert np.all(np.asarray(out) >= 0)


class TestGraspMatrixAndCones:
    def test_friction_cone_geometry(self):
        """Tangent component magnitude == mu (grasping_test.py:260-315 idea)."""
        mu = 0.7
        normal_in = jnp.asarray([0.3, -0.5, 0.8]) / np.linalg.norm([0.3, -0.5, 0.8])
        cone = np.asarray(friction_cone(normal_in, mu, num_cone_faces=8))
        n = np.asarray(normal_in)
        for edge in cone:
            normal_part = edge @ n
            tangent = edge - normal_part * n
            np.testing.assert_allclose(normal_part, 1.0, atol=1e-6)
            np.testing.assert_allclose(np.linalg.norm(tangent), mu, atol=1e-6)

    def test_tangent_frame_right_handed(self):
        d, v, w = tangents_from_direction(jnp.asarray([0.0, 0.0, -1.0]))
        d, v, w = map(np.asarray, (d, v, w))
        np.testing.assert_allclose(np.cross(v, w), d, atol=1e-7)
        np.testing.assert_allclose([v @ d, w @ d, v @ w], [0, 0, 0], atol=1e-7)

    def test_torques(self):
        arm = jnp.asarray([1.0, 0.0, 0.0])
        forces = jnp.asarray([[0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
        t = np.asarray(torques_from_forces(arm, forces))
        np.testing.assert_allclose(t, [[0, 0, 1], [0, -1, 0]], atol=1e-8)

    def test_grasp_matrix_shapes_and_scaling(self):
        f = jnp.asarray(np.random.RandomState(0).randn(16, 3))
        t = jnp.asarray(np.random.RandomState(1).randn(16, 3))
        n = jnp.asarray(np.random.RandomState(2).randn(2, 3))
        g = grasp_matrix(f, t, n, torque_scaling=2.0)
        assert g.shape == (6, 16)
        np.testing.assert_allclose(np.asarray(g[3:, :]).T, 2.0 * np.asarray(t),
                                   atol=1e-7)
        g_soft = grasp_matrix(f, t, n, torque_scaling=2.0, soft_fingers=True)
        assert g_soft.shape == (6, 20)
        # torsion columns: +- pi r^2 mu n * scaling in the torque rows
        np.testing.assert_allclose(np.asarray(g_soft[:3, 16:]), 0.0)

    def test_force_closure_qp_opposing_cones(self):
        """Two opposing friction cones span the origin -> closure = 1."""
        mu = 0.5
        c1 = friction_cone(jnp.asarray([0.0, 0.0, 1.0]), mu)
        c2 = friction_cone(jnp.asarray([0.0, 0.0, -1.0]), mu)
        forces = jnp.concatenate([c1, c2])
        arms = jnp.concatenate([
            jnp.tile(jnp.asarray([0.0, 0.0, -0.02]), (8, 1)),
            jnp.tile(jnp.asarray([0.0, 0.0, 0.02]), (8, 1)),
        ])
        torques = jnp.cross(arms, forces)
        g = grasp_matrix(forces, torques, jnp.zeros((2, 3)), torque_scaling=1.0)
        assert int(force_closure_qp(g.T, num_iters=600)) == 1

    def test_force_closure_qp_single_cone_open(self):
        mu = 0.3
        c1 = friction_cone(jnp.asarray([0.0, 0.0, 1.0]), mu)
        arms = jnp.tile(jnp.asarray([0.0, 0.0, -0.02]), (8, 1))
        g = grasp_matrix(c1, jnp.cross(arms, c1), jnp.zeros((1, 3)))
        assert int(force_closure_qp(g.T, num_iters=600)) == 0


class TestWrenchInPositiveSpan:
    def test_in_span(self):
        basis = jnp.asarray(np.eye(6)[:3])  # e1, e2, e3 rows
        target = jnp.asarray([0.5, 0.2, 0.0, 0.0, 0.0, 0.0])
        ok, norm = wrench_in_positive_span(basis, target, force_limit=10.0,
                                           num_fingers=1)
        assert bool(ok)

    def test_out_of_span(self):
        basis = jnp.asarray(np.eye(6)[:3])
        target = jnp.asarray([-0.5, 0.0, 0.0, 0.0, 0.0, 0.0])  # needs -e1
        ok, _ = wrench_in_positive_span(basis, target, force_limit=10.0,
                                        num_fingers=1)
        assert not bool(ok)

    def test_force_limit_binds(self):
        basis = jnp.asarray(np.eye(6)[:1])  # only e1
        target = jnp.asarray([5.0, 0.0, 0.0, 0.0, 0.0, 0.0])
        ok, _ = wrench_in_positive_span(basis, target, force_limit=1.0,
                                        num_fingers=1)
        assert not bool(ok)
        ok2, _ = wrench_in_positive_span(basis, target, force_limit=10.0,
                                         num_fingers=1)
        assert bool(ok2)
