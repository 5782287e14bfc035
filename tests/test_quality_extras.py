"""Spectral quality metrics, partial closure/wrench resistance wrappers,
grasp endpoint/table-alignment math, stable-pose-aligned sampling."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pointnetgpd_tpu.grasping.quality import (
    grasp_isotropy,
    min_singular,
    partial_closure,
    wrench_resistance,
    wrench_volume,
)


class TestSpectralMetrics:
    def test_min_singular_identity(self):
        g = jnp.eye(6)
        np.testing.assert_allclose(float(min_singular(g)), 1.0, atol=1e-6)

    def test_isotropy(self):
        g = jnp.diag(jnp.asarray([4.0, 2.0, 1.0, 1.0, 1.0, 1.0]))
        np.testing.assert_allclose(float(grasp_isotropy(g)), 0.25, atol=1e-6)
        assert float(grasp_isotropy(jnp.zeros((6, 4)))) == 0.0

    def test_wrench_volume(self):
        g = jnp.diag(jnp.asarray([2.0, 2.0, 2.0, 2.0, 2.0, 2.0]))
        np.testing.assert_allclose(float(wrench_volume(g)),
                                   np.sqrt(2.0 ** 6), atol=1e-5)

    def test_partial_closure_and_resistance(self):
        basis = jnp.asarray(np.eye(6)[:3])  # e1, e2, e3 per one finger
        target = jnp.asarray([0.4, 0.0, 0.0, 0.0, 0.0, 0.0])
        assert int(partial_closure(basis, target, 10.0, 1)) == 1
        assert int(partial_closure(basis, -target, 10.0, 1)) == 0
        r = float(wrench_resistance(basis, target, 10.0, 1))
        assert r > 0
        assert float(wrench_resistance(basis, -target, 10.0, 1)) == 0.0


class TestGraspFrameExtras:
    def test_grasp_from_endpoints(self):
        from pointnetgpd_tpu.grasping.grasp import (
            endpoints,
            grasp_from_endpoints,
        )

        g1 = jnp.asarray([0.0, -0.04, 0.0])
        g2 = jnp.asarray([0.0, 0.04, 0.0])
        cfg = grasp_from_endpoints(g1, g2)
        e1, e2 = endpoints(cfg)
        np.testing.assert_allclose(np.asarray(e1), np.asarray(g1), atol=1e-7)
        np.testing.assert_allclose(np.asarray(e2), np.asarray(g2), atol=1e-7)
        np.testing.assert_allclose(float(cfg[6]), 0.08, atol=1e-7)

    def test_perpendicular_table_points_down(self):
        from pointnetgpd_tpu.grasping.grasp import (
            perpendicular_table,
            rotated_full_axis,
        )

        rng = np.random.RandomState(0)
        r_table = jnp.eye(3)  # table frame == world, z up
        for _ in range(20):
            axis = rng.randn(3)
            axis /= np.linalg.norm(axis)
            cfg = jnp.asarray(np.concatenate([np.zeros(3), axis,
                                              [0.08, 0.3, 0, 0]]),
                              jnp.float32)
            aligned = perpendicular_table(cfg, r_table)
            approach = np.asarray(
                rotated_full_axis(aligned[3:6], aligned[7]))[:, 0]
            # the optimized angle minimizes the z-component: check against a
            # dense sweep
            best = min(
                np.asarray(rotated_full_axis(cfg[3:6], jnp.float32(t)))[2, 0]
                for t in np.linspace(-np.pi, np.pi, 721))
            assert approach[2] <= best + 1e-3

    def test_parallel_table_zeroes_z(self):
        from pointnetgpd_tpu.grasping.grasp import (
            parallel_table,
            rotated_full_axis,
        )

        rng = np.random.RandomState(1)
        for _ in range(20):
            axis = rng.randn(3)
            axis /= np.linalg.norm(axis)
            cfg = jnp.asarray(np.concatenate([np.zeros(3), axis,
                                              [0.08, 0.0, 0, 0]]),
                              jnp.float32)
            aligned = parallel_table(cfg, jnp.eye(3))
            approach = np.asarray(
                rotated_full_axis(aligned[3:6], aligned[7]))[:, 0]
            assert abs(approach[2]) < 1e-5

    def test_grasp_angles_from_stp(self):
        from pointnetgpd_tpu.grasping.grasp import grasp_angles_from_stp_z

        cfg = jnp.asarray(np.concatenate([np.zeros(3), [0, 1.0, 0],
                                          [0.08, 0.0, 0, 0]]), jnp.float32)
        psi, phi, nu = grasp_angles_from_stp_z(cfg, jnp.eye(3))
        # axis = +y: angle vs z is 90 deg
        np.testing.assert_allclose(float(psi), np.pi / 2, atol=1e-5)
        assert 0 <= float(phi) <= np.pi / 2


class TestStablePoseSampling:
    def test_aligned_grasps_perpendicular(self):
        from pointnetgpd_tpu.geometry.sdf import make_sdf
        from pointnetgpd_tpu.grasping.grasp import rotated_full_axis
        from pointnetgpd_tpu.grasping.samplers import (
            sample_grasps_stable_poses,
        )

        DIM, RES, R = 40, 0.005, 0.06
        origin = -RES * (DIM - 1) / 2 * np.ones(3)
        ii, jj, kk = np.meshgrid(*(np.arange(DIM),) * 3, indexing="ij")
        pts = origin + RES * np.stack([ii, jj, kk], axis=-1)
        sphere = make_sdf(np.linalg.norm(pts, axis=-1) - R, origin, RES)

        poses = [{"r": np.eye(3), "x0": np.zeros(3), "p": 1.0}]
        out = sample_grasps_stable_poses(
            sphere, jax.random.PRNGKey(0), poses, max_width=0.18,
            num_wanted=4, friction_coef=2.0, num_attempts=32,
            num_samples_loa=48)
        configs = out[0]
        assert len(configs) >= 1
        for cfg in configs:
            approach = np.asarray(rotated_full_axis(
                jnp.asarray(cfg[3:6]), jnp.float32(cfg[7])))[:, 0]
            # perpendicular alignment: approach z-component at its sweep min
            sweep = [np.asarray(rotated_full_axis(
                jnp.asarray(cfg[3:6]), jnp.float32(t)))[2, 0]
                for t in np.linspace(-np.pi, np.pi, 181)]
            assert approach[2] <= min(sweep) + 1e-3


class TestConfigRoundTrip:
    def test_configuration_round_trip(self):
        """(grasping_test.py:98-127): params -> configuration -> params."""
        from pointnetgpd_tpu.grasping.grasp import (
            configuration_from_params,
            params_from_configuration,
        )

        rng = np.random.RandomState(0)
        for _ in range(20):
            center = jnp.asarray(rng.randn(3) * 0.05)
            axis = rng.randn(3)
            axis = jnp.asarray(axis / np.linalg.norm(axis))
            cfg = configuration_from_params(center, axis, 0.08, 0.3, 0.01,
                                            0.002)
            c2, a2, w2, ang2, jw2, mw2 = params_from_configuration(cfg)
            np.testing.assert_allclose(np.asarray(c2), np.asarray(center),
                                       atol=1e-7)
            np.testing.assert_allclose(np.asarray(a2), np.asarray(axis),
                                       atol=1e-7)
            assert float(w2) == pytest.approx(0.08)
            assert float(ang2) == pytest.approx(0.3)
            assert float(jw2) == pytest.approx(0.01)
            assert float(mw2) == pytest.approx(0.002)


class TestVacuumPoint:
    """VacuumPoint configuration round-trip + guards (grasp.py:969-1020)."""

    def test_round_trip_and_guards(self):
        from pointnetgpd_tpu.grasping import (
            vacuum_configuration_from_params,
            vacuum_params_from_configuration,
        )

        cfg = vacuum_configuration_from_params([0.1, -0.02, 0.2], [0, 0, 1.0])
        c, a = vacuum_params_from_configuration(cfg)
        np.testing.assert_allclose(c, [0.1, -0.02, 0.2])
        np.testing.assert_allclose(a, [0, 0, 1.0])
        with pytest.raises(ValueError):
            vacuum_configuration_from_params([0, 0, 0], [0, 0, 2.0])
        with pytest.raises(ValueError):
            vacuum_params_from_configuration(np.zeros(5))
        with pytest.raises(ValueError):
            vacuum_params_from_configuration(
                np.array([0, 0, 0, 0, 0, 0.5]))


class TestWrenchSpanOracle:
    """wrench_in_positive_span vs a scipy SLSQP oracle on random instances:
    min ||B^T x - w|| s.t. x >= 0, per-finger sum(x) <= F."""

    def test_matches_slsqp_on_random_instances(self):
        from scipy.optimize import minimize

        from pointnetgpd_tpu.grasping.quality import wrench_in_positive_span

        rng = np.random.RandomState(0)
        for trial in range(8):
            n_fingers = rng.choice([1, 2])
            per = 4
            m = n_fingers * per
            basis = rng.randn(m, 6)
            target = rng.randn(6) * rng.choice([0.5, 3.0])
            flimit = 2.0

            ok, lam = wrench_in_positive_span(
                jnp.asarray(basis), jnp.asarray(target), flimit,
                int(n_fingers), num_iters=2000)

            def obj(x):
                r = basis.T @ x - target
                return float(r @ r)

            cons = [{"type": "ineq",
                     "fun": (lambda x, i=i: flimit
                             - np.sum(x[i * per:(i + 1) * per]))}
                    for i in range(n_fingers)]
            best = None
            for _ in range(4):  # multistart
                x0 = np.abs(rng.randn(m)) * 0.1
                res = minimize(obj, x0, method="SLSQP",
                               bounds=[(0, None)] * m, constraints=cons,
                               options={"maxiter": 300, "ftol": 1e-12})
                if best is None or res.fun < best:
                    best = res.fun
            # the in-span decision thresholds the optimal squared residual
            # at wrench_norm_thresh=1e-4; FISTA must agree with the oracle
            in_span_oracle = best < 1e-4
            assert bool(ok) == in_span_oracle, (trial, best, bool(ok))


class TestFerrariCanny6DDevice:
    """Device-native 6-D epsilon metric (multi-start facet descent) vs the
    host qhull path, on realistic grasp wrench sets."""

    @staticmethod
    def _wrench_set(rng, extra_contacts=1, cone_faces=8, mu=0.5,
                    torque_scale=10.0):
        """Friction-cone wrench rows: an antipodal contact pair (+noise)
        plus extra random sphere contacts — the same cone/torque rows
        grasp_matrix consumers build; 3 contacts give full-rank wrench
        hulls with the origin interior (measured host eps ~0.04-0.06)."""
        rows = []
        p = rng.randn(3)
        p = 0.05 * p / np.linalg.norm(p)
        pts = [p, -p]
        for _ in range(extra_contacts):
            q = rng.randn(3)
            pts.append(0.05 * q / np.linalg.norm(q))
        for pt in pts:
            n = -pt / np.linalg.norm(pt) + 0.1 * rng.randn(3)
            n = n / np.linalg.norm(n)
            t1 = np.cross(n, [1.0, 0, 0])
            if np.linalg.norm(t1) < 1e-6:
                t1 = np.cross(n, [0, 1.0, 0])
            t1 /= np.linalg.norm(t1)
            t2 = np.cross(n, t1)
            for j in range(cone_faces):
                th = 2 * np.pi * j / cone_faces
                f = n + mu * (np.cos(th) * t1 + np.sin(th) * t2)
                tau = np.cross(pt, f) * torque_scale
                rows.append(np.concatenate([f, tau]))
        return np.asarray(rows, np.float32)

    @pytest.mark.slow
    def test_matches_host_qhull_path(self):
        from pointnetgpd_tpu.grasping.quality import (
            ferrari_canny_l1, ferrari_canny_l1_device,
        )

        rng = np.random.RandomState(0)
        checked = 0
        for trial in range(10):
            g6 = self._wrench_set(rng, extra_contacts=1 + trial % 2)
            host = float(ferrari_canny_l1(g6))
            dev = float(ferrari_canny_l1_device(g6))
            if host <= 1e-3:
                # origin outside / marginal: both must report ~0
                assert dev <= 2e-3, (trial, host, dev)
            else:
                checked += 1
                assert abs(dev - host) <= 0.05 * host + 1e-4, \
                    (trial, host, dev)
        assert checked >= 5  # enough nonzero cases exercised

    def test_origin_outside_is_zero(self):
        from pointnetgpd_tpu.grasping.quality import ferrari_canny_l1_device

        rng = np.random.RandomState(1)
        g6 = rng.rand(16, 6).astype(np.float32) + 1.0  # all-positive orthant
        assert float(ferrari_canny_l1_device(g6)) == 0.0

    def test_simplex_exact(self):
        """Regular cross-polytope: epsilon is the distance to a facet of
        conv(+-e_i) = 1/sqrt(6), known in closed form."""
        from pointnetgpd_tpu.grasping.quality import ferrari_canny_l1_device

        g6 = np.concatenate([np.eye(6), -np.eye(6)]).astype(np.float32)
        dev = float(ferrari_canny_l1_device(g6))
        assert abs(dev - 1.0 / np.sqrt(6)) < 2e-3, dev

    def test_fewer_rows_than_dims_is_zero(self):
        """M < 6 wrench rows: no 6-D hull interior exists — must return 0
        like the host path (whose qhull failure is caught), not crash
        (regression: `0 % 0` in the empty subset enumeration)."""
        from pointnetgpd_tpu.grasping.quality import ferrari_canny_l1_device

        rng = np.random.RandomState(2)
        for m in (1, 3, 5):
            g6 = rng.randn(m, 6).astype(np.float32)
            assert float(ferrari_canny_l1_device(g6)) == 0.0, m

    def test_oversized_wrench_set_raises(self):
        """M > 40 rows: C(M,6) facet enumeration would hang/OOM the host
        (C(64,6)=75M subsets) — must fail loudly with a pointer to the
        host-qhull path, not silently churn."""
        from pointnetgpd_tpu.grasping.quality import ferrari_canny_l1_device

        g6 = np.random.RandomState(3).randn(64, 6).astype(np.float32)
        with pytest.raises(ValueError, match="host-qhull"):
            ferrari_canny_l1_device(g6)

    def test_jit_matches_eager(self):
        """Under jit the lax.cond path must agree with the eager path on
        both accepted and rejected wrench sets (round-3 verdict: the skip
        was eager-only)."""
        from pointnetgpd_tpu.grasping.quality import ferrari_canny_l1_device

        rng = np.random.RandomState(5)
        jitted = jax.jit(ferrari_canny_l1_device)
        good = self._wrench_set(rng, extra_contacts=1)
        bad = (rng.rand(*good.shape) + 1.0).astype(np.float32)  # origin out
        for g6 in (good, bad):
            eager = float(ferrari_canny_l1_device(g6))
            assert abs(float(jitted(g6)) - eager) < 1e-5

    def test_jit_lowering_keeps_the_skip_a_real_branch(self):
        """The traced path must lower to an HLO conditional (a rejected
        grasp pays only the min-norm QP), not a select that runs the
        C(M,6) enumeration unconditionally."""
        from pointnetgpd_tpu.grasping.quality import ferrari_canny_l1_device

        g6 = self._wrench_set(np.random.RandomState(6))
        txt = jax.jit(ferrari_canny_l1_device).lower(g6).as_text()
        assert "cond" in txt or "conditional" in txt

    def test_batch_matches_per_grasp(self):
        """ferrari_canny_l1_device_batch (lax.map + cond) == the eager
        per-grasp loop, including the valid mask."""
        from pointnetgpd_tpu.grasping.quality import (
            ferrari_canny_l1_device, ferrari_canny_l1_device_batch,
        )

        rng = np.random.RandomState(7)
        sets = [self._wrench_set(rng, extra_contacts=1) for _ in range(3)]
        sets.append((rng.rand(*sets[0].shape) + 1.0).astype(np.float32))
        g6b = np.stack(sets)
        valid = np.array([True, True, False, True])
        out = np.asarray(ferrari_canny_l1_device_batch(g6b, valid))
        expect = [float(ferrari_canny_l1_device(s)) if v else 0.0
                  for s, v in zip(sets, valid)]
        np.testing.assert_allclose(out, expect, atol=1e-5)
        assert out[0] > 0  # at least the antipodal sets are nonzero
        assert out[3] == 0.0  # origin-outside set rejected by the guards

    def test_non_closure_eager_early_out_skips_enumeration(self, monkeypatch):
        """An eagerly-called non-force-closure wrench set (origin outside
        the hull) must return 0 WITHOUT dispatching the C(M,6) facet
        enumeration — the dominant cost of per-grasp labeling loops."""
        from pointnetgpd_tpu.grasping import quality

        called = []
        monkeypatch.setattr(
            quality, "_boundary_distance_6d",
            lambda *a, **k: called.append(1) or jnp.float32(1.0))
        # all rows in the +x half-space: origin strictly outside the hull
        g6 = (np.random.RandomState(4).rand(24, 6) + 1.0).astype(np.float32)
        assert float(quality.ferrari_canny_l1_device(g6)) == 0.0
        assert not called


class TestEvaluate6DLabels:
    """Batched full 6-D Ferrari-Canny labeling on an analytic sphere —
    the dataset-generation hot loop with torque rows included
    (generate-dataset-canny.py:109-133)."""

    def test_sphere_grasps_get_nonzero_6d_labels(self):
        from pointnetgpd_tpu.geometry.sdf import make_sdf
        from pointnetgpd_tpu.grasping.evaluation import (
            evaluate_ferrari_canny, evaluate_ferrari_canny_6d,
        )
        from pointnetgpd_tpu.grasping.samplers import antipodal_sample_grasps

        dim, res, r = 40, 0.005, 0.06
        origin = -res * (dim - 1) / 2 * np.ones(3)
        ii, jj, kk = np.meshgrid(*(np.arange(dim),) * 3, indexing="ij")
        pts = origin + res * np.stack([ii, jj, kk], axis=-1)
        sphere = make_sdf(np.linalg.norm(pts, axis=-1) - r, origin, res)

        out = antipodal_sample_grasps(
            sphere, jax.random.PRNGKey(0), max_width=0.18, friction_coef=2.0,
            num_attempts=32, num_samples_loa=48)
        quals, contacts = evaluate_ferrari_canny_6d(
            sphere, out.configs, np.zeros(3), 2.0, num_samples=48,
            torque_scaling=10.0)
        q = np.asarray(quals)
        valid = np.asarray(out.valid)
        found = np.asarray(contacts.found)
        assert q.shape == (out.configs.shape[0],)
        assert (q >= 0).all() and np.isfinite(q).all()
        # sampler-accepted grasps on a sphere are strong closures: most get
        # a nonzero 6-D epsilon
        assert q[valid].size >= 3 and (q[valid] > 0).mean() > 0.5
        # no contacts -> no quality
        assert (q[~found] == 0).all()
        # the 6-D epsilon is bounded above by the force-only epsilon on the
        # same contacts (adding torque rows can only move the hull boundary
        # toward the origin in the force subspace... not strictly: torque
        # rows change the geometry entirely — instead just sanity-check the
        # force-only labels agree on WHICH grasps are nonzero)
        q3, _ = evaluate_ferrari_canny(sphere, out.configs, np.zeros(3), 2.0,
                                       num_samples=48)
        q3 = np.asarray(q3)
        both = valid & found
        agree = ((q[both] > 0) == (q3[both] > 0)).mean()
        assert agree > 0.7
