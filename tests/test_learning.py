"""Learning-layer tests, modeled on the reference's suite
(dex-net/test/learning_test.py: bandits must converge to the best candidate)
plus tensor-dataset round-trips and robust quality MC."""

import numpy as np
import pytest
import jax

from pointnetgpd_tpu.learning import (
    ClassificationResult,
    ConfusionMatrix,
    GaussianUniformAllocationMean,
    MaxIterTerminationCondition,
    RandomBinaryObjective,
    RandomContinuousObjective,
    TensorDataset,
    ThompsonSampling,
    UniformAllocationMean,
)

MAX_ITERS = 4000


def _best_candidate_test(sampler_cls, objective, candidates, best_value):
    sampler = sampler_cls(objective, candidates)
    result = sampler.discrete_maximize(
        MaxIterTerminationCondition(MAX_ITERS), snapshot_rate=1000,
        rng=np.random.RandomState(0))
    assert best_value in result.best_candidates
    assert len(result.models) >= 2  # snapshots recorded


class TestBandits:
    def test_uniform_allocation_converges(self):
        """(learning_test.py:45 idea): uniform allocation finds the candidate
        with the highest Bernoulli success probability."""
        rng = np.random.RandomState(0)
        candidates = list(rng.rand(20) * 0.7)
        candidates.append(0.99)
        _best_candidate_test(UniformAllocationMean,
                             RandomBinaryObjective(np.random.RandomState(1)),
                             candidates, 0.99)

    def test_thompson_sampling_converges(self):
        """(learning_test.py:68)."""
        rng = np.random.RandomState(2)
        candidates = list(rng.rand(20) * 0.7)
        candidates.append(0.99)
        _best_candidate_test(ThompsonSampling,
                             RandomBinaryObjective(np.random.RandomState(3)),
                             candidates, 0.99)

    def test_gaussian_uniform_allocation_converges(self):
        """(learning_test.py:92): continuous objective, Gaussian model."""
        rng = np.random.RandomState(4)
        candidates = list(rng.rand(20) * 0.5)
        candidates.append(2.0)
        _best_candidate_test(
            GaussianUniformAllocationMean,
            RandomContinuousObjective(0.1, np.random.RandomState(5)),
            candidates, 2.0)

    def test_gaussian_model_statistics(self):
        from pointnetgpd_tpu.learning import GaussianModel

        m = GaussianModel(2)
        vals = [1.0, 2.0, 3.0]
        for v in vals:
            m.update(0, v)
        np.testing.assert_allclose(m.means[0], 2.0)
        np.testing.assert_allclose(m.sample_vars[0], np.var(vals))
        np.testing.assert_allclose(m.variances[0], np.var(vals) / 3)


class TestAnalysis:
    def test_confusion_matrix(self):
        cm = ConfusionMatrix(3)
        cm.update([0, 1, 2, 1], [0, 1, 2, 2])
        assert cm.accuracy == 0.75
        assert cm.recall(2) == 0.5
        assert cm.precision(1) == 0.5

    def test_classification_result(self):
        probs = np.array([[0.9, 0.1], [0.2, 0.8], [0.6, 0.4]])
        res = ClassificationResult(probs, [0, 1, 1])
        assert res.accuracy == pytest.approx(2 / 3)
        assert res.top_k_accuracy(2) == 1.0


class TestTensorDataset:
    def test_roundtrip_across_chunks(self, tmp_path):
        config = {"image": {"shape": [4, 4], "dtype": "float32"},
                  "label": {"shape": [], "dtype": "int64"}}
        ds = TensorDataset(str(tmp_path / "ds"), config, datapoints_per_file=3)
        rng = np.random.RandomState(0)
        data = []
        for i in range(8):
            dp = ds.datapoint_template()
            dp["image"] = rng.rand(4, 4).astype(np.float32)
            dp["label"] = np.int64(i)
            data.append(dp)
            ds.add(dp)
        ds.flush()
        assert len(ds) == 8
        # reload from disk
        ds2 = TensorDataset.open(str(tmp_path / "ds"))
        assert len(ds2) == 8
        for i in (0, 3, 7):
            got = ds2.datapoint(i)
            np.testing.assert_array_equal(got["image"], data[i]["image"])
            assert got["label"] == i


class TestRobustQuality:
    def test_expected_quality_on_sphere(self):
        """Robust MC mean of the canny metric on sphere grasps: centered
        grasps must beat strongly offset ones, std finite."""
        from pointnetgpd_tpu.geometry.sdf import make_sdf
        from pointnetgpd_tpu.grasping.robust_quality import expected_quality

        DIM, RES, R = 40, 0.005, 0.05
        origin = -RES * (DIM - 1) / 2 * np.ones(3)
        ii, jj, kk = np.meshgrid(*(np.arange(DIM),) * 3, indexing="ij")
        pts = origin + RES * np.stack([ii, jj, kk], axis=-1)
        sphere = make_sdf(np.linalg.norm(pts, axis=-1) - R, origin, RES)

        good = np.zeros(10, np.float32)
        good[3:6] = [0, 1, 0]
        good[6] = 0.15
        configs = good[None]
        means, stds = expected_quality(
            sphere, configs, np.zeros(3), friction_coef=0.5,
            num_quality_samples=8, num_samples_loa=48,
            rng=np.random.RandomState(0))
        assert means.shape == (1,) and stds.shape == (1,)
        assert means[0] > 0
        assert np.isfinite(stds[0])


class TestCorrelatedBandits:
    """CCBP model + correlated bandits (discrete_adaptive_samplers.py:376-503)."""

    def test_update_spreads_to_neighbors(self):
        from pointnetgpd_tpu.learning import (
            CorrelatedBetaBernoulliModel,
            SquaredExponentialKernel,
        )

        feats = np.array([[0.0], [0.1], [5.0]])
        m = CorrelatedBetaBernoulliModel(
            feats, kernel=SquaredExponentialKernel(0.5), tolerance=1e-2)
        m.update(0, 1.0)
        # the near neighbor (0.1) gains almost as much alpha; the far one none
        assert m.alphas_[0] == pytest.approx(2.0)
        assert 1.9 < m.alphas_[1] < 2.0
        assert m.alphas_[2] == pytest.approx(1.0)  # below tolerance: no update
        np.testing.assert_allclose(m.betas_, 1.0)

    def test_correlated_converges_faster_than_independent(self):
        """On a smooth objective, sharing reward mass across kernel-near arms
        finds the best arm with fewer pulls than independent Thompson."""
        from pointnetgpd_tpu.learning import (
            CorrelatedThompsonSampling,
            MaxIterTerminationCondition,
            SquaredExponentialKernel,
            ThompsonSampling,
        )

        xs = np.linspace(0.0, 1.0, 40)
        probs = np.exp(-((xs - 0.7) ** 2) / 0.02)  # peak at arm ~28
        best_arm = int(np.argmax(probs))

        def run(cls, seed, **kw):
            rng = np.random.RandomState(seed)
            obj = lambda x: float(rng.rand() < probs[
                int(np.searchsorted(xs, x, "left"))])
            bandit = cls(obj, list(xs), **kw)
            res = bandit.discrete_maximize(
                MaxIterTerminationCondition(150), rng=rng)
            return res

        hits_corr = 0
        hits_ind = 0
        for seed in range(5):
            rc = run(CorrelatedThompsonSampling, seed,
                     kernel=SquaredExponentialKernel(0.08), tolerance=1e-3)
            ri = run(ThompsonSampling, seed)
            xc = rc.best_candidates[0]
            xi = ri.best_candidates[0]
            hits_corr += abs(xc - xs[best_arm]) < 0.1
            hits_ind += abs(xi - xs[best_arm]) < 0.1
        assert hits_corr >= hits_ind  # sharing never hurts here
        assert hits_corr >= 4

    def test_bayes_ucb_and_gittins_run(self):
        from pointnetgpd_tpu.learning import (
            CorrelatedBayesUCB,
            CorrelatedGittins,
            MaxIterTerminationCondition,
        )

        rng = np.random.RandomState(0)
        xs = np.linspace(0, 1, 10)
        obj = lambda x: float(rng.rand() < x)
        for cls in (CorrelatedBayesUCB, CorrelatedGittins):
            res = cls(obj, list(xs), tolerance=1e-3).discrete_maximize(
                MaxIterTerminationCondition(60), rng=rng)
            assert res.best_candidates[0] >= 0.5  # found a high arm
            assert len(res.vals) == 60


class TestObjectiveZoo:
    """The full objective set (objectives.py:33-420)."""

    def test_zero_one_and_identity(self):
        from pointnetgpd_tpu.learning import IdentityObjective, ZeroOneObjective

        assert ZeroOneObjective(0.5)(0.7) == 1
        assert ZeroOneObjective(0.5)(0.3) == 0
        assert IdentityObjective()(0.42) == pytest.approx(0.42)

    def test_least_squares_gradient_matches_fd(self):
        from pointnetgpd_tpu.learning import LeastSquaresObjective

        rng = np.random.RandomState(0)
        a, b = rng.randn(6, 4), rng.randn(6)
        obj = LeastSquaresObjective(a, b)
        x = rng.randn(4)
        g = obj.gradient(x)
        eps = 1e-6
        for i in range(4):
            dx = np.zeros(4); dx[i] = eps
            fd = (obj(x + dx) - obj(x - dx)) / (2 * eps)
            assert g[i] == pytest.approx(fd, rel=1e-4)
        np.testing.assert_allclose(obj.hessian(x), a.T @ a)
        # exact minimum: gradient vanishes at the lstsq solution
        x_star = np.linalg.lstsq(a, b, rcond=None)[0]
        np.testing.assert_allclose(obj.gradient(x_star), 0, atol=1e-9)

    def test_logistic_gradient_matches_fd(self):
        from pointnetgpd_tpu.learning import LogisticCrossEntropyObjective

        rng = np.random.RandomState(1)
        x_mat = rng.randn(20, 3)
        y = (rng.rand(20) < 0.5).astype(float)
        obj = LogisticCrossEntropyObjective(x_mat, y)
        beta = rng.randn(3) * 0.3
        g = obj.gradient(beta)
        eps = 1e-6
        for i in range(3):
            db = np.zeros(3); db[i] = eps
            fd = (obj(beta + db) - obj(beta - db)) / (2 * eps)
            assert g[i] == pytest.approx(fd, rel=1e-4, abs=1e-6)
        h = obj.hessian(beta)
        np.testing.assert_allclose(h, h.T, atol=1e-12)  # symmetric PSD
        assert np.all(np.linalg.eigvalsh(h) > -1e-10)

    def test_losses_and_ccbp_likelihood(self):
        from pointnetgpd_tpu.learning import (
            CCBPLogLikelihood,
            CrossEntropyLoss,
            MaximizationObjective,
            SquaredErrorLoss,
            WeightedSquaredErrorLoss,
        )

        p = np.array([0.2, 0.8, 0.5])
        assert CrossEntropyLoss(p)(p) < CrossEntropyLoss(p)(p[::-1].copy())
        assert SquaredErrorLoss(p)(p) == 0.0
        w = WeightedSquaredErrorLoss(p)
        assert w(p + 0.1, np.ones(3)) == pytest.approx(0.01)
        # posterior concentrated at the truth scores higher
        ll = CCBPLogLikelihood(p)
        tight = ll(p * 50, (1 - p) * 50)
        loose = ll(np.ones(3), np.ones(3))
        assert tight > loose
        # maximization wrapper forwards
        assert MaximizationObjective(SquaredErrorLoss(p))(p) == 0.0
        with pytest.raises(ValueError):
            SquaredErrorLoss(p)(np.zeros(2))


class TestRemainingLearningClasses:
    def test_confidence_termination(self):
        from pointnetgpd_tpu.learning import (
            BetaBernoulliModel,
            ConfidenceTerminationCondition,
        )

        m = BetaBernoulliModel(3)
        cond = ConfidenceTerminationCondition(1e-3)
        assert not cond(0, model=m)  # uniform prior: high variance
        for _ in range(3000):
            m.update(1, 1.0)
        assert cond(0, model=m)      # best arm now has tiny variance

    def test_optimization_solver_feasibility(self):
        from pointnetgpd_tpu.learning import (
            LeastSquaresObjective,
            OptimizationSolver,
        )

        obj = LeastSquaresObjective(np.eye(2), np.zeros(2))
        g = lambda x: np.asarray([x[0] - 1.0])      # x0 <= 1
        h = lambda x: np.asarray([x[0] + x[1]])     # x0 + x1 == 0
        s = OptimizationSolver(obj, [g], [h])
        assert s.is_feasible(np.array([0.5, -0.5]))
        assert not s.is_feasible(np.array([2.0, -2.0]))   # violates g
        assert not s.is_feasible(np.array([0.5, 0.5]))    # violates h
        assert not s.is_feasible(np.zeros(3))             # bad shape

    def test_gaussian_ucb_policy(self):
        from pointnetgpd_tpu.learning import (
            GaussianBandit,
            GaussianUCBPolicy,
            MaxIterTerminationCondition,
        )

        rng = np.random.RandomState(0)
        xs = np.linspace(0, 1, 8)
        obj = lambda x: float(x) + 0.05 * rng.randn()
        bandit = GaussianBandit(obj, list(xs), GaussianUCBPolicy())
        # UCB needs a warm start: an unobserved GaussianModel arm has
        # variance 0, so its UCB never beats an observed positive arm (the
        # reference's policy has the same cold-start property)
        for i, x in enumerate(xs):
            bandit.model_.update(i, obj(x))
            bandit.model_.update(i, obj(x))
        res = bandit.discrete_maximize(MaxIterTerminationCondition(80),
                                       rng=rng)
        assert res.best_candidates[0] >= 0.7


class TestGittinsIndices:
    """Computed Gittins indices (learning/gittins.py) — properties + the
    published gamma=0.9 oracle value."""

    def test_published_value_gamma09(self):
        from pointnetgpd_tpu.learning import gittins_index

        # Gittins/Glazebrook/Weber tables: Beta(1,1), gamma=0.9 -> 0.7029
        v = float(gittins_index([1], [1], gamma=0.9)[0])
        assert v == pytest.approx(0.7029, abs=2e-3)

    def test_properties(self):
        from pointnetgpd_tpu.learning import gittins_index

        a = np.arange(1, 40)
        inc = gittins_index(a, np.full_like(a, 5))
        dec = gittins_index(np.full_like(a, 5), a)
        assert np.all(np.diff(inc) > -1e-9)      # increasing in alpha
        assert np.all(np.diff(dec) < 1e-9)       # decreasing in beta
        mean = a / (a + 5.0)
        assert np.all(inc >= mean - 1e-9)        # exploration bonus >= 0
        # myopic limit: gamma -> 0 gives the posterior mean
        v0 = float(gittins_index([3], [7], gamma=1e-4)[0])
        assert v0 == pytest.approx(0.3, abs=2e-3)
        # beyond-table fallback: large n -> mean
        assert float(gittins_index([300], [700])[0]) == pytest.approx(0.3)

    def test_gittins_bandit_converges(self):
        from pointnetgpd_tpu.learning import (
            GittinsIndex98,
            MaxIterTerminationCondition,
        )

        rng = np.random.RandomState(0)
        probs = [0.2, 0.85, 0.4, 0.5]
        obj = lambda x: float(rng.rand() < x)
        res = GittinsIndex98(obj, probs).discrete_maximize(
            MaxIterTerminationCondition(150), rng=rng)
        assert res.best_candidates[0] == 0.85

    def test_fractional_posteriors_interpolate(self):
        from pointnetgpd_tpu.learning import gittins_index

        lo = float(gittins_index([2], [3])[0])
        hi = float(gittins_index([3], [3])[0])
        mid = float(gittins_index([2.5], [3])[0])
        assert lo <= mid <= hi
