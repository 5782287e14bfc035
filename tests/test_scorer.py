"""Batched scorer: repeat-vote semantics vs scipy.stats.mode, the reference's
softmax-on-log_softmax quirk, and fused-pipeline equivalence."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.stats import mode as scipy_mode

from pointnetgpd_tpu.inference.scorer import (
    GraspScorer,
    score_cloud_batch,
    score_candidates_fused,
)
from pointnetgpd_tpu.models.pointnet import apply_pointnet_cls, init_pointnet_cls


@pytest.fixture(scope="module")
def model3():
    return init_pointnet_cls(jax.random.PRNGKey(0), input_chann=3, k=3)


class TestVoteSemantics:
    def test_softmax_on_log_softmax_quirk(self, model3):
        """prob == softmax(log_softmax(logits)) — the deployed scorer's
        double-normalization (main_test.py:65-66), NOT plain softmax."""
        params, state = model3
        rng = np.random.RandomState(0)
        # single-point clouds: the internal resample-with-replacement is a
        # no-op (every draw returns the same point), so probs are comparable
        clouds = jnp.asarray(rng.randn(4, 1, 3).astype(np.float32))
        _, prob, _ = score_cloud_batch(
            params, state, clouds, jnp.ones(4, bool), jax.random.PRNGKey(0),
            num_points=64, repeat=1)
        tiled = jnp.tile(clouds, (1, 64, 1))
        (logp, _), _ = apply_pointnet_cls(params, state, tiled, train=False)
        expected = np.asarray(jax.nn.softmax(logp, axis=-1))
        np.testing.assert_allclose(np.asarray(prob), expected, atol=1e-6)

    def test_majority_vote_matches_scipy_mode(self, model3):
        """The on-device one-hot-count vote ties-to-smallest like scipy mode
        (main_test.py:93)."""
        params, state = model3
        rng = np.random.RandomState(1)
        clouds = jnp.asarray(rng.randn(6, 400, 3).astype(np.float32))
        pred, prob, votes = score_cloud_batch(
            params, state, clouds, jnp.ones(6, bool), jax.random.PRNGKey(1),
            num_points=64, repeat=7)
        votes = np.asarray(votes)
        for g in range(6):
            expected = scipy_mode(votes[g], keepdims=False).mode
            assert int(pred[g]) == int(expected)

    def test_invalid_candidates_zeroed(self, model3):
        params, state = model3
        clouds = jnp.zeros((3, 64, 3))
        valid = jnp.asarray([True, False, True])
        pred, prob, _ = score_cloud_batch(
            params, state, clouds, valid, jax.random.PRNGKey(0),
            num_points=64, repeat=1)
        assert int(pred[1]) == 0
        np.testing.assert_allclose(np.asarray(prob[1]), 0.0)


class TestFusedPipeline:
    def test_fused_ranking_and_dict(self, model3):
        params, state = model3
        rng = np.random.RandomState(2)
        pc = (rng.rand(1500, 3).astype(np.float32)) * 0.08
        scorer = GraspScorer(params=params, state=state, k=3, num_points=128,
                             pad_to=16, min_points=5)
        g = 10
        cands = np.zeros((g, 5, 3), np.float32)
        cands[:, 0] = rng.rand(g, 3) * 0.08
        cands[:, 0, 0] -= 0.02
        cands[:, 1] = [1, 0, 0]
        cands[:, 2] = [0, 1, 0]
        cands[:, 3] = [0, 0, 1]
        out = scorer.score_candidates(pc, cands, hand_depth=0.05, width=0.08,
                                      seed=0)
        assert out["pred"].shape == (g,)
        assert out["prob"].shape == (g, 3)
        # ranked good indices: descending scores, all predicted best-class
        gi = out["good_indices"]
        if len(gi) > 1:
            assert (np.diff(out["score"][gi]) <= 1e-7).all()
        for i in gi:
            assert out["pred"][i] == 2 and out["valid"][i]
        # scores within the softmax simplex
        assert (out["score"] >= 0).all() and (out["score"] <= 1).all()

    def test_fused_matches_two_stage(self, model3):
        """score_candidates_fused == collect_candidate_clouds +
        score_cloud_batch with the same key split."""
        from pointnetgpd_tpu.ops.crop import collect_candidate_clouds

        params, state = model3
        rng = np.random.RandomState(3)
        pc = jnp.asarray((rng.rand(800, 3) * 0.08).astype(np.float32))
        g = 8
        cands = np.zeros((g, 5, 3), np.float32)
        cands[:, 0] = rng.rand(g, 3) * 0.08
        cands[:, 0, 0] -= 0.02
        cands[:, 1] = [1, 0, 0]
        cands[:, 2] = [0, 1, 0]
        cands[:, 3] = [0, 0, 1]
        cands = jnp.asarray(cands)
        key = jax.random.PRNGKey(5)

        pred_f, prob_f, counts_f, valid_f, good_f, order_f = \
            score_candidates_fused(params, state, pc, cands,
                                   jnp.ones(g, bool), jnp.float32(0.05),
                                   jnp.float32(0.08), key, num_points=128,
                                   min_points=5)
        k_crop, k_score = jax.random.split(key)
        clouds, counts, valid = collect_candidate_clouds(
            cands[:, 0], cands[:, 1], cands[:, 2], cands[:, 3], pc,
            jnp.float32(0.05), jnp.float32(0.08), k_crop, num_out=128,
            min_point_limit=5)
        pred, prob, _ = score_cloud_batch(params, state, clouds, valid,
                                          k_score, num_points=128, repeat=1)
        np.testing.assert_array_equal(np.asarray(pred_f), np.asarray(pred))
        np.testing.assert_allclose(np.asarray(prob_f), np.asarray(prob),
                                   atol=1e-6)
        np.testing.assert_array_equal(np.asarray(counts_f), np.asarray(counts))


def test_bf16_scorer_agrees_with_fp32(model3):
    """bf16-cast scorer predicts the same classes as fp32 on clear inputs."""
    params, state = model3
    rng = np.random.RandomState(4)
    clouds = rng.randn(6, 200, 3).astype(np.float32)
    s32 = GraspScorer(params=params, state=state, k=3, num_points=128,
                      pad_to=8)
    s16 = s32.as_dtype(jnp.bfloat16)
    p32, _, _ = s32.score_clouds(clouds, seed=0)
    p16, _, _ = s16.score_clouds(clouds, seed=0)
    # class agreement on the large majority (bf16 may flip marginal calls)
    assert (p32 == p16).mean() >= 0.5


class TestShardedInference:
    """Data-parallel inference over a mesh: candidates sharded, model
    replicated — per-candidate forwards are independent, so sharded results
    must equal single-device results exactly."""

    def test_score_candidates_sharded_equals_unsharded(self, model3):
        from pointnetgpd_tpu.parallel.mesh import make_mesh

        params, state = model3
        rng = np.random.RandomState(7)
        pc = (rng.rand(1200, 3) * 0.08).astype(np.float32)
        g = 20
        cands = np.zeros((g, 5, 3), np.float32)
        cands[:, 0] = rng.rand(g, 3) * 0.08
        cands[:, 0, 0] -= 0.02
        cands[:, 1] = [1, 0, 0]
        cands[:, 2] = [0, 1, 0]
        cands[:, 3] = [0, 0, 1]

        base = GraspScorer(params=params, state=state, k=3, num_points=128,
                           pad_to=8, min_points=5)
        mesh = make_mesh()
        assert len(mesh.devices.flatten()) == 8
        sharded = GraspScorer(params=params, state=state, k=3,
                              num_points=128, pad_to=8, min_points=5,
                              mesh=mesh)
        a = base.score_candidates(pc, cands, hand_depth=0.05, width=0.08,
                                  seed=3)
        b = sharded.score_candidates(pc, cands, hand_depth=0.05, width=0.08,
                                     seed=3)
        np.testing.assert_array_equal(a["pred"], b["pred"])
        np.testing.assert_allclose(a["prob"], b["prob"], atol=1e-6)
        np.testing.assert_array_equal(a["counts"], b["counts"])
        np.testing.assert_array_equal(a["good_indices"], b["good_indices"])

    def test_score_clouds_sharded_pad_not_multiple(self, model3):
        from pointnetgpd_tpu.parallel.mesh import make_mesh

        params, state = model3
        rng = np.random.RandomState(8)
        clouds = rng.randn(5, 100, 3).astype(np.float32)  # 5 !% 8
        base = GraspScorer(params=params, state=state, k=3, num_points=64,
                           pad_to=4)
        sharded = GraspScorer(params=params, state=state, k=3, num_points=64,
                              pad_to=4, mesh=make_mesh())
        assert sharded.pad_to % 8 == 0
        pa, qa, _ = base.score_clouds(clouds, seed=1)
        pb, qb, _ = sharded.score_clouds(clouds, seed=1)
        np.testing.assert_array_equal(pa, pb)
        np.testing.assert_allclose(qa, qb, atol=1e-6)


def test_zero_candidates(model3):
    """An empty candidate list (a frame where GPG found nothing) returns
    empty, well-typed results instead of crashing."""
    params, state = model3
    s = GraspScorer(params=params, state=state, k=3, num_points=64,
                    pad_to=8, min_points=5)
    pc = np.random.RandomState(0).rand(500, 3).astype(np.float32) * 0.08
    out = s.score_candidates(pc, np.zeros((0, 5, 3), np.float32),
                             hand_depth=0.05, width=0.08)
    assert out["pred"].shape == (0,)
    assert out["prob"].shape == (0, 3)
    assert out["good_indices"].shape == (0,)
    p, pr, _ = s.score_clouds(np.zeros((0, 100, 3), np.float32))
    assert p.shape == (0,) and pr.shape == (0, 3)


class TestGPDScorer:
    """Online scoring with the GPD projection-CNN baseline — the deployment
    path the reference never built for its GPD models."""

    def test_gpd_candidates_scored(self):
        from pointnetgpd_tpu.inference import GPDScorer
        from pointnetgpd_tpu.models.gpd import init_gpd_classifier

        params = init_gpd_classifier(jax.random.PRNGKey(0), input_chann=3)
        s = GPDScorer(params=params, project_chann=3, num_points=128,
                      pad_to=8, min_points=5)
        rng = np.random.RandomState(0)
        pc = (rng.rand(1500, 3) * 0.08).astype(np.float32)
        g = 10
        cands = np.zeros((g, 5, 3), np.float32)
        cands[:, 0] = rng.rand(g, 3) * 0.08
        cands[:, 0, 0] -= 0.02
        cands[:, 1] = [1, 0, 0]
        cands[:, 2] = [0, 1, 0]
        cands[:, 3] = [0, 0, 1]
        out = s.score_candidates(pc, cands, hand_depth=0.05, width=0.08)
        assert out["pred"].shape == (g,)
        assert out["prob"].shape == (g, 2)
        assert np.isfinite(out["prob"]).all()
        assert (out["score"] >= 0).all() and (out["score"] <= 1).all()
        for i in out["good_indices"]:
            assert out["pred"][i] == 1 and out["valid"][i]
        # descending ranking
        gi = out["good_indices"]
        if len(gi) > 1:
            assert (np.diff(out["score"][gi]) <= 1e-7).all()

    def test_gpd_12_chann_and_empty(self):
        from pointnetgpd_tpu.inference import GPDScorer
        from pointnetgpd_tpu.models.gpd import init_gpd_classifier

        params = init_gpd_classifier(jax.random.PRNGKey(1), input_chann=12)
        s = GPDScorer(params=params, project_chann=12, num_points=64,
                      pad_to=8, min_points=3)
        pc = np.random.RandomState(1).rand(400, 3).astype(np.float32) * 0.08
        out = s.score_candidates(pc, np.zeros((0, 5, 3), np.float32),
                                 hand_depth=0.05, width=0.08)
        assert out["pred"].shape == (0,)
        c = np.zeros((3, 5, 3), np.float32)
        c[:, 0] = 0.04
        c[:, 1] = [1, 0, 0]
        c[:, 2] = [0, 1, 0]
        c[:, 3] = [0, 0, 1]
        out = s.score_candidates(pc, c, hand_depth=0.05, width=0.08)
        assert out["prob"].shape == (3, 2)
        assert np.isfinite(out["prob"]).all()
