"""Online GPD-baseline scorer: crop + normals + projection + CNN in one jit.

The reference trains the GPD projection-CNN baseline (main_1v_gpd.py /
main_fullv_gpd.py) but only ever DEPLOYS the PointNet models
(kinect2grasp.py / main_test.py load pointgpd checkpoints exclusively). This
module completes the family: a trained GPDClassifier scores GPG candidates
through the same fused per-scene program shape as
:class:`pointnetgpd_tpu.inference.scorer.GraspScorer` — closing-region crop
(kinect2grasp.py:216-233 box), KNN normal estimation (pcl KSearch=30
semantics, kinect2grasp.py:131-144), 60x60 projection features
(dataset.py:88-120), CNN forward, softmax-on-log_softmax scoring
(main_test.py:65-66 quirk, kept for consistency with the PointNet scorer).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gpd import apply_gpd_classifier
from ..ops.cloud import estimate_normals_knn
from ..ops.crop import collect_candidate_clouds
from ..ops.projection import gpd_projection_features
from .scorer import PendingScore, _round_up


@functools.partial(jax.jit, static_argnames=("num_points", "project_chann",
                                              "min_points", "knn_k"))
def score_candidates_gpd(params, pc, cand_frames, valid_in, hand_depth,
                         width, key, *, num_points: int = 500,
                         project_chann: int = 3, min_points: int = 50,
                         knn_k: int = 30):
    """Whole-scene GPD scoring as one device program.

    Returns (pred, prob, counts, valid, good, order) with the same semantics
    as scorer.score_candidates_fused; "good" is class 1 (the GPD baseline is
    2-class, main_1v_gpd.py k=2).
    """
    clouds, counts, valid = collect_candidate_clouds(
        cand_frames[:, 0], cand_frames[:, 1], cand_frames[:, 2],
        cand_frames[:, 3], pc, hand_depth, width, key,
        num_out=num_points, min_point_limit=min_points)
    valid = valid & valid_in

    # normals in the gripper frame; camera along -approach (= -x), matching
    # the training-path feature extractor (training/train.py
    # make_gpd_feature_fn)
    cam = jnp.asarray([-1.0, 0.0, 0.0], clouds.dtype)

    def one(cloud):
        normals = estimate_normals_knn(cloud, cam, k=knn_k,
                                       chunk=min(256, num_points))
        return gpd_projection_features(
            cloud, normals, jnp.ones((num_points,), bool), width,
            project_chann=project_chann)

    feats = jax.vmap(one)(clouds)                        # (G, 60, 60, C)
    logp = apply_gpd_classifier(params, feats, train=False)
    probs = jax.nn.softmax(logp, axis=-1)                # deployed quirk
    pred = jnp.argmax(probs, axis=-1)
    pred = jnp.where(valid, pred, 0)
    probs = jnp.where(valid[:, None], probs, 0.0)

    score = probs[:, 1]
    good = (pred == 1) & valid
    order = jnp.argsort(jnp.where(good, -score, jnp.inf))
    return pred, probs, counts, valid, good, order


@dataclass
class GPDScorer:
    """GraspScorer counterpart for the GPD projection-CNN baseline."""

    params: Any
    project_chann: int = 3
    num_points: int = 500
    pad_to: int = 64
    min_points: int = 50
    knn_k: int = 30

    def score_candidates(self, pc, candidates, hand_depth, width,
                         seed: int = 0, valid=None, extra_fetch=None):
        return self.collect(self.dispatch_candidates(
            pc, candidates, hand_depth, width, seed=seed, valid=valid,
            extra_fetch=extra_fetch))

    def dispatch_candidates(self, pc, candidates, hand_depth, width,
                            seed: int = 0, valid=None, extra_fetch=None):
        """Dispatch-only half (same split as GraspScorer.dispatch_candidates
        / collect, so GraspDetector.process_frames can pipeline either
        scorer)."""
        on_device = isinstance(candidates, jax.Array)
        if on_device:
            # device fast path (same contract as GraspScorer): the online
            # pipeline's candidates never leave the chip — np.asarray-ing
            # them here would block on per-array host round trips and
            # defeat the caller's single extra_fetch transfer
            cand = candidates.reshape(-1, 5, 3).astype(jnp.float32)
        else:
            cand = np.asarray(candidates, dtype=np.float32).reshape(-1, 5, 3)
        g = cand.shape[0]
        if g == 0:
            empty = {"pred": np.zeros((0,), np.int32),
                     "prob": np.zeros((0, 2), np.float32),
                     "score": np.zeros((0,), np.float32),
                     "counts": np.zeros((0,), np.int32),
                     "valid": np.zeros((0,), bool),
                     "good_indices": np.zeros((0,), np.int64)}
            return PendingScore(out=None, extra_fetch=extra_fetch, g=0,
                                empty=empty)
        g_pad = max(_round_up(g, self.pad_to), self.pad_to)
        pad_frame = np.zeros((g_pad - g, 5, 3), np.float32)
        pad_frame[:, 1] = [1, 0, 0]
        pad_frame[:, 2] = [0, 1, 0]
        pad_frame[:, 3] = [0, 0, 1]
        if on_device:
            cand_p = jnp.concatenate([cand, jnp.asarray(pad_frame)]) \
                if g_pad > g else cand
            valid_in = jnp.arange(g_pad) < g
            if valid is not None:
                valid_in = valid_in & jnp.pad(jnp.asarray(valid, bool),
                                              (0, g_pad - g))
        else:
            cand_p = np.concatenate([cand, pad_frame])
            valid_in = np.zeros((g_pad,), bool)
            valid_in[:g] = True if valid is None else np.asarray(valid, bool)

        out = score_candidates_gpd(
            self.params, jnp.asarray(pc, jnp.float32), jnp.asarray(cand_p),
            jnp.asarray(valid_in), jnp.float32(hand_depth),
            jnp.float32(width), jax.random.PRNGKey(seed),
            num_points=self.num_points, project_chann=self.project_chann,
            min_points=self.min_points, knn_k=self.knn_k)
        return PendingScore(out=out, extra_fetch=extra_fetch, g=g)

    def collect(self, pending: PendingScore):
        """Fetch half: one device->host transfer + host postprocess."""
        if pending.out is None:
            if pending.extra_fetch is not None:
                return pending.empty, jax.device_get(pending.extra_fetch)
            return pending.empty
        g, out, extra_fetch = pending.g, pending.out, pending.extra_fetch
        if extra_fetch is not None:
            (pred, prob, counts, valid, good, order), extras = \
                jax.device_get((out, extra_fetch))
        else:
            pred, prob, counts, valid, good, order = jax.device_get(out)
        pred, prob, counts = pred[:g], prob[:g], counts[:g]
        valid, good = valid[:g], good[:g]
        order = order[(order < g) & good[np.minimum(order, g - 1)]][:g]
        result = {"pred": pred, "prob": prob, "score": prob[:, 1],
                  "counts": counts, "valid": valid, "good_indices": order}
        if extra_fetch is not None:
            return result, extras
        return result
