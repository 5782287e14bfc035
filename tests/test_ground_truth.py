"""Ground-truth grasp validation (pipelines/ground_truth.py): detected GPG
frames scored against the exact object SDFs must reproduce the physics —
a parallel-face box grasp is force-closure at low friction, a 45-degree
diagonal grasp needs mu >= 1 (reference quality defs:
dex-net/src/dexnet/grasping/quality.py:245-283, 626-723)."""

import numpy as np
import pytest

from pointnetgpd_tpu.grasping.gripper import Gripper
from pointnetgpd_tpu.pipelines.ground_truth import (
    configs_from_frames,
    ground_truth_quality,
    summarize_ground_truth,
)
from pointnetgpd_tpu.pipelines.parity import _box_sdf, _sdf_grid_from_fn

HALF = (0.024, 0.036, 0.020)
POSE_T = np.array([0.10, -0.05, 0.030], np.float32)


@pytest.fixture(scope="module")
def box_scene():
    sdf = _sdf_grid_from_fn(_box_sdf(HALF), 0.06, 56, 0.0022)
    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = POSE_T
    return sdf, t


def _frame(major, approach, gripper):
    """Orthonormal GPG frame whose closing line passes through the box
    center (world) at depth hand_depth/2."""
    major = np.asarray(major, np.float32)
    major = major / np.linalg.norm(major)
    approach = np.asarray(approach, np.float32)
    approach = approach - major * (approach @ major)
    approach = approach / np.linalg.norm(approach)
    minor = np.cross(approach, major)
    bc = POSE_T - approach * (gripper.hand_depth / 2.0)
    return np.stack([bc, approach, major, minor, bc])


class TestGroundTruth:
    def test_good_vs_bad_grasp_physics(self, box_scene):
        g = Gripper()
        good = _frame([1, 0, 0], [0, 1, 0], g)       # across parallel faces
        bad = _frame([1, 0, 1], [0, 1, 0], g)        # 45-deg diagonal
        frames = np.stack([good, bad])
        gt = ground_truth_quality(frames, [box_scene], g)
        assert gt["obj_idx"].tolist() == [0, 0]
        # good: antipodal parallel faces -> FC at any mu in the ladder
        assert bool(gt["fc_good"][0])
        assert gt["eps_good"][0] > 0
        assert gt["fc_label"][0] <= 0.5
        # bad: contact normals 45 deg off the closing line -> needs mu >= 1
        assert not bool(gt["fc_good"][1])
        assert gt["eps_good"][1] == 0
        assert bool(gt["label_valid"][1])            # still FC at mu=2.0
        assert gt["fc_label"][1] >= 0.8

    def test_summary_prefers_good_topk(self, box_scene):
        g = Gripper()
        frames = np.stack([_frame([1, 0, 1], [0, 1, 0], g),
                           _frame([1, 0, 0], [0, 1, 0], g)])
        gt = ground_truth_quality(frames, [box_scene], g)
        s = summarize_ground_truth(gt, ranked_order=np.array([1]), top_k=1)
        assert s["topk_mean_eps_mu0.6"] > s["pool_mean_eps_mu0.6"]
        assert s["topk_frac_fc_mu0.6"] == 1.0
        assert s["n_candidates"] == 2

    def test_configs_center_from_observed_points(self, box_scene):
        """The configuration center must sit at the observed points' mean
        closing-region depth, inside the body."""
        g = Gripper()
        fr = _frame([1, 0, 0], [0, 1, 0], g)
        rng = np.random.RandomState(0)
        # observed surface: the y = -half_y face (camera side), in world
        pts = rng.rand(500, 3).astype(np.float32) * [0.048, 0, 0.04] \
            + POSE_T - [0.024, HALF[1], 0.02]
        cfgs = configs_from_frames(fr[None], g, points=pts)
        # face at world y = POSE_T.y - 0.036; bc.y = POSE_T.y - depth/2
        depth_face = (POSE_T[1] - HALF[1]) - fr[0][1]
        assert abs(cfgs[0, 1] - (fr[0][1] + depth_face)) < 5e-3
        np.testing.assert_allclose(cfgs[0, 3:6], [1, 0, 0], atol=1e-6)

    def test_empty_candidates(self, box_scene):
        gt = ground_truth_quality(np.zeros((0, 5, 3), np.float32),
                                  [box_scene], Gripper())
        assert len(gt["eps_good"]) == 0
        s = summarize_ground_truth(gt, ranked_order=np.zeros(0, int))
        assert s["n_candidates"] == 0
