"""Online-node tests: PointCloud2 conversion without ROS, and the full
GraspDetector frame pipeline on a synthetic tabletop scene."""

from types import SimpleNamespace

import numpy as np
import jax

from pointnetgpd_tpu.robot.pointclouds import (
    get_xyz_points,
    pointcloud2_to_array,
    pointcloud2_to_xyz_array,
)


def _fake_pc2(points, extra_pad: bool = False):
    """Duck-typed PointCloud2 with float32 xyz (+ optional padding gap)."""
    step = 16 if extra_pad else 12
    n = len(points)
    data = np.zeros((n, step), np.uint8)
    data[:, :12] = points.astype(np.float32).view(np.uint8).reshape(n, 12)
    fields = [SimpleNamespace(name=n_, offset=4 * i, datatype=7, count=1)
              for i, n_ in enumerate("xyz")]
    return SimpleNamespace(fields=fields, point_step=step, row_step=step * n,
                           width=n, height=1, data=data.tobytes(),
                           is_bigendian=False)


class TestPointCloud2:
    def test_roundtrip(self):
        pts = np.random.RandomState(0).randn(100, 3).astype(np.float32)
        msg = _fake_pc2(pts)
        arr = pointcloud2_to_array(msg)
        assert arr.shape == (100,)
        out = get_xyz_points(arr)
        np.testing.assert_array_equal(out, pts)

    def test_point_step_padding(self):
        pts = np.random.RandomState(1).randn(50, 3).astype(np.float32)
        out = pointcloud2_to_xyz_array(_fake_pc2(pts, extra_pad=True))
        np.testing.assert_array_equal(out, pts)

    def test_nan_removal(self):
        pts = np.random.RandomState(2).randn(20, 3).astype(np.float32)
        pts[5] = np.nan
        out = pointcloud2_to_xyz_array(_fake_pc2(pts))
        assert out.shape == (19, 3)


class TestGraspDetector:
    def test_process_frame_end_to_end(self):
        """Synthetic tabletop box scene -> ranked grasps, one pipeline call."""
        from pointnetgpd_tpu.grasping.gripper import Gripper
        from pointnetgpd_tpu.inference.scorer import GraspScorer
        from pointnetgpd_tpu.models.pointnet import init_pointnet_cls
        from pointnetgpd_tpu.robot.node import DetectorConfig, GraspDetector

        rng = np.random.RandomState(0)
        n = 700
        top = rng.rand(n, 3) * [0.06, 0.06, 0] + [0, 0, 0.08]
        front = rng.rand(n, 3) * [0.06, 0, 0.06] + [0, 0, 0.02]
        side = rng.rand(n, 3) * [0, 0.06, 0.06] + [0.06, 0, 0.02]
        pts = np.concatenate([top, front, side]).astype(np.float32)
        pts[:, :2] -= 0.03

        params, state = init_pointnet_cls(jax.random.PRNGKey(0),
                                          input_chann=3, k=3)
        scorer = GraspScorer(params=params, state=state, k=3, num_points=256,
                             pad_to=32)
        det = GraspDetector(
            scorer, Gripper(),
            DetectorConfig(num_grasps=20, max_num_samples=64,
                           input_points_num=256, repeat=1,
                           minimal_points_send_to_point_net=10))
        cam = np.array([0.5, 0.5, 1.0], np.float32)
        out = det.process_frame(pts, cam, seed=0)
        assert out["points"].shape[1] == 3
        assert out["all_frames"].shape[0] > 0       # GPG found candidates
        assert np.isfinite(out["all_scores"]).all()
        # ranked scores descending
        if len(out["scores"]) > 1:
            assert (np.diff(out["scores"]) <= 1e-7).all()


def test_detector_accepts_gpd_scorer():
    """GraspDetector is scorer-agnostic: the GPD projection-CNN scorer plugs
    in through the same score_candidates interface."""
    from pointnetgpd_tpu.inference import GPDScorer
    from pointnetgpd_tpu.models.gpd import init_gpd_classifier
    from pointnetgpd_tpu.robot.node import GraspDetector

    params = init_gpd_classifier(jax.random.PRNGKey(0), input_chann=3)
    s = GPDScorer(params=params, project_chann=3, num_points=64, pad_to=8,
                  min_points=3)
    det = GraspDetector(s)
    rng = np.random.RandomState(0)
    n = 400
    top = rng.rand(n, 3) * [0.06, 0.06, 0] + [-0.03, -0.03, 0.06]
    side = rng.rand(n, 3) * [0.06, 0, 0.06] + [-0.03, -0.03, 0.0]
    pts = np.concatenate([top, side]).astype(np.float32)
    res = det.process_frame(pts, cam_pos=np.array([0.5, 0, 0.5]))
    assert res["all_frames"].shape[0] == res["all_scores"].shape[0]
    assert np.isfinite(res["all_scores"]).all()
