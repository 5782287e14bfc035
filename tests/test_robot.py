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

    def test_process_frame_funnel(self):
        """funnel=True: result carries the per-guard rejection table, the
        counts are monotone, the tail equals the sampler's valid total, and
        the frame's candidates match the funnel-less run exactly."""
        from pointnetgpd_tpu.grasping.gripper import Gripper
        from pointnetgpd_tpu.grasping.samplers import FUNNEL_STAGES
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
        base = det.process_frame(pts, cam, seed=0)
        out = det.process_frame(pts, cam, seed=0, funnel=True)
        f = out["funnel"]
        counts = [f[k] for k in FUNNEL_STAGES]
        assert all(a >= b for a, b in zip(counts, counts[1:])), counts
        assert counts[-1] == out["n_valid"]
        np.testing.assert_array_equal(base["pred"], out["pred"])
        np.testing.assert_allclose(base["all_frames"], out["all_frames"],
                                   atol=1e-6)
        assert "funnel" not in base

    def test_fp16_upload_matches_fp32(self):
        """upload_dtype='float16' (half the relay bytes) must agree with
        the fp32 upload: quantization is half an fp16 ULP, ~0.25-0.5 mm at
        coordinates in [0.5, 2) m — below the ~2 mm voxel grid — so
        candidate yield and frames match closely."""
        from pointnetgpd_tpu.grasping.gripper import Gripper
        from pointnetgpd_tpu.inference.scorer import GraspScorer
        from pointnetgpd_tpu.models.pointnet import init_pointnet_cls
        from pointnetgpd_tpu.robot.node import DetectorConfig, GraspDetector

        rng = np.random.RandomState(5)
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
        cam = np.array([0.5, 0.5, 1.0], np.float32)
        outs = {}
        for dt in ("float16", "float32"):
            det = GraspDetector(
                scorer, Gripper(),
                DetectorConfig(num_grasps=20, max_num_samples=64,
                               input_points_num=256, repeat=1,
                               minimal_points_send_to_point_net=10,
                               upload_dtype=dt))
            outs[dt] = det.process_frame(pts, cam, seed=0)
        a, b = outs["float16"], outs["float32"]
        na, nb = len(a["all_frames"]), len(b["all_frames"])
        assert na > 0 and nb > 0
        # yields agree within the quantization's statistical wiggle
        assert abs(na - nb) <= max(2, 0.25 * max(na, nb))
        # the downsampled clouds agree to fp16 resolution
        pa = np.sort(np.asarray(a["points"]), axis=0)
        pb = np.sort(np.asarray(b["points"]), axis=0)
        if pa.shape == pb.shape:
            close = np.isclose(pa, pb, atol=2e-4).mean()
            assert close > 0.99

    def test_process_frames_pipelined_matches_serial(self):
        """The one-in-flight pipelined stream must yield exactly the same
        results as serial process_frame calls (same seeds per frame)."""
        from pointnetgpd_tpu.grasping.gripper import Gripper
        from pointnetgpd_tpu.inference.scorer import GraspScorer
        from pointnetgpd_tpu.models.pointnet import init_pointnet_cls
        from pointnetgpd_tpu.robot.node import DetectorConfig, GraspDetector

        rng = np.random.RandomState(3)
        frames = []
        for f in range(3):
            n = 500 + 40 * f      # varying raw sizes, same bucket
            top = rng.rand(n, 3) * [0.06, 0.06, 0] + [0, 0, 0.08]
            side = rng.rand(n, 3) * [0, 0.06, 0.06] + [0.06, 0, 0.02]
            pts = np.concatenate([top, side]).astype(np.float32)
            pts[:, :2] -= 0.03
            frames.append(pts)
        cam = np.array([0.5, 0.5, 1.0], np.float32)

        params, state = init_pointnet_cls(jax.random.PRNGKey(0),
                                          input_chann=3, k=3)
        scorer = GraspScorer(params=params, state=state, k=3, num_points=128,
                             pad_to=16, min_points=5)
        det = GraspDetector(
            scorer, Gripper(),
            DetectorConfig(num_grasps=12, max_num_samples=32,
                           input_points_num=128, repeat=1,
                           minimal_points_send_to_point_net=5,
                           cloud_pad_to=1024))
        serial = [det.process_frame(p, cam, seed=i)
                  for i, p in enumerate(frames)]
        piped = list(det.process_frames(iter(frames), cam))
        assert len(piped) == len(serial)
        for a, b in zip(serial, piped):
            np.testing.assert_array_equal(a["all_frames"], b["all_frames"])
            np.testing.assert_array_equal(a["all_scores"], b["all_scores"])
            np.testing.assert_array_equal(a["grasps"], b["grasps"])
            assert a["points"].shape == b["points"].shape

    def _make_det(self, adaptive=False, cloud_pad_to=512, margin=1.25,
                  n_voxel=500, raw_pad_to=None, **cfg_kw):
        from pointnetgpd_tpu.grasping.gripper import Gripper
        from pointnetgpd_tpu.inference.scorer import GraspScorer
        from pointnetgpd_tpu.models.pointnet import init_pointnet_cls
        from pointnetgpd_tpu.robot.node import DetectorConfig, GraspDetector

        params, state = init_pointnet_cls(jax.random.PRNGKey(0),
                                          input_chann=3, k=3)
        scorer = GraspScorer(params=params, state=state, k=3, num_points=128,
                             pad_to=16, min_points=5)
        return GraspDetector(
            scorer, Gripper(),
            DetectorConfig(num_grasps=12, max_num_samples=32,
                           input_points_num=128, repeat=1,
                           minimal_points_send_to_point_net=5,
                           cloud_pad_to=cloud_pad_to,
                           adaptive_bucket=adaptive,
                           adaptive_margin=margin, n_voxel=n_voxel,
                           raw_pad_to=raw_pad_to, **cfg_kw))

    @staticmethod
    def _scene(rng, n):
        top = rng.rand(n, 3) * [0.06, 0.06, 0] + [0, 0, 0.08]
        side = rng.rand(n, 3) * [0, 0.06, 0.06] + [0.06, 0, 0.02]
        pts = np.concatenate([top, side]).astype(np.float32)
        pts[:, :2] -= 0.03
        return pts

    def test_adaptive_bucket_shrinks_and_matches_when_bucket_equal(self):
        """A dense scene (voxel count << raw count) must run smaller cloud
        buckets after the first frame; results stay structurally valid and
        the stream is deterministic."""
        rng = np.random.RandomState(5)
        # coarse voxel grid: 4000 raw points collapse to a few hundred
        # voxels, so the adapted bucket drops below the raw bound
        pts = self._scene(rng, 2000)
        cam = np.array([0.5, 0.5, 1.0], np.float32)

        det = self._make_det(adaptive=True, n_voxel=40)
        d1 = det.dispatch_frame(pts, cam, seed=0)
        bucket_first = d1[2]
        out1 = det.collect_frame(d1)
        assert det._last_voxel_count is not None
        d2 = det.dispatch_frame(pts, cam, seed=1)
        bucket_second = d2[2]
        out2 = det.collect_frame(d2)
        assert bucket_second < bucket_first  # adapted down
        assert np.isfinite(out2["all_scores"]).all()
        # deterministic: a fresh detector over the same stream reproduces it
        det_b = self._make_det(adaptive=True, n_voxel=40)
        det_b.collect_frame(det_b.dispatch_frame(pts, cam, seed=0))
        out2b = det_b.process_frame(pts, cam, seed=1)
        np.testing.assert_array_equal(out2["all_frames"], out2b["all_frames"])
        np.testing.assert_array_equal(out2["all_scores"], out2b["all_scores"])

    def test_adaptive_bucket_overflow_redoes_at_bound(self):
        """When the scene suddenly grows past the adapted bucket, the frame
        is reprocessed at the raw bound — bit-identical to adaptive off."""
        rng = np.random.RandomState(6)
        small = self._scene(rng, 300)
        # sparse big scene: high voxel count, far above small's count
        big = (rng.rand(3000, 3) * 0.5 - 0.25).astype(np.float32)
        big[:, 2] = np.abs(big[:, 2]) + 0.02
        cam = np.array([0.5, 0.5, 1.0], np.float32)

        det_a = self._make_det(adaptive=True)
        det_f = self._make_det(adaptive=False)
        det_a.process_frame(small, cam, seed=0)   # sets a small estimate
        out_a = det_a.process_frame(big, cam, seed=1)   # overflow -> redo
        out_f = det_f.process_frame(big, cam, seed=1)
        np.testing.assert_array_equal(out_a["all_frames"],
                                      out_f["all_frames"])
        np.testing.assert_array_equal(out_a["all_scores"],
                                      out_f["all_scores"])
        np.testing.assert_array_equal(out_a["grasps"], out_f["grasps"])

    def test_adaptive_overflow_redo_with_coarse_raw_pad(self):
        """The overflow redo must re-derive the bound bucket from the
        ORIGINAL raw count, not the raw-padded length (regression: with
        raw_pad_to coarser than cloud_pad_to the redo ran a needlessly
        large bucket and diverged from adaptive_bucket=False)."""
        rng = np.random.RandomState(7)
        small = self._scene(rng, 300)
        big = (rng.rand(2500, 3) * 0.5 - 0.25).astype(np.float32)
        big[:, 2] = np.abs(big[:, 2]) + 0.02
        cam = np.array([0.5, 0.5, 1.0], np.float32)

        # raw buckets of 8192 vs cloud buckets of 512: padding `big` to
        # 8192 raw points must not inflate the redo's bound bucket
        det_a = self._make_det(adaptive=True, raw_pad_to=8192)
        det_f = self._make_det(adaptive=False, raw_pad_to=8192)
        det_a.process_frame(small, cam, seed=0)   # sets a small estimate
        out_a = det_a.process_frame(big, cam, seed=1)   # overflow -> redo
        out_f = det_f.process_frame(big, cam, seed=1)
        np.testing.assert_array_equal(out_a["all_frames"],
                                      out_f["all_frames"])
        np.testing.assert_array_equal(out_a["all_scores"],
                                      out_f["all_scores"])

    def test_normal_window_zero_disables_lazy_windowing(self):
        """normal_window=0 is documented as 'always all-pairs': it must win
        over the default lazy_normals=True (which is built on the windowed
        seed estimator) and reproduce the lazy_normals=False flow exactly
        (regression: `cfg.normal_window or 2048` silently re-enabled the
        window)."""
        rng = np.random.RandomState(11)
        pts = self._scene(rng, 400)
        cam = np.array([0.5, 0.5, 1.0], np.float32)
        out_zero = self._make_det(normal_window=0).process_frame(
            pts, cam, seed=3)
        out_dense = self._make_det(normal_window=0,
                                   lazy_normals=False).process_frame(
            pts, cam, seed=3)
        np.testing.assert_array_equal(out_zero["all_frames"],
                                      out_dense["all_frames"])
        np.testing.assert_array_equal(out_zero["all_scores"],
                                      out_dense["all_scores"])

    def test_sharded_detector_matches_single_device(self):
        """The full frame pipeline composed over the 8-device mesh (sharded
        normals + GPG + scoring) must match the single-device detector up
        to per-shard fusion rounding."""
        from pointnetgpd_tpu.grasping.gripper import Gripper
        from pointnetgpd_tpu.inference.scorer import GraspScorer
        from pointnetgpd_tpu.models.pointnet import init_pointnet_cls
        from pointnetgpd_tpu.parallel.mesh import make_mesh
        from pointnetgpd_tpu.robot.node import DetectorConfig, GraspDetector

        rng = np.random.RandomState(1)
        n = 700
        top = rng.rand(n, 3) * [0.06, 0.06, 0] + [0, 0, 0.08]
        front = rng.rand(n, 3) * [0.06, 0, 0.06] + [0, 0, 0.02]
        side = rng.rand(n, 3) * [0, 0.06, 0.06] + [0.06, 0, 0.02]
        pts = np.concatenate([top, front, side]).astype(np.float32)
        pts[:, :2] -= 0.03
        cam = np.array([0.5, 0.5, 1.0], np.float32)

        params, state = init_pointnet_cls(jax.random.PRNGKey(0),
                                          input_chann=3, k=3)
        cfg = dict(num_grasps=16, max_num_samples=32, input_points_num=128,
                   minimal_points_send_to_point_net=5, cloud_pad_to=1024,
                   normal_window=512)
        outs = {}
        for name, mesh in (("single", None), ("sharded", make_mesh())):
            scorer = GraspScorer(params=params, state=state, k=3,
                                 num_points=128, pad_to=8, min_points=5,
                                 mesh=mesh)
            det = GraspDetector(scorer, Gripper(),
                                DetectorConfig(**cfg))
            outs[name] = det.process_frame(pts, cam, seed=0)
        a, b = outs["single"], outs["sharded"]
        assert len(a["all_frames"]) == len(b["all_frames"])
        np.testing.assert_allclose(a["all_frames"], b["all_frames"],
                                   atol=1e-5)
        np.testing.assert_allclose(a["all_scores"], b["all_scores"],
                                   atol=1e-4)


class _AutoNS:
    """Attribute-auto-vivifying stand-in for ROS message structs."""

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        v = _AutoNS()
        setattr(self, name, v)
        return v


class _Marker(_AutoNS):
    CUBE = 1
    ADD = 0


class _MarkerArray:
    def __init__(self):
        self.markers = []


class _GraspConfig(_AutoNS):
    pass


class _GraspConfigList(_AutoNS):
    def __init__(self):
        self.grasps = []


def _fake_ros_modules(monkeypatch, cloud_msg, robot_away_first=False,
                      away_on_calls=()):
    """Install fake rospy/sensor_msgs/visualization_msgs/gpd_grasp_msgs
    modules; returns the dict that captures published messages.
    ``away_on_calls``: get_param call indices (1-based) that report the
    robot away from home."""
    import sys
    import types

    published = {}
    params = {}
    state = {"get_param_calls": 0, "sleeps": 0}
    away_calls = set(away_on_calls) | ({1} if robot_away_first else set())

    class _Publisher:
        def __init__(self, topic, data_class, queue_size=0):
            if not isinstance(data_class, type):  # real rospy raises on None
                raise TypeError(f"invalid message class: {data_class!r}")
            self.topic = topic
            published.setdefault(topic, [])

        def publish(self, msg):
            published[self.topic].append(msg)

    class _Rate:
        def __init__(self, hz):
            pass

        def sleep(self):
            state["sleeps"] += 1

    def _get_param(name, *default):
        state["get_param_calls"] += 1
        if state["get_param_calls"] in away_calls:
            return "false"
        return params.get(name, default[0] if default else None)

    rospy = types.ModuleType("rospy")
    rospy.init_node = lambda name, anonymous=False: None
    rospy.Publisher = _Publisher
    rospy.Rate = _Rate
    rospy.set_param = params.__setitem__
    rospy.get_param = _get_param
    rospy.is_shutdown = lambda: False
    rospy.loginfo = lambda *a: None
    rospy.wait_for_message = lambda topic, cls: cloud_msg
    rospy.Duration = type("Duration", (), {"from_sec": staticmethod(lambda s: s)})
    rospy.Time = type("Time", (), {"now": staticmethod(lambda: 0.0)})

    sensor = types.ModuleType("sensor_msgs")
    sensor_msg = types.ModuleType("sensor_msgs.msg")
    sensor_msg.PointCloud2 = type(cloud_msg)
    vis = types.ModuleType("visualization_msgs")
    vis_msg = types.ModuleType("visualization_msgs.msg")
    vis_msg.Marker, vis_msg.MarkerArray = _Marker, _MarkerArray
    gpd = types.ModuleType("gpd_grasp_msgs")
    gpd_msg = types.ModuleType("gpd_grasp_msgs.msg")
    gpd_msg.GraspConfig, gpd_msg.GraspConfigList = _GraspConfig, _GraspConfigList

    for name, mod in [("rospy", rospy), ("sensor_msgs", sensor),
                      ("sensor_msgs.msg", sensor_msg),
                      ("visualization_msgs", vis),
                      ("visualization_msgs.msg", vis_msg),
                      ("gpd_grasp_msgs", gpd), ("gpd_grasp_msgs.msg", gpd_msg)]:
        monkeypatch.setitem(sys.modules, name, mod)
    return published, params, state


class _FakeDetector:
    """Duck-typed GraspDetector: fixed ranked grasps, real Gripper."""

    def __init__(self):
        from pointnetgpd_tpu.grasping.gripper import Gripper

        self.gripper = Gripper()
        g = np.zeros((2, 5, 3), np.float32)
        g[:, 0] = [[0.01, 0.02, 0.05], [-0.01, 0.0, 0.04]]
        g[:, 1] = [0, 0, -1]
        g[:, 2] = [0, 1, 0]
        g[:, 3] = [1, 0, 0]
        g[:, 4] = g[:, 0] + [0, 0, 0.005]
        self._grasps = g
        self.frames_seen = []

    def process_frame(self, points, cam_pos, seed=0):
        self.frames_seen.append(np.asarray(points))
        return {"grasps": self._grasps,
                "scores": np.array([0.9, 0.7], np.float32)}

    def dispatch_frame(self, points, cam_pos, seed=0):
        return self.process_frame(points, cam_pos, seed)

    def collect_frame(self, dispatched):
        return dispatched


class TestRosNode:
    def _run(self, monkeypatch, **kw):
        from pointnetgpd_tpu.robot.node import run_ros_node

        pts = np.random.RandomState(0).rand(64, 3).astype(np.float32)
        published, params, state = _fake_ros_modules(
            monkeypatch, _fake_pc2(pts), **{k: v for k, v in kw.items()
                                            if k == "robot_away_first"})
        det = _FakeDetector()
        run_ros_node(det, cam_pos=np.zeros(3), max_frames=1,
                     **{k: v for k, v in kw.items() if k != "robot_away_first"})
        return published, params, state, det, pts

    def test_one_publish_cycle(self, monkeypatch):
        """One full frame: cloud in -> markers + best-grasp config out
        (reference kinect2grasp.py:400-424,516-553 semantics)."""
        published, params, state, det, pts = self._run(monkeypatch)
        assert params["/robot_at_home"] == "true"
        # detector got the decoded cloud
        np.testing.assert_allclose(det.frames_seen[0], pts, atol=1e-6)
        # 2 grasps x 3 cubes (palm + two fingers)
        markers = published["gripper_vis"]
        assert len(markers) == 1 and len(markers[0].markers) == 6
        # best grasp only, with modified bottom center + score
        glist = published["/detect_grasps/clustered_grasps"]
        assert len(glist) == 1 and len(glist[0].grasps) == 1
        g0 = glist[0].grasps[0]
        np.testing.assert_allclose(
            [g0.bottom.x, g0.bottom.y, g0.bottom.z],
            det._grasps[0, 4], atol=1e-6)
        assert g0.score.data == np.float32(0.9)

    def test_pipelined_node_publishes_all_frames(self, monkeypatch):
        """pipeline=True publishes with one-frame latency but drains the
        in-flight frame on shutdown: every processed frame is published."""
        from pointnetgpd_tpu.robot.node import run_ros_node

        pts = np.random.RandomState(0).rand(64, 3).astype(np.float32)
        published, params, state = _fake_ros_modules(
            monkeypatch, _fake_pc2(pts))
        det = _FakeDetector()
        run_ros_node(det, cam_pos=np.zeros(3), max_frames=3, pipeline=True)
        assert len(det.frames_seen) == 3
        glist = published["/detect_grasps/clustered_grasps"]
        assert len(glist) == 3  # 2 pipelined + 1 drained at shutdown

    def test_pipelined_node_drops_stale_frame_when_robot_moves(
            self, monkeypatch):
        """pipeline=True: a frame dispatched BEFORE the robot starts moving
        must be dropped (collected, not published) — the scene it saw no
        longer exists by the time the robot is back home."""
        from pointnetgpd_tpu.robot.node import run_ros_node

        pts = np.random.RandomState(0).rand(64, 3).astype(np.float32)
        # call 1: home (frame 1 dispatched, held in flight); call 2: away
        # (in-flight frame must be dropped); call 3: home (frame 2)
        published, params, state = _fake_ros_modules(
            monkeypatch, _fake_pc2(pts), away_on_calls=(2,))
        det = _FakeDetector()
        run_ros_node(det, cam_pos=np.zeros(3), max_frames=2, pipeline=True)
        assert len(det.frames_seen) == 2          # both frames processed
        glist = published["/detect_grasps/clustered_grasps"]
        assert len(glist) == 1                    # stale frame 1 NOT published

    def test_publish_all_and_home_gating(self, monkeypatch):
        """robot_at_home=false defers processing for one tick; publish_all
        sends the whole ranked list."""
        published, params, state, det, _ = self._run(
            monkeypatch, publish_all=True, robot_away_first=True)
        # gated tick: one sleep before any frame was processed
        assert state["sleeps"] >= 1 and len(det.frames_seen) == 1
        glist = published["/detect_grasps/clustered_grasps"]
        assert len(glist[0].grasps) == 2


class TestDetectorPresets:
    """DetectorConfig.reference_parity() / .production(): parity audits and
    benchmark reproduction are each ONE switch (round-3 advisor finding —
    previously three-plus scattered flags)."""

    def test_reference_parity_implies_reference_flow(self):
        from pointnetgpd_tpu.robot.node import DetectorConfig

        cfg = DetectorConfig.reference_parity()
        assert cfg.lazy_normals is False          # whole-cloud normals pass
        assert cfg.upload_dtype == "float32"      # bit-exact upload
        assert cfg.normal_window == 0             # exact all-pairs KNN
        assert cfg.adaptive_bucket is False       # raw-count buckets only
        assert cfg.sampler_exact is True          # exact seed-window top-k

    def test_production_is_the_benchmarked_config(self):
        from pointnetgpd_tpu.robot.node import DetectorConfig

        cfg = DetectorConfig.production()
        assert cfg.lazy_normals is True
        assert cfg.upload_dtype == "float16"
        assert cfg.normal_window == 2048
        assert cfg.adaptive_bucket is True
        assert cfg.sampler_exact is False

    def test_overrides_compose(self):
        from pointnetgpd_tpu.robot.node import DetectorConfig

        cfg = DetectorConfig.production(num_grasps=8, cloud_pad_to=512)
        assert cfg.num_grasps == 8 and cfg.cloud_pad_to == 512
        assert cfg.adaptive_bucket is True
        par = DetectorConfig.reference_parity(normal_k=10)
        assert par.normal_k == 10 and par.upload_dtype == "float32"

    def test_parity_preset_runs_a_frame(self):
        """The parity preset must actually execute end to end (exact
        whole-cloud normals + exact sampler KNN on a small scene)."""
        from pointnetgpd_tpu.grasping.gripper import Gripper
        from pointnetgpd_tpu.inference.scorer import GraspScorer
        from pointnetgpd_tpu.models.pointnet import init_pointnet_cls
        from pointnetgpd_tpu.robot.node import DetectorConfig, GraspDetector

        rng = np.random.RandomState(2)
        n = 400
        top = rng.rand(n, 3) * [0.06, 0.06, 0] + [0, 0, 0.08]
        front = rng.rand(n, 3) * [0.06, 0, 0.06] + [0, 0, 0.02]
        pts = np.concatenate([top, front]).astype(np.float32)
        pts[:, :2] -= 0.03
        params, state = init_pointnet_cls(jax.random.PRNGKey(0),
                                          input_chann=3, k=3)
        scorer = GraspScorer(params=params, state=state, k=3,
                             num_points=128, pad_to=16)
        det = GraspDetector(scorer, Gripper(), DetectorConfig.reference_parity(
            num_grasps=12, max_num_samples=32, input_points_num=128,
            minimal_points_send_to_point_net=5, cloud_pad_to=1024))
        out = det.process_frame(pts, np.array([0.5, 0.5, 1.0], np.float32))
        assert np.isfinite(out["all_scores"]).all()
        assert out["all_frames"].shape[1:] == (5, 3)


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


class TestWarmup:
    def test_warmup_compiles_each_bucket(self):
        from pointnetgpd_tpu.inference.scorer import GraspScorer
        from pointnetgpd_tpu.models.pointnet import init_pointnet_cls
        from pointnetgpd_tpu.robot.node import DetectorConfig, GraspDetector

        params, state = init_pointnet_cls(jax.random.PRNGKey(0),
                                          input_chann=3, k=3)
        scorer = GraspScorer(params=params, state=state, k=3, num_points=64,
                             pad_to=16)
        det = GraspDetector(
            scorer, config=DetectorConfig(
                num_grasps=8, max_num_samples=8, input_points_num=64,
                repeat=1, minimal_points_send_to_point_net=5,
                cloud_pad_to=512))
        buckets = det.warmup(max_points=1024)
        assert buckets == [512, 1024]
