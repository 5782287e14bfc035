"""Online grasp-detection node: the kinect2grasp equivalent.

Re-design of the reference's ROS node (reference:
dex-net/apps/kinect2grasp.py:110-556): the per-frame pipeline — voxel
downsample, surface normals, GPG candidate sampling, closing-region crops,
per-candidate scoring with repeat voting, ranking — runs as a handful of
batched device calls (the reference uses 20 sampler worker processes and a
per-candidate batch-1 torch loop, :157-173,454-497). ROS stays host-side:
``GraspDetector.process_frame`` is pure (testable without ROS) and
``run_ros_node`` wires it to the same topics (/table_top_points in,
gripper MarkerArray + GraspConfigList out, :400-424).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..grasping.gripper import Gripper
from ..grasping.samplers import gpg_sample_candidates
from ..inference.scorer import GraspScorer
from ..ops.cloud import estimate_normals_knn, voxel_downsample  # noqa: F401 (re-export)
from ..ops.cloud import estimate_normals_knn_window, voxel_downsample_packed


def remove_table_points(points: np.ndarray, z_thresh: float = 0.005,
                        table_z: float = 0.0) -> np.ndarray:
    """Drop points within z_thresh of the table plane
    (kinect2grasp.py remove_table_points; the reference fits the plane with
    RANSAC — the table frame here already has z=0 as the table)."""
    return points[points[:, 2] > table_z + z_thresh]


def remove_grasp_outside_tray(frames: np.ndarray, tray_x=(-0.2, 0.2),
                              tray_y=(-0.2, 0.2)) -> np.ndarray:
    """Keep grasps whose bottom centers fall inside the tray bounds
    (kinect2grasp.py:370-388 remove_grasp_outside_tray: checks the finger
    footprint against the tray rectangle)."""
    frames = np.asarray(frames)
    bc = frames[:, 0]
    ok = ((bc[:, 0] > tray_x[0]) & (bc[:, 0] < tray_x[1])
          & (bc[:, 1] > tray_y[0]) & (bc[:, 1] < tray_y[1]))
    return frames[ok]


@dataclass
class DetectorConfig:
    """Online-path parameters (kinect2grasp.py:42-63,429 + sampler params)."""

    num_grasps: int = 40                # candidate budget per frame
    max_num_samples: int = 150          # GPG seed budget
    n_voxel: int = 500                  # voxel grid resolution
    normal_k: int = 30                  # pcl KSearch=30
    input_points_num: int = 500         # crop resample size
    minimal_points_send_to_point_net: int = 20
    repeat: int = 1                     # vote repeats (:429)
    select_point_above_table: float = 0.010
    # pad the downsampled cloud up to a multiple of this so the jitted
    # pipeline compiles once per size bucket instead of once per frame
    # (the voxel count is different every frame; an unpadded P recompiles
    # normals + sampler + scorer each time, ~30-70 s on a cold chip)
    cloud_pad_to: int = 8192
    # pad the RAW input cloud the same way (by repeating a point, which
    # lands in an existing voxel and changes nothing) — the jitted voxel
    # downsample otherwise recompiles for every distinct raw frame size.
    # None: use cloud_pad_to (then warmup() covers both bucket families).
    raw_pad_to: int | None = None
    # Morton-window KNN normals (O(P*window) instead of O(P^2)) kick in
    # for clouds larger than this window; 0 disables every windowed
    # approximation — including lazy_normals, which is built on the same
    # seed-window estimator — forcing whole-cloud all-pairs normals
    normal_window: int = 2048
    # estimate normals LAZILY inside the GPG seed windows only (the sampler
    # is the frame pipeline's sole normals consumer): skips the whole-cloud
    # normals pass (~28 ms at the 82k bucket), same statistical trade as
    # the window estimator. False restores the reference-shaped flow
    # (whole-cloud normals, kinect2grasp.py:131-144).
    lazy_normals: bool = True
    # adaptive size buckets: size the cloud bucket from the PREVIOUS frame's
    # voxel count (x margin, bucket-rounded, capped by the raw-count bound)
    # instead of the raw count alone. Depth streams are temporally coherent
    # and the voxel count is typically far below the raw count (84k raw ->
    # ~25k voxels), so the pipeline stops paying for phantom points; if a
    # frame's count overflows its bucket (scene suddenly grew), collect
    # detects it host-side and transparently reprocesses that frame at the
    # raw-bound bucket (bit-identical to adaptive_bucket=False, tested).
    # Default False so frame results depend only on (cloud, seed), not on
    # the stream history — but the default then pays normals/sampler work
    # proportional to the RAW count: organized depth streams with heavy
    # voxel collapse (2-5x at 84k raw, docs/SCALING.md) should turn this on
    # for production (the measured 84k-stream numbers use it).
    adaptive_bucket: bool = False
    adaptive_margin: float = 1.25
    # host->device dtype for the RAW cloud upload. The tunneled relay moves
    # ~100 MB/s with a ~9 ms fixed cost, so the 1.2 MB fp32 upload of a 98k
    # frame is ~20 ms — the largest single stage of the lazy-normals frame.
    # float16 halves the bytes (measured 21.5 -> 15.4 ms) at a max
    # quantization error of half an fp16 ULP — ~0.25-0.5 mm at coordinates
    # in [0.5, 2) m — below the ~2 mm voxel grid and any depth sensor's
    # noise. "float32" restores a bit-exact upload.
    upload_dtype: str = "float16"
    # force exact top-k neighbor selection inside the GPG sampler's
    # seed-window frames (grasping/samplers.py gpg_sample_candidates
    # ``exact``); parity audits pin the reference's exact-KNN semantics
    sampler_exact: bool = False
    # candidate crop convention: "reference" = the kinect2grasp box
    # (x in (0, hand_depth) from the hand bottom, :216-233) — which is NOT
    # the frame the classifier was trained in (the dataset crop is
    # grasp-CENTERED, dataset.py:50-69; the reference deploys with this
    # mismatch and every crop arrives ~hand_depth/2 off-distribution —
    # docs/QUIRKS.md). "dataset" = re-center each crop to the training
    # convention (ops/crop.collect_candidate_clouds recenter)
    crop_mode: str = "reference"
    # GPG seed selection bias: "none" = uniform over above-table points
    # (the reference's online behavior, kinect2grasp.py:145-147);
    # "height" = Gaussian-over-height Gumbel-top-k weighting toward
    # mid-height (side-visible) surfaces — the only seeds the downward
    # guard can ever accept (docs/QUIRKS.md), so the same seed budget
    # yields several times more candidates on tabletop scenes
    # (measured funnel: docs/FUNNEL.md)
    seed_bias: str = "none"

    @classmethod
    def reference_parity(cls, **overrides) -> "DetectorConfig":
        """The reference-shaped flow in ONE switch: whole-cloud exact
        all-pairs KNN normals computed up front (kinect2grasp.py:131-144),
        bit-exact fp32 upload, raw-count size buckets, exact seed-window
        KNN. Every windowed/lazy/lossy production shortcut off — use this
        for parity audits against the reference pipeline."""
        cfg = dict(lazy_normals=False, upload_dtype="float32",
                   normal_window=0, adaptive_bucket=False,
                   sampler_exact=True, seed_bias="none",
                   crop_mode="reference")
        cfg.update(overrides)
        return cls(**cfg)

    @classmethod
    def production(cls, **overrides) -> "DetectorConfig":
        """The exact configuration behind the benchmarked stream numbers
        (docs/SCALING.md 84k-raw frame measurements): lazy seed-window
        normals, fp16 relay upload, Morton-window KNN, adaptive voxel-count
        buckets. Statistical approximations with measured error bars
        (docs/NORMAL_APPROX.md); results depend on stream history via the
        bucket predictor. Round 5 adds crop_mode="dataset": candidate
        crops are re-centered to the TRAINING frame convention (the
        reference deploys with a train/deploy crop mismatch that pushes
        every input off-distribution — docs/QUIRKS.md)."""
        cfg = dict(lazy_normals=True, upload_dtype="float16",
                   normal_window=2048, adaptive_bucket=True,
                   sampler_exact=False, seed_bias="none",
                   crop_mode="dataset")
        cfg.update(overrides)
        return cls(**cfg)


class GraspDetector:
    """Scene cloud -> ranked good grasps, all-device pipeline.

    Multi-chip: construct the scorer with a ``jax.sharding.Mesh``
    (``GraspScorer(mesh=...)``) and the WHOLE frame pipeline composes over
    it — window-KNN normals shard the query-chunk axis, the GPG sampler
    shard_maps the (seed x theta) frame axis, and scoring shards the
    candidate axis, all against the replicated scene cloud (zero
    collectives; the chip-level analogue of kinect2grasp.py's 20-process
    fan-out, :157-173). Results equal single-device up to per-shard fusion
    rounding; validated by ``__graft_entry__.dryrun_multichip`` and
    tests/test_robot.py.
    """

    def __init__(self, scorer: GraspScorer, gripper: Gripper = Gripper(),
                 config: DetectorConfig | None = None):
        self.scorer = scorer
        self.gripper = gripper
        self.cfg = config or DetectorConfig()
        self.mesh = getattr(scorer, "mesh", None)  # GPD scorer has no mesh
        self.scorer.num_points = self.cfg.input_points_num
        self.scorer.repeat = self.cfg.repeat
        self.scorer.min_points = self.cfg.minimal_points_send_to_point_net
        self.scorer.crop_recenter = self.cfg.crop_mode == "dataset"
        self._last_voxel_count: int | None = None  # adaptive_bucket state

    def warmup(self, max_points: int, cam_pos=(1.0, 1.0, 1.0)):
        """Pre-compile the pipeline for every cloud size bucket up to
        ``max_points`` (raw points per frame). First compiles cost 30-70 s
        each on a cold chip; a robot node calls this once before
        subscribing so no live frame pays them. With the default
        ``raw_pad_to`` (== cloud_pad_to) each warmup iteration compiles
        both the raw-bucket downsample program and the cloud-bucket
        normals/sampler/scorer programs, so any live frame up to
        ``max_points`` raw points hits only compiled shapes. Returns the
        list of bucket sizes compiled."""
        rng = np.random.RandomState(0)
        buckets = list(range(self.cfg.cloud_pad_to,
                             max_points + self.cfg.cloud_pad_to,
                             self.cfg.cloud_pad_to))
        for b in buckets:
            # sparse synthetic blob: points spread over ~0.4 m survive the
            # voxel downsample essentially 1:1, so a (b - pad/2)-point cloud
            # lands exactly in bucket b
            n = b - self.cfg.cloud_pad_to // 2
            pts = (rng.rand(n, 3) * 0.4 - 0.2).astype(np.float32)
            pts[:, 2] = np.abs(pts[:, 2]) + 0.02
            # _force_bound pins the cloud bucket to b even when
            # adaptive_bucket would shrink it from a previous iteration's
            # voxel count — every bucket must actually compile
            self.collect_frame(self.dispatch_frame(
                pts, np.asarray(cam_pos, np.float32), _force_bound=True))
        # synthetic blob counts are not a prior for live frames: let the
        # first live frame use the raw bound rather than redo on overflow
        self._last_voxel_count = None
        return buckets

    def process_frame(self, points: np.ndarray, cam_pos: np.ndarray,
                      seed: int = 0, funnel: bool = False):
        """One frame: returns dict with candidates, scores, and the ranked
        good grasps as (5, 3) frames [bottom_center, approach, binormal,
        minor, bottom_center_modified]. ``points`` in the result is the
        downsampled cloud as a DEVICE array (fetch with np.asarray if
        needed — it is deliberately not pulled through the relay here).

        Exactly ONE device->host transfer per frame: the size bucket is
        derived host-side from the RAW point count (downsampled count <=
        raw count, both bucket-padded), so the voxel count no longer needs
        its own fetch before the pipeline runs — it rides the scorer's
        combined fetch instead. On this relay a fetch costs 10-30 ms
        regardless of size (docs/SCALING.md), about a third of the frame.

        ``funnel=True`` adds a per-guard rejection table to the result
        (``result["funnel"]``, keys = grasping.samplers.FUNNEL_STAGES):
        how many (seed x theta) frames survive each GPG guard. Debug-only
        — it disables the sampler's pre-guard block pruning, so the frame
        costs more; the counts ride the frame's single fetch.
        """
        return self.collect_frame(
            self.dispatch_frame(points, cam_pos, seed, funnel=funnel))

    def dispatch_frame(self, points: np.ndarray, cam_pos: np.ndarray,
                       seed: int = 0, _force_bound: bool = False,
                       funnel: bool = False):
        """Dispatch-only half of ``process_frame``: enqueue the whole frame
        pipeline (downsample -> normals -> GPG -> crop+score) and return a
        pending handle with ZERO device->host transfers. Pair with
        ``collect_frame``; ``process_frames`` uses the split to keep one
        frame in flight so the device computes frame N+1 while the host
        waits out frame N's relay fetch."""
        cfg = self.cfg
        points = np.asarray(points, np.float32)
        # keep the UNPADDED cloud for the overflow redo: re-dispatching the
        # raw-padded array would re-derive n_raw (and so the bound bucket)
        # from the padded length, which differs from adaptive_bucket=False
        # whenever raw_pad_to is coarser than cloud_pad_to
        points_orig = points

        # pad the RAW cloud to a size bucket by repeating the first point
        # (same voxel -> downsample result unchanged): the jitted downsample
        # compiles per raw shape, and live frames all have different sizes
        raw_pad = cfg.raw_pad_to or cfg.cloud_pad_to
        n_raw = len(points)
        if n_raw > 0:
            raw_bucket = -(-n_raw // raw_pad) * raw_pad
            if raw_bucket > n_raw:
                points = np.concatenate(
                    [points, np.repeat(points[:1], raw_bucket - n_raw, 0)])

        # voxel downsample, compacted ON DEVICE (kinect2grasp.py:102-127);
        # nothing crosses the relay here — the count rides the final fetch.
        # The upload itself rides cfg.upload_dtype (fp16 halves the relay
        # bytes; cast back to f32 on device before any geometry)
        if cfg.upload_dtype == "float16":
            pts_up = jnp.asarray(points.astype(np.float16)) \
                .astype(jnp.float32)
        else:
            pts_up = jnp.asarray(points)
        packed, count = voxel_downsample_packed(pts_up, n_grid=cfg.n_voxel)

        # size bucket from the RAW count (an upper bound on the voxel
        # count): dummy sentinel points far BELOW the table are never seeds
        # (above-table filter), never in a closing region, and never the
        # neighbor of a real point — one compile per bucket, not per frame.
        # packed's tail is already the -1e6 sentinel.
        bound_bucket = max(-(-max(n_raw, 1) // cfg.cloud_pad_to), 1) \
            * cfg.cloud_pad_to
        bucket = bound_bucket
        if (cfg.adaptive_bucket and not _force_bound
                and self._last_voxel_count is not None):
            # temporally-coherent streams: last frame's voxel count (which
            # rode that frame's fetch) x margin predicts this frame's; the
            # raw bound stays the cap, and collect_frame reprocesses at the
            # bound on the rare overflow (count > bucket would otherwise
            # silently truncate real points — packed is real-points-first)
            est = int(self._last_voxel_count * cfg.adaptive_margin) + 1
            est_bucket = max(-(-est // cfg.cloud_pad_to), 1) \
                * cfg.cloud_pad_to
            bucket = min(bound_bucket, est_bucket)
        if bucket <= packed.shape[0]:
            pts_dev = packed[:bucket]
        else:
            pts_dev = jnp.concatenate([
                packed, jnp.full((bucket - packed.shape[0], 3), -1e6,
                                 packed.dtype)])

        # surface normals, camera-consistent (kinect2grasp.py:131-144);
        # Morton-window KNN for big buckets (near-linear in P), with the
        # REAL cloud's bbox so the -1e6 sentinel tail can't collapse the
        # Morton cells (it sorts to a corner and is never a neighbor).
        # lazy_normals skips this pass entirely: the sampler estimates
        # normals inside its seed windows on demand.
        cam = jnp.asarray(cam_pos, jnp.float32)
        finite = pts_dev[:, 0] > -9.9e5
        big = jnp.asarray(1e9, pts_dev.dtype)
        lo = jnp.min(jnp.where(finite[:, None], pts_dev, big), axis=0)
        hi = jnp.max(jnp.where(finite[:, None], pts_dev, -big), axis=0)
        ok = jnp.any(finite)
        lo = jnp.where(ok, lo, 0.0)
        hi = jnp.where(ok, hi, 1.0)
        if cfg.lazy_normals and cfg.normal_window:
            # normal_window=0 wins over lazy_normals: lazy estimation IS
            # the windowed approximation, so "always all-pairs" must fall
            # through to the whole-cloud exact path below
            normals = None
        elif cfg.normal_window and pts_dev.shape[0] > cfg.normal_window:
            normals = estimate_normals_knn_window(
                pts_dev, cam, k=cfg.normal_k, window=cfg.normal_window,
                bbox=(lo, hi), mesh=self.mesh, exact=cfg.sampler_exact)
        else:
            # sampler_exact also pins the whole-cloud neighbor selection
            # (the reference's pcl KSearch is an exact KNN) — the parity
            # preset turns every approx_min_k in the frame into top_k
            normals = estimate_normals_knn(pts_dev, cam, k=cfg.normal_k,
                                           exact=cfg.sampler_exact)

        # GPG candidates (kinect2grasp.py:154-173 -> grasp_sampler.py:1389+)
        key = jax.random.PRNGKey(seed)
        k_gpg, k_score = jax.random.split(key)
        cand = gpg_sample_candidates(
            pts_dev, normals, k_gpg, self.gripper,
            num_seeds=cfg.max_num_samples,
            min_points_above_table=cfg.select_point_above_table,
            mesh=self.mesh, camera_pos=cam, bbox=(lo, hi),
            normal_k=cfg.normal_k,
            normal_window=cfg.normal_window, exact=cfg.sampler_exact,
            seed_bias=cfg.seed_bias, debug=funnel)
        if funnel:
            cand, funnel_dev = cand
        # compact valid candidates ON DEVICE (stable: original order) into a
        # FIXED num_grasps buffer (varying lengths would recompile the jitted
        # scorer every frame) with a validity mask; fetching all ~2850 GPG
        # frames through the relay costs more than scoring them. n_valid
        # stays a device scalar here — it rides the scorer's single fetch
        # (each separate fetch through the relay is a host round trip).
        n_valid_dev = jnp.sum(cand.valid)
        order0 = jnp.argsort(~cand.valid, stable=True)
        frames = jnp.take(cand.frames, order0[:cfg.num_grasps], axis=0)
        frame_valid = jnp.arange(cfg.num_grasps) < n_valid_dev

        # crop + batched scoring + vote + rank (kinect2grasp.py:443-514);
        # the padded cloud keeps the scorer's jit shape per-bucket stable.
        # ONE device->host transfer for scores + frames + valid count +
        # voxel count (the frame's only fetch) — deferred to collect_frame.
        extra = (frames, n_valid_dev, count)
        if funnel:
            extra = extra + (funnel_dev,)
        pending = self.scorer.dispatch_candidates(
            pts_dev, frames, hand_depth=self.gripper.hand_depth,
            width=self.gripper.open_width, seed=seed + 1,
            valid=frame_valid, extra_fetch=extra)
        return pending, pts_dev, bucket, points_orig, cam_pos, seed

    def collect_frame(self, dispatched):
        """Fetch half of ``process_frame``: performs the frame's single
        device->host transfer and the host postprocess. If an adaptive
        bucket overflowed (voxel count > bucket — real points would have
        been truncated), transparently reprocesses the frame at the
        raw-bound bucket (bit-identical to adaptive_bucket=False)."""
        cfg = self.cfg
        pending, pts_dev, bucket, raw_pts, cam_pos, seed = dispatched
        result, extras = self.scorer.collect(pending)
        frames_np, n_valid, n_real = extras[:3]
        funnel = ({k: (int(v) if np.ndim(v) == 0 else np.asarray(v))
                   for k, v in extras[3].items()}
                  if len(extras) > 3 else None)
        n_real = int(n_real)
        self._last_voxel_count = n_real
        if n_real > bucket:  # adaptive bucket too small for this frame
            redo = self.dispatch_frame(raw_pts, cam_pos, seed=seed,
                                       _force_bound=True,
                                       funnel=funnel is not None)
            return self.collect_frame(redo)
        pts = pts_dev[:n_real]  # device view of the real cloud
        keep = min(cfg.num_grasps, int(n_valid))
        frames_np = frames_np[:keep]
        # good requires valid, so ranked indices are < keep by construction;
        # the filter also covers keep == 0 (no early return needed)
        order = result["good_indices"]
        order = order[order < keep]
        out = {
            "grasps": frames_np[order],
            "scores": result["score"][order],
            "pred": result["pred"][:keep],
            "all_frames": frames_np,
            "all_scores": result["score"][:keep],
            "counts": result["counts"][:keep],
            "points": pts,
            "n_valid": int(n_valid),
        }
        if funnel is not None:
            out["funnel"] = funnel
        return out

    def process_frames(self, frames_iter, cam_pos, start_seed: int = 0):
        """Pipelined frame stream: yields ``process_frame`` results for each
        cloud in ``frames_iter``, keeping ONE frame in flight — frame N+1 is
        dispatched before frame N's fetch, so the device computes the next
        frame while the host waits out the relay round trip and runs the
        numpy postprocess. On a real TPU host this hides the fetch latency
        entirely; on the tunneled relay here the fetch drains the whole
        device queue, so the overlap is limited to host-side work (measured
        honestly as bench.py's ``online_frame_pipelined_ms`` extra). Adds
        one frame of result latency relative to the serial loop.

        With ``adaptive_bucket`` the bucket predictor lags one EXTRA frame
        (frame N+1 is dispatched before frame N's voxel count is fetched,
        so it is sized from frame N-1's): bucket choices — and therefore
        the PRNG-dependent candidate draws — can differ from a serial
        ``process_frame`` loop over the same stream. Both are equally valid
        samples; overflow redo still guarantees no frame truncates real
        points."""
        pending = None
        for i, points in enumerate(frames_iter):
            nxt = self.dispatch_frame(points, np.asarray(cam_pos, np.float32),
                                      seed=start_seed + i)
            if pending is not None:
                yield self.collect_frame(pending)
            pending = nxt
        if pending is not None:
            yield self.collect_frame(pending)


def run_ros_node(detector: GraspDetector, cam_pos, *,
                 cloud_topic: str = "/table_top_points",
                 marker_topic: str = "gripper_vis",
                 grasp_topic: str = "/detect_grasps/clustered_grasps",
                 rate_hz: float = 10.0, publish_all: bool = False,
                 max_frames: int | None = None, pipeline: bool = False):
    """ROS wrapper: same topics/params as the reference node
    (kinect2grasp.py:400-424 setup, :412-418 robot_at_home gating, :516-553
    output: markers for every ranked good grasp, then the BEST grasp as a
    single-element GraspConfigList — the reference comments out the full-list
    publish; ``publish_all=True`` restores it). Requires rospy +
    gpd_grasp_msgs + visualization_msgs at runtime. ``max_frames`` bounds the
    number of processed frames (None = run until shutdown).

    ``pipeline=True`` keeps one frame in flight (dispatch frame N+1 before
    fetching frame N's results — GraspDetector.process_frames semantics):
    higher frame throughput at the cost of one frame of publish latency."""
    import rospy
    from gpd_grasp_msgs.msg import GraspConfigList
    from sensor_msgs.msg import PointCloud2
    from visualization_msgs.msg import MarkerArray

    from .pointclouds import pointcloud2_to_xyz_array
    from .ros_messages import grasp_config_list_msg, gripper_marker_array

    rospy.init_node("grasp_tf_broadcaster", anonymous=True)
    pub_markers = rospy.Publisher(marker_topic, MarkerArray, queue_size=1)
    pub_grasps = rospy.Publisher(grasp_topic, GraspConfigList, queue_size=1)
    rate = rospy.Rate(rate_hz)
    # simulation default, like the reference (:404); get_ur5_robot_state.py's
    # equivalent (robot/robot_state.py) overwrites it on a real robot
    rospy.set_param("/robot_at_home", "true")

    def publish(out):
        if len(out["grasps"]) == 0:
            rospy.loginfo("No good grasps this frame.")
            return
        pub_markers.publish(
            gripper_marker_array(out["grasps"], detector.gripper))
        n_pub = len(out["grasps"]) if publish_all else 1
        pub_grasps.publish(grasp_config_list_msg(
            out["grasps"][:n_pub], out["scores"][:n_pub]))
        rospy.loginfo("Published %d of %d ranked grasps",
                      n_pub, len(out["grasps"]))

    seed = frames = 0
    pending = None
    while not rospy.is_shutdown():
        if rospy.get_param("/robot_at_home") == "false":
            if pending is not None:
                # drop (collect, don't publish) the in-flight frame: it was
                # captured before the robot moved, and holding it would
                # publish grasps for a scene that no longer exists once the
                # robot returns home
                detector.collect_frame(pending)
                pending = None
            rospy.loginfo("Robot is moving, waiting for it to go home.")
            rate.sleep()
            continue
        msg = rospy.wait_for_message(cloud_topic, PointCloud2)
        frames += 1
        if msg.data:
            points = pointcloud2_to_xyz_array(msg)
            if pipeline:
                # one frame in flight: the device computes this frame while
                # the host fetches + publishes the previous one
                nxt = detector.dispatch_frame(points, cam_pos, seed=seed)
                if pending is not None:
                    publish(detector.collect_frame(pending))
                pending = nxt
            else:
                publish(detector.process_frame(points, cam_pos, seed=seed))
            seed += 1
        else:
            rospy.loginfo("No points on the table, waiting...")
        if max_frames is not None and frames >= max_frames:
            break
        rate.sleep()
    if pending is not None:  # drain the in-flight frame
        publish(detector.collect_frame(pending))
