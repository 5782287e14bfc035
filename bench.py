"""Benchmark: grasp candidates scored/sec (750-pt clouds) on TPU vs the
reference PyTorch path, plus train samples/sec/chip.

The baseline is the reference's actual deployment pattern: per-candidate
batch-size-1 torch CPU calls through PointNetCls with host numpy cropping
(reference: dex-net/apps/kinect2grasp.py:454-497, main_test.py:59-69). The
reference publishes no numbers (BASELINE.md), so the baseline is measured
here, on this machine, with the reference's own model code when available
(else a skipped vs_baseline).

TIMING METHODOLOGY (fetch-bounded): on this TPU attachment (a tunneled
relay), ``jax.block_until_ready`` does NOT reliably wait for execution —
dispatch is deeply asynchronous and "block-timed" loops measure only Python
dispatch cost (measured: an 8192^3 matmul "completes" in 0.05 ms that way).
The only trustworthy clock is a device->host fetch, which serializes with
all previously enqueued programs (in-order device execution). So every
timing loop here is bounded by a 4-byte fetch of a device-side scalar slice
of the final output: wall = n*compute + one small fetch, amortized over n.
Inputs vary per iteration (fresh PRNG keys / rotating buffers) because the
relay can also elide re-dispatch of identical (executable, args) pairs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

UN-VOIDABLE EMIT CONTRACT: the JSON line is printed on EVERY exit path —
normal completion, any exception, SIGTERM/SIGINT (the driver's `timeout`
sends SIGTERM first), and a watchdog deadline (BENCH_DEADLINE_S, default
1500 s) that fires before typical external kill budgets. Results are staged
into the output dict as each benchmark family completes, so a mid-run kill
still publishes the families that finished; a dead backend publishes
{"value": null, "error": ...} instead of nothing. (Round 3's bench was
voided by an unbounded backend-retry loop that printed only at the very
end: BENCH_r03.json rc=124, parsed=null.)
"""

import json
import os
import signal
import sys
import threading
import time

import numpy as np

NUM_POINTS = 750
N_CANDIDATES = 512
SCENE_POINTS = 20000
REF_ROOT = "/root/reference/PointNetGPD"

# ---------------------------------------------------------------------------
# Staged single-emit machinery: RESULT is mutated in place as families finish;
# _emit_once prints it exactly once, whichever exit path gets there first.
# ---------------------------------------------------------------------------

RESULT = {
    "metric": "grasp_candidates_scored_per_sec_750pt",
    "value": None,
    "unit": "candidates/s",
    "vs_baseline": None,
    "extras": {
        "timing": "fetch-bounded (block_until_ready does not block on this "
                  "attachment)",
    },
}
_EMIT_LOCK = threading.Lock()
_EMITTED = False


def _emit_once(error: str | None = None) -> None:
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _EMITTED = True
        if error and RESULT["value"] is None:
            RESULT["error"] = error
        elif error:
            RESULT["extras"]["partial"] = error
        print(json.dumps(RESULT), flush=True)


def _install_emit_guards(deadline_s: float) -> None:
    """Emit the staged result on SIGTERM/SIGINT and at a hard deadline."""

    def _on_signal(signum, frame):
        _emit_once(error=f"killed by signal {signum} mid-run")
        os._exit(0)

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _on_signal)
        except (ValueError, OSError):
            pass  # non-main thread / restricted env

    def _on_deadline():
        _emit_once(error=f"watchdog deadline {deadline_s:.0f}s hit mid-run")
        os._exit(0)

    t = threading.Timer(deadline_s, _on_deadline)
    t.daemon = True
    t.start()


def _sync(x):
    """Serialize with the device: 4-byte fetch of a scalar slice of ``x``.

    The slice is computed on device (queued after everything else), so its
    arrival on the host proves all prior work finished. Never fetch whole
    arrays here — multi-MB transfers through the relay take seconds.
    """
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    float(leaf.ravel()[0])


def _timed(make_fn, n, reps=3):
    """Fetch-bounded timing: best-of-``reps`` of (n dispatches + one sync).

    make_fn(i) must dispatch iteration i with per-iteration-varying inputs
    and return a device output to anchor the sync.
    """
    out = make_fn(0)
    _sync(out)  # compile + drain the queue
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for i in range(n):
            out = make_fn(i)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def _wait_for_backend(max_tries: int = 3, sleep_s: float = 30.0,
                      probe_timeout_s: float = 60.0):
    """The tunneled TPU attachment occasionally refuses to initialize for a
    few minutes (UNAVAILABLE at backend setup). Retry with a TIGHT bound —
    worst case 3x60s probes + 2x30s sleeps = 4 min — so a relay outage
    surfaces as an explicit error JSON line well inside the driver's kill
    budget instead of voiding the run (the round-3 failure mode).

    Probes in a FRESH subprocess each try: a failed in-process init can
    leave jax's global backend dict holding only the already-initialized
    CPU platform, and a second in-process jax.devices() then "succeeds"
    on that cached CPU-only set — the whole TPU benchmark would silently
    run (and publish headline numbers) on CPU. After the subprocess says
    the accelerator is up, the in-process init below sees it first try;
    a CPU-only result is an error unless BENCH_ALLOW_CPU=1."""
    import subprocess

    probe = ("import jax; "
             "print('BACKEND=' + jax.default_backend())")
    for attempt in range(max_tries):
        try:
            out = subprocess.run(
                [sys.executable, "-c", probe], capture_output=True,
                text=True, timeout=probe_timeout_s).stdout
        except subprocess.TimeoutExpired:
            out = ""
        backend = out.split("BACKEND=")[-1].strip() if "BACKEND=" in out else None
        if backend and (backend != "cpu" or os.environ.get("BENCH_ALLOW_CPU")):
            import jax

            jax.devices()
            RESULT["extras"]["backend"] = backend
            return
        if attempt == max_tries - 1:
            raise RuntimeError(
                f"accelerator backend never initialized (last probe: "
                f"{backend or 'init failed/hung'}); set BENCH_ALLOW_CPU=1 "
                f"to benchmark on CPU anyway")
        print(f"# backend probe got {backend or 'failure'}; retry "
              f"{attempt + 1}/{max_tries - 1} in {sleep_s:.0f}s",
              file=sys.stderr, flush=True)
        time.sleep(sleep_s)


def bench_tpu(baseline):
    # backend first, cache second: enabling the cache needs no backend, but
    # keeping ALL jax initialization behind the subprocess probe preserves
    # the probe's guarantee (no half-initialized CPU-only backend dict).
    _wait_for_backend()
    from pointnetgpd_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from pointnetgpd_tpu.inference.scorer import score_candidates_fused
    from pointnetgpd_tpu.models.pointnet import init_pointnet_cls

    params, state = init_pointnet_cls(jax.random.PRNGKey(0), input_chann=3, k=3)

    # chip-health anchor, recorded FIRST: an 8192^3 fp32 matmul measures
    # ~10.2 ms (108 TFLOP/s) on this attachment when healthy; the tunneled
    # relay occasionally degrades 20-50x for tens of minutes (observed
    # 217-564 ms during round 5). Recording it with every capture makes a
    # degraded-relay bench self-diagnosing instead of silently 20x slow.
    mm_a = jnp.ones((8192, 8192), jnp.float32)
    mm_f = jax.jit(lambda x, y: x @ y)

    def _anchor(i):
        return mm_f(mm_a + np.float32(i), mm_a)

    anchor_ms = _timed(_anchor, n=4) * 1e3
    RESULT["extras"]["matmul_anchor_8192_ms"] = round(anchor_ms, 1)

    rs = np.random.RandomState(0)
    pc = (rs.rand(SCENE_POINTS, 3) * [0.08, 0.06, 0.05]).astype(np.float32)
    centers = (rs.rand(N_CANDIDATES, 3) * [0.08, 0.06, 0.05]).astype(np.float32)
    centers[:, 0] -= 0.03
    cands = np.zeros((N_CANDIDATES, 5, 3), np.float32)
    cands[:, 0] = centers
    cands[:, 1] = [1, 0, 0]
    cands[:, 2] = [0, 1, 0]
    cands[:, 3] = [0, 0, 1]

    # end-to-end: crop + resample + forward + vote + rank, ONE device program
    # per scene (inference/scorer.py score_candidates_fused)
    pc_dev = jax.device_put(jnp.asarray(pc))
    cands_dev = jax.device_put(jnp.asarray(cands))
    valid_in = jnp.ones((N_CANDIDATES,), bool)

    def scene(seed):
        return score_candidates_fused(
            params, state, pc_dev, cands_dev, valid_in,
            jnp.float32(0.06), jnp.float32(0.08), jax.random.PRNGKey(seed),
            num_points=NUM_POINTS, repeat=1, min_points=10)

    dt = _timed(scene, n=20)
    cand_per_sec = N_CANDIDATES / dt
    RESULT["value"] = round(cand_per_sec, 1)
    RESULT["extras"]["scene_latency_ms_512_candidates"] = round(dt * 1e3, 2)
    if baseline:
        RESULT["vs_baseline"] = round(cand_per_sec / baseline, 2)

    # bf16 variant (GraspScorer.as_dtype path): memory knob, ~parity with
    # fp32 in speed (f32 matmuls already run bf16 MXU passes; README)
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.bfloat16), t)
    p16, s16 = cast(params), cast(state)

    def scene16(seed):
        return score_candidates_fused(
            p16, s16, pc_dev, cands_dev, valid_in,
            jnp.float32(0.06), jnp.float32(0.08), jax.random.PRNGKey(seed),
            num_points=NUM_POINTS, repeat=1, min_points=10)

    cand_per_sec_bf16 = N_CANDIDATES / _timed(scene16, n=20)
    RESULT["extras"]["bf16_candidates_per_sec"] = round(cand_per_sec_bf16, 1)

    # train samples/sec/chip (fused crop+fwd+bwd+Adam, batch 128)
    from pointnetgpd_tpu.parallel.mesh import batch_sharding, make_mesh, replicate_tree
    from pointnetgpd_tpu.training.data import SyntheticGraspData
    from pointnetgpd_tpu.training.train import (
        init_train_state, make_fused_train_step, make_optimizer,
    )

    mesh = make_mesh()
    n_chips = len(mesh.devices.flatten())
    tx = make_optimizer(0.005)
    batch = 128 * n_chips
    data = SyntheticGraspData(batch_size=batch, cloud_points=SCENE_POINTS)
    grasps, clouds, transforms, labels, weights = data.next_batch()
    sharding = batch_sharding(mesh)
    args = [jax.device_put(a, sharding)
            for a in (grasps, clouds, transforms, labels, weights)]

    def train_rate(compute_dtype):
        p2, bn2 = init_pointnet_cls(jax.random.PRNGKey(1), input_chann=3,
                                    k=2)
        tstate = replicate_tree(init_train_state(p2, bn2, tx), mesh)
        step_fn = make_fused_train_step(
            tx, num_points=NUM_POINTS, min_point_limit=50,
            compute_dtype=compute_dtype)
        box = {"state": tstate}

        def train_iter(i):
            st, m = step_fn(box["state"], *args, jax.random.PRNGKey(i))
            box["state"] = st
            return m["loss"]

        return batch / _timed(train_iter, n=10) / n_chips

    train_sps_chip = train_rate(None)                 # fp32 (parity mode)
    RESULT["extras"]["train_samples_per_sec_per_chip_750pt_b128"] = round(
        train_sps_chip, 1)
    train_sps_chip_bf16 = train_rate(jnp.bfloat16)    # mixed precision
    RESULT["extras"]["train_bf16_samples_per_sec_per_chip"] = round(
        train_sps_chip_bf16, 1)

    # dataset-generation labeling rate: antipodal sampling + friction-ladder
    # force-closure + Ferrari-Canny, all on device (generate-dataset-canny.py
    # runs 50 host processes per object for the same labels)
    from pointnetgpd_tpu.geometry.sdf import make_sdf
    from pointnetgpd_tpu.grasping.evaluation import (
        FC_LIST_LESS_CLASS, friction_boundary_labels,
    )
    from pointnetgpd_tpu.grasping.samplers import antipodal_sample_grasps

    dim, res, r = 48, 0.0025, 0.045
    origin = -res * (dim - 1) / 2 * np.ones(3)
    ii, jj, kk = np.meshgrid(*(np.arange(dim),) * 3, indexing="ij")
    grid_pts = origin + res * np.stack([ii, jj, kk], axis=-1)
    sphere = make_sdf(np.linalg.norm(grid_pts, axis=-1) - r, origin, res)
    fc = jnp.asarray(FC_LIST_LESS_CLASS)

    def label_round(seed):
        s = antipodal_sample_grasps(
            sphere, jax.random.PRNGKey(seed), max_width=0.10,
            friction_coef=float(FC_LIST_LESS_CLASS[0]), num_attempts=256,
            num_samples_loa=48)
        (lbl, _, lok) = friction_boundary_labels(sphere, s.configs, fc)
        return lok & s.valid

    dt_label = _timed(label_round, n=5)
    # count labeled grasps from one round (single small fetch, post-timing)
    labels_per_sec = float(jnp.sum(label_round(0))) / dt_label
    RESULT["extras"]["labeled_grasps_per_sec"] = round(labels_per_sec, 1)

    # FULL 6-D epsilon labels (force + torque rows, C(16,6) facet
    # enumeration per accepted grasp, jit-safe non-closure skip via
    # lax.map+cond — grasping/quality.ferrari_canny_l1_device_batch)
    from pointnetgpd_tpu.grasping.evaluation import evaluate_ferrari_canny_6d

    com = np.zeros(3, np.float32)

    def label6_round(seed):
        s = antipodal_sample_grasps(
            sphere, jax.random.PRNGKey(seed), max_width=0.10,
            friction_coef=float(FC_LIST_LESS_CLASS[0]), num_attempts=256,
            num_samples_loa=48)
        quals, _ = evaluate_ferrari_canny_6d(
            sphere, s.configs, com, float(FC_LIST_LESS_CLASS[0]),
            num_samples=48, torque_scaling=10.0)
        return quals

    dt6 = _timed(label6_round, n=3)
    n6 = float(jnp.sum(label6_round(0) > 0))
    RESULT["extras"]["labeled_grasps_per_sec_6d"] = round(n6 / dt6, 1)


def bench_voxelizer_extra():
    """Voxelizer distance pass: Pallas kernel vs the XLA path, on the shape
    of the commit-recorded measurement (100^3 grid x 8192-triangle sphere —
    the bounding-sphere pruning's worst case). Returns (pallas_ms, speedup)
    or None off-TPU (the Pallas path only lowers on the TPU backend)."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        return None
    from pointnetgpd_tpu.ops.mesh_to_sdf import _unsigned_distance
    from pointnetgpd_tpu.ops.point_triangle_pallas import (
        blocked_grid, min_point_triangle_dist2, pack_triangles,
    )

    # UV sphere: 2 * 64 * 64 = 8192 triangles, radius 5 cm
    nu, nv, r = 64, 64, 0.05
    th = np.linspace(0.0, np.pi, nv + 1)
    ph = np.linspace(0.0, 2 * np.pi, nu, endpoint=False)
    tt, pp = np.meshgrid(th, ph, indexing="ij")
    verts = np.stack([r * np.sin(tt) * np.cos(pp),
                      r * np.sin(tt) * np.sin(pp),
                      r * np.cos(tt)], axis=-1).reshape(-1, 3)
    idx = lambda i, j: i * nu + (j % nu)
    tris = []
    for i in range(nv):
        for j in range(nu):
            tris.append([idx(i, j), idx(i + 1, j), idx(i, j + 1)])
            tris.append([idx(i, j + 1), idx(i + 1, j), idx(i + 1, j + 1)])
    tri_v = verts[np.asarray(tris)].astype(np.float32)     # (8192, 3, 3)

    dim, res = 100, 2.2 * r / 89                           # ~SDFGen padding 5
    origin = -res * (dim - 1) / 2 * np.ones(3)
    pts_blocked, _ = blocked_grid(dim, dim, dim, origin, res)
    tri_data, sup_data = pack_triangles(tri_v)
    td, sd = jnp.asarray(tri_data), jnp.asarray(sup_data)
    tri_dev = jnp.asarray(tri_v)
    # rotate inputs so the relay cannot elide identical re-dispatches
    pts_rot = [jnp.asarray(pts_blocked + 1e-6 * i) for i in range(3)]

    dt_pallas = _timed(lambda i: min_point_triangle_dist2(
        pts_rot[i % 3], td, sd), n=2, reps=2)
    dt_xla = _timed(lambda i: _unsigned_distance(pts_rot[i % 3], tri_dev),
                    n=2, reps=2)
    return dt_pallas * 1e3, dt_xla / dt_pallas


def bench_frame_pipeline():
    """Online frame pipeline (kinect2grasp replacement): downsample +
    normals + GPG sampling + crop/score on a segmented-tabletop scene
    (three objects spread over ~0.6 m — the reference's /table_top_points
    input is table-plane-segmented). Returns ms/frame (warm)."""
    import jax
    import jax.numpy as jnp

    from pointnetgpd_tpu.inference.scorer import GraspScorer
    from pointnetgpd_tpu.models.pointnet import init_pointnet_cls
    from pointnetgpd_tpu.robot.node import DetectorConfig, GraspDetector

    params, state = init_pointnet_cls(jax.random.PRNGKey(0), input_chann=3,
                                      k=3)
    scorer = GraspScorer(params=params, state=state, k=3, num_points=500)
    det = GraspDetector(scorer, config=DetectorConfig(cloud_pad_to=4096))

    rs = np.random.RandomState(0)
    objs = []
    for cx, cy in ((-0.25, -0.15), (0.2, 0.25), (0.05, -0.3)):
        n = 2000
        top = rs.rand(n, 3) * [0.06, 0.06, 0] + [cx, cy, 0.08]
        front = rs.rand(n, 3) * [0.06, 0, 0.06] + [cx, cy, 0.02]
        side = rs.rand(n, 3) * [0, 0.06, 0.06] + [cx + 0.06, cy, 0.02]
        objs.append(np.concatenate([top, front, side]).astype(np.float32))
    pts = np.concatenate(objs)
    cam = np.array([1.0, 1.0, 1.2], np.float32)

    det.process_frame(pts, cam, seed=0)  # compile
    t0 = time.perf_counter()
    n_it = 5
    for i in range(n_it):
        det.process_frame(pts, cam, seed=i)  # host-blocking (fetches inside)
    serial_ms = (time.perf_counter() - t0) / n_it * 1e3

    # pipelined stream: one frame in flight (process_frames); on a real TPU
    # host this hides the fetch round trip — measure what THIS relay gives
    t0 = time.perf_counter()
    n_done = sum(1 for _ in det.process_frames(
        (pts for _ in range(n_it)), cam, start_seed=100))
    piped_ms = (time.perf_counter() - t0) / n_done * 1e3
    return serial_ms, piped_ms


# Driver-captured r4 baseline (BENCH_r04.json): the same-day measured torch
# rate moved 4x across relay days with host load (86.1 driver r2, 62.8
# driver r4, 21.9-35.6 builder re-runs — VERDICT r4 weak #4), so extras
# also report the ratio against this pinned anchor.
CANONICAL_BASELINE_R4 = 62.8
BASELINE_THREADS = 8       # pinned: os.cpu_count() varies across relay hosts
BASELINE_REPEATS = 3       # median-of-k repetitions


def bench_reference_torch():
    """Reference path: host numpy crop + per-candidate batch-1 torch calls.

    Methodology pinned for cross-day stability (VERDICT r4): fixed torch
    thread count, median of BASELINE_REPEATS repetitions, and the host
    1-minute load average recorded alongside (extras
    "baseline_host_load_1min") so a contended-host capture is visible."""
    if not os.path.isdir(REF_ROOT):
        return None
    sys.path.insert(0, REF_ROOT)
    import torch

    from model.pointnet import PointNetCls  # reference definition (oracle)

    torch.set_num_threads(BASELINE_THREADS)
    model = PointNetCls(num_points=NUM_POINTS, input_chann=3, k=3)
    model.eval()

    rs = np.random.RandomState(0)
    pc = (rs.rand(SCENE_POINTS, 3) * [0.08, 0.06, 0.05]).astype(np.float32)
    centers = (rs.rand(N_CANDIDATES, 3) * [0.08, 0.06, 0.05]).astype(np.float32)
    centers[:, 0] -= 0.03

    n_measured = 48  # candidates actually timed (batch-1 calls are slow)

    def one_rep():
        t0 = time.perf_counter()
        with torch.no_grad():
            for i in range(n_measured):
                # crop (kinect2grasp.py:178-235 semantics)
                rot = np.eye(3, dtype=np.float32)
                pc_t = (pc - centers[i]) @ rot.T
                w = 0.08
                mask = ((pc_t[:, 0] > 0) & (pc_t[:, 0] < 0.06)
                        & (np.abs(pc_t[:, 1]) < w / 2)
                        & (np.abs(pc_t[:, 2]) < w / 4))
                crop = pc_t[mask]
                if len(crop) < 10:
                    continue
                idx = np.random.choice(len(crop), NUM_POINTS,
                                       replace=len(crop) < NUM_POINTS)
                local = crop[idx]
                # batch-1 scoring (main_test.py:59-69)
                x = torch.from_numpy(local.T[None])
                logp, _ = model(x)
                logp.softmax(1).numpy()
        return (time.perf_counter() - t0) / n_measured

    dts = sorted(one_rep() for _ in range(BASELINE_REPEATS))
    dt = dts[len(dts) // 2]  # median
    try:
        RESULT["extras"]["baseline_host_load_1min"] = round(
            os.getloadavg()[0], 1)
    except OSError:
        pass
    RESULT["extras"]["baseline_method"] = (
        f"median-of-{BASELINE_REPEATS}, {BASELINE_THREADS} torch threads")
    return 1.0 / dt


def main():
    _install_emit_guards(float(os.environ.get("BENCH_DEADLINE_S", "1500")))
    err = None
    try:
        # reference baseline first: CPU-only, independent of the TPU relay,
        # so even a dead-backend run publishes it
        try:
            baseline = bench_reference_torch()
        except Exception as e:
            print(f"# reference baseline failed: {e}", file=sys.stderr)
            baseline = None
        if baseline:
            RESULT["extras"]["reference_torch_cpu_candidates_per_sec"] = \
                round(baseline, 1)
        bench_tpu(baseline)
        if RESULT["value"]:
            # pinned-anchor ratio: immune to day-to-day relay-host load
            # (the same-day vs_baseline moved 4x across rounds; VERDICT r4)
            RESULT["extras"]["vs_canonical_r4_baseline"] = round(
                RESULT["value"] / CANONICAL_BASELINE_R4, 2)
        try:
            vox = bench_voxelizer_extra()
        except Exception:
            vox = None
        if vox:
            RESULT["extras"]["voxelizer_pallas_ms_100cube_8192tri"] = \
                round(vox[0], 1)
            RESULT["extras"]["voxelizer_pallas_speedup_vs_xla"] = \
                round(vox[1], 2)
        try:
            frame_ms, frame_piped_ms = bench_frame_pipeline()
        except Exception:
            frame_ms = frame_piped_ms = None
        if frame_ms:
            RESULT["extras"]["online_frame_ms_18k_tabletop_150_seeds"] = \
                round(frame_ms, 1)
            RESULT["extras"]["online_frame_pipelined_ms"] = \
                round(frame_piped_ms, 1)
    except Exception as e:
        err = f"{type(e).__name__}: {e}"
    finally:
        _emit_once(error=err)


if __name__ == "__main__":
    main()
