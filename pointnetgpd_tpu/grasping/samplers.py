"""Grasp candidate samplers, batched fixed-budget rejection sampling on device.

Re-design of the reference sampler zoo (reference:
dex-net/src/dexnet/grasping/grasp_sampler.py). The reference runs
per-candidate host loops (20 worker processes on the robot,
kinect2grasp.py:157-173; 50 processes for dataset generation); here every
sampler evaluates a fixed budget of attempts as ONE batched device program
and returns packed valid candidates — rejection sampling as vmap, retries as
a host loop over fixed-shape device calls.

Samplers:
- ``antipodal_sample_grasps``  — the dataset-generation sampler
  (AntipodalGraspSampler, grasp_sampler.py:621-803): random surface point,
  friction-cone axis sample, close from both sides, force-closure keep.
- ``uniform_sample_grasps``    — random surface point pairs
  (UniformGraspSampler, grasp_sampler.py:459-522).
- ``gaussian_sample_grasps``   — Gaussian-over-COM centers
  (GaussianGraspSampler, grasp_sampler.py:525-618).
- ``gpg_sample_candidates``    — GPG on a raw point cloud, the ONLINE path
  (GpgGraspSamplerPcl, grasp_sampler.py:1383-1656).

Reference quirk reproduced: approach angles are drawn from {-90..90 step 30}
and then USED AS RADIANS throughout (grasp_sampler.py:757-761 assigns degree
values to approach_angle_, which _get_rotation_matrix_y feeds to cos/sin) —
the stored dataset depends on it, so we sample the same numeric values.

Documented deviation: the reference's table-clearance back-off distance is
``np.linalg.norm([min_finger_pos, p_table])`` — the Frobenius norm of the
2x3 STACK of both points (grasp_sampler.py:1601), not their distance. We
compute the intended point-to-point distance; it is strictly safer (backs
off at least as far for points near the table).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import sdf as sdf_lib
from ..ops.cloud import extreme_eigvecs_sym3x3, min_k, pairwise_d2
from ..ops.gpg_counts_pallas import GpgScanContext, gpg_scan_counts_jnp
from . import quality
from .gripper import Gripper, collision_and_open_counts, hand_points, panel_box_array
from .grasp import (approach_collision_free, close_fingers,
                    grasp_from_contact_and_axis)

APPROACH_ANGLE_CANDIDATES = np.arange(-90, 120, 30).astype(np.float32)


class SampledGrasps(NamedTuple):
    configs: jnp.ndarray   # (N, 10) grasp configurations
    contacts: jnp.ndarray  # (N, 2, 3) contact points
    normals: jnp.ndarray   # (N, 2, 3) outward contact normals
    valid: jnp.ndarray     # (N,) bool


# ---------------------------------------------------------------------------
# Antipodal sampler (dataset generation)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "num_attempts", "num_samples_loa", "random_approach_angle"))
def antipodal_sample_grasps(
    sdf: sdf_lib.SdfGrid,
    key,
    *,
    max_width: float,
    min_width: float = 0.0,
    friction_coef: float = 2.0,
    min_contact_dist: float = 0.0025,
    num_attempts: int = 256,
    num_samples_loa: int = 40,
    random_approach_angle: bool = True,
) -> SampledGrasps:
    """One fixed-budget batch of antipodal rejection sampling
    (grasp_sampler.py:689-803). Call repeatedly with fresh keys until enough
    valid grasps accumulate (the reference's while-loop moves to the host).
    """
    surface_pts_world = sdf_lib.grid_to_world(sdf, sdf.surface_points)
    n_surface = surface_pts_world.shape[0]
    if n_surface == 0:  # static shape: no surface cells -> nothing to sample
        z3 = jnp.zeros((num_attempts, 2, 3))
        return SampledGrasps(jnp.zeros((num_attempts, 10)), z3, z3,
                             jnp.zeros((num_attempts,), bool))

    k_idx, k_perturb, k_cone, k_flip, k_angle = jax.random.split(key, 5)
    idx = jax.random.randint(k_idx, (num_attempts,), 0, n_surface)
    x1 = surface_pts_world[idx]
    # perturb_point: x + (res/2) * (U[0,1)^3 - 0.5) (grasp_sampler.py:684-687)
    x1 = x1 + (sdf.resolution / 2.0) * (
        jax.random.uniform(k_perturb, (num_attempts, 3)) - 0.5)

    def one(x1_i, k_cone_i, k_flip_i, k_angle_i):
        # contact normal + tangents at x1 (contacts.py:95-185 with no
        # in_direction: direction defaults to the inward normal)
        g1 = sdf_lib.world_to_grid(sdf, x1_i)
        n_out, n_valid = sdf_lib.surface_normal(sdf, g1[None, :])
        n_out = n_out[0]
        n_valid = n_valid[0]
        d_in, t1, t2 = quality.tangents_from_direction(
            jnp.where(n_valid, -n_out, jnp.array([0.0, 0, 1], x1_i.dtype)))

        # sample axis from the friction cone (grasp_sampler.py:629-655):
        # v = -(n_out + r cos(th) t1 + r sin(th) t2), th~U(0,2pi), r~U(0,mu)
        k_t, k_r = jax.random.split(k_cone_i)
        theta = 2.0 * jnp.pi * jax.random.uniform(k_t, ())
        r = friction_coef * jax.random.uniform(k_r, ())
        v = n_out + r * jnp.cos(theta) * t1 + r * jnp.sin(theta) * t2
        v = -v / jnp.linalg.norm(v)
        # random axis flip (grasp_sampler.py:746-748)
        v = jnp.where(jax.random.uniform(k_flip_i, ()) > 0.5, -v, v)

        config, contacts0, c_valid = grasp_from_contact_and_axis(
            sdf, x1_i, v, max_width,
            num_samples=num_samples_loa, min_width_world=min_width)

        # approach angle: shuffled degree candidates used as radians; take
        # the first that closes collision-free (grasp_sampler.py:757-768).
        # Only the approach-collision test depends on the angle — the
        # closing contacts are angle-independent — so the fingers close
        # ONCE and the A angle candidates pay only the approach check
        # (~40% of the sampler's SDF line scans at A=7; measured
        # equivalent valid sets, docs/SCALING.md)
        if random_approach_angle:
            angles = jax.random.permutation(
                k_angle_i, jnp.asarray(APPROACH_ANGLE_CANDIDATES))
        else:
            angles = jnp.zeros((1,), x1_i.dtype)
        ok = approach_collision_free(
            sdf, config, angles, num_samples=num_samples_loa)
        contacts = close_fingers(
            sdf, config[None], num_samples=num_samples_loa,
            check_approach=False)
        first = jnp.argmax(ok)
        any_ok = jnp.any(ok) & contacts.found[0]
        config = config.at[7].set(angles[first].astype(config.dtype))
        pts = contacts.points[0]
        nrm = contacts.normals[0]

        wide_enough = jnp.linalg.norm(x1_i - pts[1]) >= min_contact_dist
        fc = quality.force_closure(pts[0], nrm[0], pts[1], nrm[1],
                                   friction_coef)
        valid = n_valid & c_valid & any_ok & wide_enough & (fc == 1)
        return config, pts, nrm, valid

    cone_keys = jax.random.split(k_cone, num_attempts)
    flip_keys = jax.random.split(k_flip, num_attempts)
    angle_keys = jax.random.split(k_angle, num_attempts)
    configs, pts, nrms, valid = jax.vmap(one)(x1, cone_keys, flip_keys,
                                              angle_keys)
    return SampledGrasps(configs, pts, nrms, valid)


# ---------------------------------------------------------------------------
# Uniform / Gaussian samplers
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("num_attempts", "num_samples_loa"))
def uniform_sample_grasps(sdf: sdf_lib.SdfGrid, key, *, max_width: float,
                          min_width: float = 0.0, num_attempts: int = 256,
                          num_samples_loa: int = 40) -> SampledGrasps:
    """Random surface point pairs within the jaw range, random approach angle
    (UniformGraspSampler, grasp_sampler.py:459-522)."""
    surface = sdf_lib.grid_to_world(sdf, sdf.surface_points)
    n = surface.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    i1 = jax.random.randint(k1, (num_attempts,), 0, n)
    i2 = jax.random.randint(k2, (num_attempts,), 0, n)
    p1, p2 = surface[i1], surface[i2]
    width = jnp.linalg.norm(p2 - p1, axis=1)
    in_range = (width > min_width) & (width < max_width) & (width > 0)

    centers = 0.5 * (p1 + p2)
    axes = (p2 - p1) / jnp.maximum(width[:, None], 1e-12)
    angles = jax.random.choice(
        k3, jnp.asarray(APPROACH_ANGLE_CANDIDATES), (num_attempts,))
    configs = jnp.concatenate([
        centers, axes,
        jnp.full((num_attempts, 1), max_width, centers.dtype),
        angles[:, None].astype(centers.dtype),
        jnp.zeros((num_attempts, 2), centers.dtype),
    ], axis=1)
    contacts = close_fingers(sdf, configs, num_samples=num_samples_loa,
                             check_approach=False)
    return SampledGrasps(configs, contacts.points, contacts.normals,
                         in_range & contacts.found)


@functools.partial(jax.jit, static_argnames=("num_attempts", "num_samples_loa"))
def gaussian_sample_grasps(sdf: sdf_lib.SdfGrid, key, *, max_width: float,
                           center_of_mass, principal_dims,
                           sigma_scale: float = 2.5,
                           num_attempts: int = 256,
                           num_samples_loa: int = 40) -> SampledGrasps:
    """Centers ~ N(COM, (principal_dims / (2 sigma))^2), axes uniform on the
    sphere (GaussianGraspSampler, grasp_sampler.py:525-618)."""
    k1, k2 = jax.random.split(key)
    sigma = jnp.asarray(principal_dims) / (2.0 * sigma_scale)
    centers = jnp.asarray(center_of_mass) + sigma * jax.random.normal(
        k1, (num_attempts, 3))
    axes = jax.random.normal(k2, (num_attempts, 3))
    axes = axes / jnp.linalg.norm(axes, axis=1, keepdims=True)
    configs = jnp.concatenate([
        centers, axes,
        jnp.full((num_attempts, 1), max_width, centers.dtype),
        jnp.zeros((num_attempts, 3), centers.dtype),
    ], axis=1)
    contacts = close_fingers(sdf, configs, num_samples=num_samples_loa,
                             check_approach=False)
    return SampledGrasps(configs, contacts.points, contacts.normals,
                         contacts.found)


# ---------------------------------------------------------------------------
# GPG on a raw point cloud (the online path)
# ---------------------------------------------------------------------------

class GpgCandidates(NamedTuple):
    """Packed GPG candidates: rows [bottom_center, approach, binormal(major),
    minor, bottom_center_modified] (grasp_sampler.py:1616-1618)."""

    frames: jnp.ndarray  # (N, 5, 3)
    valid: jnp.ndarray   # (N,) bool


FUNNEL_STAGES = (
    "frames", "seed_above_table", "frame_estimate", "dy_window",
    "downward_guard", "approach_hit", "open_region", "no_collision")


@functools.partial(jax.jit, static_argnames=(
    "gripper", "num_seeds", "max_neighbors", "num_dy", "dtheta_deg",
    "range_dtheta", "approach_steps", "min_open_points", "seed_chunk",
    "mesh", "exact", "normal_k", "normal_window", "seed_bias", "debug"))
def gpg_sample_candidates(
    points,
    normals,
    key,
    gripper: Gripper,
    *,
    num_seeds: int = 32,
    max_neighbors: int = 100,
    num_dy: int = 10,
    dtheta_deg: int = 10,
    range_dtheta: int = 90,
    approach_step: float = 0.005,
    approach_steps: int = 25,
    safety_dis_above_table: float = 0.01,
    min_points_above_table: float = 0.010,
    min_open_points: int = 10,
    r_ball: float | None = None,
    point_frames=None,
    seed_chunk: int = 8,
    mesh=None,
    exact: bool = False,
    camera_pos=None,
    bbox=None,
    normal_k: int = 30,
    normal_window: int = 2048,
    seed_bias: str = "none",
    debug: bool = False,
) -> GpgCandidates:
    """GPG candidate generation on a raw cloud, fully batched
    (GpgGraspSamplerPcl.sample_grasps, grasp_sampler.py:1389-1656).

    points: (P, 3) scene cloud (table frame, z up, table at z=0).
    normals: (P, 3) outward (camera-consistent) surface normals — or None
        to estimate normals LAZILY for the seed neighborhoods only
        (``ops.cloud.seed_window_normals``; requires ``camera_pos``). The
        sampler is the online pipeline's only normals consumer, so the
        lazy path skips the whole-cloud estimation pass (the reference's
        pcl feed, kinect2grasp.py:131-144); same statistical trade as the
        window-KNN estimator. ``bbox`` = real-cloud bounds for Morton
        sorting under sentinel padding; ``normal_k``/``normal_window``
        mirror the estimator's parameters.
    point_frames: optional (P, 3, 3) per-point [normal, major, minor] frames
        (e.g. SDF-curvature frames); when given they replace the r-ball
        normal-covariance estimate, making frame selection deterministic.
    Returns up to num_seeds * n_theta packed candidates with validity mask.

    Memory shape: every dy offset, approach step, and the final check is a
    shifted-bounds box count against one rotation of the cloud per
    (seed, theta) — a bc move along the frame axes is a pure coordinate
    shift. The counting runs through ``ops.gpg_counts_pallas.gpg_scan_counts``
    (a VMEM-resident Pallas kernel on TPU; chunked jnp elsewhere — the
    ``seed_chunk`` arg bounds that CPU fallback's peak memory at
    O(seed_chunk * n_theta * P)). A naive per-(seed, theta, dy) batch of
    rotated clouds materializes 81 GB at production scale (150 seeds,
    85k points) and OOMs the chip.

    ``mesh``: optional jax.sharding.Mesh — shards the (seed x theta) frame
    axis over the mesh's first axis via shard_map (frames are independent
    given the replicated cloud: zero collectives, linear scaling, same
    results as single-device). The online analogue of
    ``GraspScorer(mesh=...)``'s candidate-axis sharding.

    ``exact``: force exact top_k neighbor selection for the seed-frame
    covariance instead of the TPU default ``lax.approx_min_k`` (the same
    escape hatch as ``estimate_normals_knn(exact=True)``) — parity/oracle
    runs can pin down the reference's exact-KNN semantics end to end.

    ``seed_bias="height"``: Gaussian-over-height weighted seed selection
    (Gumbel-top-k) — the reference's PointGraspSampler bias
    (grasp_sampler.py:1040-1046) applied online. GPG's downward guard only
    accepts side-visible seeds, and sides live at mid heights, so the bias
    spends the seed budget where candidates can actually come from
    (measured funnel: see docs/FUNNEL.md). "none" = uniform (reference
    online behavior, kinect2grasp.py:145-147).

    ``debug=True``: additionally return a funnel dict — total frames plus
    the number of (seed, theta) frames surviving each guard, keyed by
    ``FUNNEL_STAGES`` (device scalars; cumulative, reference guard order
    grasp_sampler.py:1539-1614). Disables the pre-guard block pruning so
    every frame's counts are real.
    """
    p_total = points.shape[0]
    dtype = points.dtype
    hand_pts_local = jnp.asarray(hand_points(gripper)[1:], dtype)  # (20, 3)

    if r_ball is None:
        # the PCL variant's radius (grasp_sampler.py:1461-1462); the SDF
        # variant uses the much smaller hand_height (:1415) so the normal
        # covariance stays local — pass it explicitly there
        r_ball = max(gripper.hand_outer_diameter - gripper.finger_width,
                     gripper.hand_depth, gripper.hand_height / 2.0)

    # sample seeds from points above the table (kinect2grasp.py:145-147)
    above = points[:, 2] > min_points_above_table
    k_seed, _ = jax.random.split(key)
    if seed_bias == "height":
        # Gaussian-over-height seed bias (the reference's PointGraspSampler
        # trick, grasp_sampler.py:1040-1046, applied to the online sampler):
        # GPG's downward-approach guard only ever accepts side-visible
        # seeds (docs/QUIRKS.md), and side surfaces live at mid heights —
        # top surfaces cluster at each object's z-max. Weighted sampling
        # WITHOUT replacement via Gumbel-top-k: z_i = log w_i + Gumbel_i.
        zs = points[:, 2]
        big = jnp.asarray(1e9, zs.dtype)
        z_lo = jnp.min(jnp.where(above, zs, big))
        z_hi = jnp.max(jnp.where(above, zs, -big))
        ok = z_hi > z_lo
        mid = jnp.where(ok, 0.5 * (z_lo + z_hi), 0.0)
        sigma = jnp.where(ok, jnp.maximum((z_hi - z_lo) / 4.0, 1e-6), 1.0)
        logw = -0.5 * jnp.square((zs - mid) / sigma)
        u = jax.random.uniform(k_seed, (p_total,), minval=1e-12,
                               maxval=1.0 - 1e-7)
        z = logw - jnp.log(-jnp.log(u))
    else:
        # masked choice: random keys, invalid pushed to -inf
        z = jax.random.uniform(k_seed, (p_total,))
    z = jnp.where(above, z, -jnp.inf)
    _, seed_idx = jax.lax.top_k(z, min(num_seeds, p_total))
    if seed_idx.shape[0] < num_seeds:
        seed_idx = jnp.pad(seed_idx, (0, num_seeds - seed_idx.shape[0]),
                           mode="edge")
    # edge-padded slots duplicate the last seed; mask them invalid so a
    # tiny cloud can't return identical (seed, theta) candidates many times
    seed_ok = above[seed_idx] & (jnp.arange(num_seeds) < p_total)

    # Morton-order the seeds so consecutive seeds are spatially close: the
    # Pallas scan kernel prunes cloud tiles per 128-frame block against the
    # block's seed bounding sphere, and randomly-ordered seeds would make
    # every block span the whole scene (no pruning). The outputs are
    # permuted BACK to the random selection order at the end — downstream
    # consumers truncate to the first N valid candidates (node.py), and a
    # spatially sorted order would hand every slot to one corner of the
    # scene.
    from ..ops.cloud import morton_codes

    code = morton_codes(points[seed_idx])
    morton_perm = jnp.argsort(code)
    unsort = jnp.argsort(morton_perm)     # inverse permutation (seed axis)
    seed_idx = seed_idx[morton_perm]
    seed_ok = seed_ok[morton_perm]

    thetas = jnp.arange(-range_dtheta, range_dtheta + 1, dtheta_deg,
                        dtype=dtype) / 180.0 * jnp.pi
    n_theta = thetas.shape[0]
    dys = (jnp.arange(-num_dy, num_dy + 1, dtype=dtype)
           * gripper.finger_width)
    n_dy = dys.shape[0]

    def axis_rotation(axis, angle):
        """Rodrigues rotation about a unit axis."""
        c, s = jnp.cos(angle), jnp.sin(angle)
        kx = jnp.array([[0.0, -axis[2], axis[1]],
                        [axis[2], 0.0, -axis[0]],
                        [-axis[1], axis[0], 0.0]], dtype)
        return c * jnp.eye(3, dtype=dtype) + s * kx + (1 - c) * jnp.outer(axis, axis)

    # Box-count scheme: moving bottom_center by sx*approach + sy*major IS an
    # (sx, sy, 0) coordinate shift of the cloud-in-frame coordinates, so
    # every dy offset / approach step / final check is a shifted-bounds
    # membership count against ONE rotation of the cloud. Each scan varies
    # exactly one frame axis, which ops/gpg_counts_pallas.gpg_scan_counts
    # exploits: on TPU a Pallas kernel computes a whole scan's counts for
    # every (seed, theta) frame in one VMEM-resident pass over the cloud
    # (the XLA formulation re-read the rotated cloud per shift and was the
    # online pipeline's dominant stage); on CPU a chunked jnp path with the
    # same algebra serves as the oracle.

    # per-seed local frames, ONE batched pass for all seeds (doing the
    # neighbor search inside the per-seed loop serializes 150 top_k calls
    # over the whole cloud — hundreds of ms; batched it is one (S, P)
    # selection + one batched 3x3 eigendecomposition)
    if point_frames is not None:
        # precomputed deterministic frames (e.g. SDF curvature directions)
        seed_frames = point_frames[seed_idx]           # (S, 3, 3)
        seed_m_ok = jnp.linalg.norm(seed_frames[:, 0], axis=-1) > 0.5
    else:
        # r-ball normal covariance -> local frame (grasp_sampler.py:1467-1500)
        seeds_xyz = points[seed_idx]                   # (S, 3)
        knn = min(max_neighbors, p_total)
        if normals is None:
            if camera_pos is None:
                raise ValueError(
                    "gpg_sample_candidates(normals=None) needs camera_pos")
            if normal_window <= 0:
                raise ValueError(
                    "gpg_sample_candidates(normals=None) estimates normals "
                    "inside seed windows and needs normal_window > 0; for "
                    "exact all-pairs normals, pass precomputed normals "
                    "(ops.cloud.estimate_normals_knn)")
            # lazy path: neighbors + their normals from one Morton window
            # per seed (ops/cloud.seed_window_normals) — no whole-cloud
            # normals pass
            from ..ops.cloud import seed_window_normals

            pd2, nn, seed_normals = seed_window_normals(
                points, seed_idx, jnp.asarray(camera_pos, dtype),
                k=normal_k, knn=knn, window=normal_window, exact=exact,
                bbox=bbox)
        else:
            # cap the neighbor count like the KD-tree's max_nn=100, then
            # the r-ball filter; approx_min_k/top_k trade via ops.cloud.min_k
            pd2, nbr = min_k(pairwise_d2(seeds_xyz, points), knn,
                             exact)                        # (S, knn)
            nn = normals[nbr]                              # (S, knn, 3)
            seed_normals = normals[seed_idx]
        # self-exclusion threshold 1e-8 m^2 (0.1 mm): the matmul-form d2
        # carries fp32 cancellation noise ~1e-9 at 0.2 m scale, so an exact
        # >0 test would include/exclude the seed's own normal at random;
        # 1e-8 is well below any inter-point distance at voxel-downsampled
        # resolution
        w = ((pd2 <= r_ball * r_ball) & (pd2 > 1e-8)).astype(dtype)
        nn = nn / jnp.maximum(
            jnp.linalg.norm(nn, axis=-1, keepdims=True), 1e-12)
        m = jnp.einsum("sp,spi,spj->sij", w, nn, nn)
        seed_m_ok = jnp.sum(jnp.abs(m), axis=(1, 2)) > 0

        # closed-form extreme eigenpairs (ops/cloud.py Eberly solver) —
        # jnp.linalg.eigh's iterative QR lowering costs ms even at S=150
        minor, normal = extreme_eigvecs_sym3x3(m)      # (S, 3) each
        major = jnp.cross(minor, normal)
        major = major / jnp.maximum(
            jnp.linalg.norm(major, axis=-1, keepdims=True), 1e-12)
        # orient with the camera-consistent normal (grasp_sampler.py:1502-1506)
        flip = jnp.sum(seed_normals * normal, axis=-1) < 0
        normal = jnp.where(flip[:, None], -normal, normal)
        minor = jnp.where(flip[:, None], -minor, minor)
        seed_frames = jnp.stack([normal, major, minor], axis=1)  # (S, 3, 3)

    # flatten (seed, theta) -> F frames, seed-major (matches the previous
    # (S, n_theta) layout)
    seeds_xyz_all = points[seed_idx]                        # (S, 3)

    def rows_of(frame, theta):
        rot = axis_rotation(frame[2], theta)
        t_major = rot @ frame[1]
        t_normal = rot @ frame[0]
        return jnp.stack([t_normal, t_major, frame[2]])     # rows (3, 3)

    rr = jax.vmap(lambda fr: jax.vmap(
        lambda th: rows_of(fr, th))(thetas))(seed_frames)   # (S, T, 3, 3)
    n_frames = num_seeds * n_theta
    rr = rr.reshape(n_frames, 3, 3)
    seeds_rep = jnp.repeat(seeds_xyz_all, n_theta, axis=0)  # (F, 3)
    bite = float(gripper.init_bite)
    boxes_np = panel_box_array(gripper)
    m_ok_rep = jnp.repeat(seed_m_ok, n_theta)
    above_rep = jnp.repeat(seed_ok, n_theta)

    # Hoist the scan-independent validity components and COMPACT the frame
    # axis so frames that cannot be valid fill whole kernel blocks, which
    # the Pallas scan then skips wholesale (zero-radius pruning sphere per
    # inactive block). The downward guard (grasp_sampler.py:1564-1569;
    # finger_top.z < bc.z - depth/2 with finger_top = bc + normal*depth)
    # reduces algebraically to t_normal.z < -0.5 — bc cancels — so it needs
    # no scan; measured pass rates are ~4%, i.e. compaction removes ~24/25
    # of the scan work (docs/SCALING.md). The +1e-3 margin keeps any frame
    # the in-scan form could accept through its ~1e-8 bc.z rounding.
    # Inactive frames keep REAL seeds (their geometry outputs stay finite)
    # but may receive zero counts; their validity is forced false below,
    # exactly as the unpruned program would conclude. With a mesh, actives
    # round-robin over the ndev contiguous shards (two-key sort) so every
    # device keeps an equal share of the live scan work.
    ndev_c = 1 if mesh is None else mesh.shape[mesh.axis_names[0]]
    pre_ok = m_ok_rep & above_rep & (rr[:, 0, 2] < -0.5 + 1e-3)
    ri = jnp.where(pre_ok, jnp.cumsum(pre_ok) - 1,
                   jnp.cumsum(~pre_ok) - 1)
    cperm = jnp.argsort((ri % ndev_c) * 2 + (~pre_ok), stable=True)
    cunsort = jnp.argsort(cperm)
    seeds_rep = seeds_rep[cperm]
    rr = rr[cperm]
    m_ok_rep = m_ok_rep[cperm]
    above_rep = above_rep[cperm]
    pre_ok = pre_ok[cperm]

    def frames_block(points_r, seeds_rep, rr, m_ok_rep, above_rep, pre_ok):
        """Scans + per-frame glue for a block of frames (shardable: each
        frame is independent given the replicated cloud)."""
        f_blk = seeds_rep.shape[0]
        t_normal = rr[:, 0]
        t_major = rr[:, 1]
        minor_rep = rr[:, 2]

        if jax.default_backend() == "tpu":
            # Pallas path: the context shares the padded cloud, rotation
            # weights, and pruning spheres across the three scans; blocks
            # with no pre_ok frame skip every tile. Funnel debugging needs
            # REAL counts for every frame (a pruned frame's zero counts
            # would misattribute a downward-guard rejection to the
            # dy-window stage), so debug disables the block skip.
            ctx = GpgScanContext(
                points_r, seeds_rep, rr, boxes_np,
                active=jnp.ones_like(pre_ok) if debug else pre_ok)

            def counts(fixed, scan, scan_is_y):
                return ctx.counts(fixed, scan, scan_is_y=scan_is_y)
        else:
            def counts(fixed, scan, scan_is_y):
                return gpg_scan_counts_jnp(
                    points_r, seeds_rep, rr, fixed, scan, boxes_np,
                    scan_is_y=scan_is_y,
                    frame_chunk=max(1, seed_chunk) * n_theta)

        # dy scan (grasp_sampler.py:1539-1563): middle valid dy
        c1 = counts(jnp.full((f_blk,), -bite, dtype),
                    jnp.broadcast_to(dys, (f_blk, n_dy)), True)  # (F, dy, 4)
        oks = ((c1[..., 0] > 0) & (c1[..., 1] == 0)
               & (c1[..., 2] == 0) & (c1[..., 3] == 0))          # (F, n_dy)
        n_ok = jnp.sum(oks, axis=1)
        target = jnp.ceil(n_ok / 2.0).astype(jnp.int32)
        cum = jnp.cumsum(oks.astype(jnp.int32), axis=1)
        pick = jnp.argmax((cum == target[:, None]) & oks, axis=1)
        dy_pick = dys[pick]                                      # (F,)
        bc = seeds_rep + t_major * dy_pick[:, None] - bite * t_normal

        # downward-grasp guard (grasp_sampler.py:1564-1569)
        finger_top = bc + t_normal * gripper.hand_depth
        downward = finger_top[:, 2] < bc[:, 2] - gripper.hand_depth * 0.5
        theta_ok = (n_ok > 0) & downward

        # approach along +normal until collision (grasp_sampler.py:1574-1585)
        steps = jnp.arange(approach_steps, dtype=dtype) * approach_step
        c2 = counts(dy_pick, jnp.broadcast_to(-bite + steps,
                                              (f_blk, approach_steps)),
                    False)
        collides = (c2[..., 1] > 0) | (c2[..., 2] > 0) | (c2[..., 3] > 0)
        hit = jnp.any(collides, axis=1)
        s_hit = steps[jnp.argmax(collides, axis=1)]
        x_bc2 = -bite + s_hit - approach_step * 3.0              # (F,)
        bc2 = seeds_rep + t_major * dy_pick[:, None] \
            + x_bc2[:, None] * t_normal

        # table clearance (grasp_sampler.py:1588-1605); world hand points
        hp_world = bc2[:, None, :] + jnp.einsum(
            "pj,fjk->fpk", hand_pts_local, rr)                   # (F, 20, 3)
        min_i = jnp.argmin(hp_world[..., 2], axis=1)
        min_pos = jnp.take_along_axis(hp_world, min_i[:, None, None],
                                      axis=1)[:, 0]              # (F, 3)
        nz_safe = jnp.where(jnp.abs(t_normal[:, 2]) < 1e-9, 1e-9,
                            t_normal[:, 2])
        tx = -min_pos[:, 2] * t_normal[:, 0] / nz_safe + min_pos[:, 0]
        ty = -min_pos[:, 2] * t_normal[:, 1] / nz_safe + min_pos[:, 1]
        p_table = jnp.stack([tx, ty, jnp.zeros_like(tx)], axis=1)
        dis_go_back = (jnp.linalg.norm(min_pos - p_table, axis=1)
                       + safety_dis_above_table)
        need_adjust = min_pos[:, 2] < safety_dis_above_table
        bc_mod = jnp.where(need_adjust[:, None],
                           bc2 - t_normal * dis_go_back[:, None], bc2)
        x_mod = x_bc2 - jnp.where(need_adjust, dis_go_back, 0.0)

        # final checks (grasp_sampler.py:1607-1614)
        c3 = counts(dy_pick, x_mod[:, None], False)[:, 0]        # (F, 4)
        final_ok = ((c3[:, 0] > min_open_points) & (c3[:, 1] == 0)
                    & (c3[:, 2] == 0) & (c3[:, 3] == 0))

        valid = (m_ok_rep & theta_ok & hit & final_ok & above_rep
                 & pre_ok)  # pre_ok: skipped blocks' counts are don't-cares
        frames = jnp.stack([bc2, t_normal, t_major, minor_rep, bc_mod],
                           axis=1)                               # (F, 5, 3)
        # per-guard funnel masks, cumulative in the reference's guard order
        # (dy window :1539-1563, downward :1564-1569, approach :1574-1585,
        # open-region + collision :1607-1614); last stage == valid
        m1 = above_rep
        m2 = m1 & m_ok_rep
        m3 = m2 & (n_ok > 0)
        m4 = m3 & downward
        m5 = m4 & hit
        m6 = m5 & (c3[:, 0] > min_open_points)
        m7 = m6 & (c3[:, 1] == 0) & (c3[:, 2] == 0) & (c3[:, 3] == 0) \
            & pre_ok
        stages = jnp.stack([m1, m2, m3, m4, m5, m6, m7], axis=1)  # (F, 7)
        return frames, valid, stages

    def unsort_out(frames, valid, stages):
        """Compaction order -> Morton order -> original random seed order
        (seed-major layout)."""
        frames = frames[cunsort]
        valid = valid[cunsort]
        f5 = frames.reshape(num_seeds, n_theta, 5, 3)[unsort]
        v2 = valid.reshape(num_seeds, n_theta)[unsort]
        cands = GpgCandidates(f5.reshape(-1, 5, 3), v2.reshape(-1))
        if not debug:
            return cands
        # funnel: total frames + surviving count per guard (device scalars
        # — ride the caller's fetch), keyed by FUNNEL_STAGES
        funnel = {"frames": jnp.asarray(n_frames, jnp.int32)}
        sums = jnp.sum(stages, axis=0).astype(jnp.int32)
        for i, name in enumerate(FUNNEL_STAGES[1:]):
            funnel[name] = sums[i]
        # selected seed z-heights (selection order) — lets callers audit
        # the seed_bias distribution without re-deriving seed indices
        funnel["seed_heights"] = points[seed_idx][unsort][:, 2]
        return cands, funnel

    if mesh is None:
        frames, valid, stages = frames_block(points, seeds_rep, rr, m_ok_rep,
                                             above_rep, pre_ok)
        return unsort_out(frames, valid, stages)

    # mesh-sharded: frames are independent given the replicated cloud, so
    # shard the (seed x theta) axis over the mesh — zero collectives, the
    # online-path analogue of the scorer's candidate-axis sharding. Frames
    # pad to a mesh multiple (pad rows carry above_rep=False -> invalid).
    from jax import shard_map
    from jax.sharding import PartitionSpec

    axis = mesh.axis_names[0]
    ndev = mesh.shape[axis]
    f_pad = -(-n_frames // ndev) * ndev

    def padf(a, fill=0):
        if f_pad == n_frames:
            return a
        pad_block = jnp.full((f_pad - n_frames,) + a.shape[1:], fill,
                             a.dtype)
        return jnp.concatenate([a, pad_block])

    eye_rows = jnp.broadcast_to(jnp.eye(3, dtype=rr.dtype),
                                (f_pad - n_frames, 3, 3))
    rr_p = jnp.concatenate([rr, eye_rows]) if f_pad > n_frames else rr
    frames, valid, stages = shard_map(
        frames_block, mesh=mesh,
        in_specs=(PartitionSpec(), PartitionSpec(axis), PartitionSpec(axis),
                  PartitionSpec(axis), PartitionSpec(axis),
                  PartitionSpec(axis)),
        out_specs=(PartitionSpec(axis), PartitionSpec(axis),
                   PartitionSpec(axis)),
    )(points, padf(seeds_rep), rr_p, padf(m_ok_rep), padf(above_rep),
      padf(pre_ok))
    return unsort_out(frames[:n_frames], valid[:n_frames],
                      stages[:n_frames])


def sample_grasps_stable_poses(sdf: sdf_lib.SdfGrid, key, stable_poses,
                               *, max_width: float, num_wanted: int = 25,
                               max_rounds: int = 8, **antipodal_kwargs):
    """Antipodal grasps aligned to each stable pose
    (generate_grasps_stable_poses, grasp_sampler.py:114-151): sample, then
    set each grasp's approach angle so the hand approaches perpendicular to
    the table of that pose. Returns {pose_index: (N, 10) configs}."""
    import numpy as _np

    from .grasp import perpendicular_table

    fn = lambda k: antipodal_sample_grasps(sdf, k, max_width=max_width,
                                           **antipodal_kwargs)
    configs, _, _ = sample_until(fn, key, num_wanted, max_rounds=max_rounds)
    out = {}
    for i, pose in enumerate(stable_poses):
        r = jnp.asarray(_np.asarray(pose["r"] if isinstance(pose, dict)
                                    else pose.r), jnp.float32)
        aligned = jax.vmap(lambda c: perpendicular_table(c, r))(
            jnp.asarray(configs, jnp.float32))
        out[i] = _np.asarray(aligned)
    return out


def _sdf_surface_points_and_normals(sdf: sdf_lib.SdfGrid, max_points: int = 2048,
                                    key=None):
    """Surface points (world) + outward normals from an SDF, for the
    SDF-backed GPG variants. Subsamples to ``max_points`` for fixed shapes.

    Normals come from the SDF GRADIENT (exact for a true signed-distance
    field and outward by construction) rather than the reference's 26-sample
    SVD plane fit (sdf.py:466-546), which blends normals across edges — the
    GPG frame estimation is sensitive to that blending (documented deviation).
    """
    pts_grid = sdf.surface_points
    n = pts_grid.shape[0]
    if key is not None and n > max_points:
        idx = jax.random.choice(key, n, (max_points,), replace=False)
        pts_grid = pts_grid[idx]
    grads = sdf_lib.gradient(sdf, pts_grid)
    norms = jnp.linalg.norm(grads, axis=1, keepdims=True)
    normals = jnp.where(norms > 1e-9, grads / jnp.maximum(norms, 1e-12),
                        jnp.array([0.0, 0.0, 1.0], grads.dtype))
    pts_world = sdf_lib.grid_to_world(sdf, pts_grid)
    return pts_world, normals, pts_grid


def _visible_filter(pts, normals, camera_pos):
    """Keep points whose outward normal faces the camera — GPG operates on a
    VIEWED surface (the online path's sensor cloud); on a closed SDF surface
    the hand's palm region almost always contains far-side points, so the
    SDF-backed variants emulate the camera's partial view."""
    to_cam = jnp.asarray(camera_pos) - pts
    return jnp.sum(to_cam * normals, axis=1) > 0


def _curvature_frames(sdf: sdf_lib.SdfGrid, pts_grid, normals):
    """Deterministic per-point [normal, major, minor] frames from SDF
    principal-curvature directions.

    The covariance estimator (grasp_sampler.py:1467-1500, reproduced in
    gpg_sample_candidates) degenerates on near-isotropic neighborhoods —
    the minor axis becomes an eigen-lottery (both here and in the
    reference). The shape operator fixes that: in the tangent plane of the
    gradient normal, eigendirections of the projected SDF Hessian give the
    principal curvature directions. The minimum-|curvature| direction is
    where normals vary LEAST == the covariance estimator's minor_pc, but
    computed in closed form from local geometry.
    """
    from .quality import tangents_from_direction

    hess = sdf_lib.curvature(sdf, pts_grid, delta=0.5)  # (P, 3, 3) grid units

    def one(n, h):
        _, t1, t2 = tangents_from_direction(-n)  # deterministic tangent basis
        s = jnp.stack([
            jnp.stack([t1 @ h @ t1, t1 @ h @ t2]),
            jnp.stack([t2 @ h @ t1, t2 @ h @ t2])])  # 2x2 shape operator
        w, v = jnp.linalg.eigh(s)
        pick = jnp.argmin(jnp.abs(w))        # min |curvature| -> minor
        minor = v[0, pick] * t1 + v[1, pick] * t2
        minor = minor / jnp.maximum(jnp.linalg.norm(minor), 1e-12)
        major = jnp.cross(minor, n)
        major = major / jnp.maximum(jnp.linalg.norm(major), 1e-12)
        return jnp.stack([n, major, minor])

    return jax.vmap(one)(normals, hess)


def gpg_sample_grasps_sdf(sdf: sdf_lib.SdfGrid, key, gripper: Gripper,
                          *, max_surface_points: int = 2048,
                          camera_pos=(0.0, 0.0, 1.0),
                          curvature_frames: bool = False,
                          **gpg_kwargs) -> GpgCandidates:
    """GPG on an SDF object (GpgGraspSampler, grasp_sampler.py:806-982):
    the same grid-search/approach loop as the cloud variant, with surface
    points and normals taken from the SDF, filtered to the camera-visible
    hemisphere (see _visible_filter).

    curvature_frames=True replaces the covariance frame estimate with
    deterministic SDF principal-curvature frames (_curvature_frames),
    removing the eigen-lottery on near-isotropic neighborhoods."""
    k_pts, k_gpg = jax.random.split(key)
    pts, normals, pts_grid = _sdf_surface_points_and_normals(
        sdf, max_surface_points, k_pts)
    vis = _visible_filter(pts, normals, camera_pos)
    pts, normals, pts_grid = pts[vis], normals[vis], pts_grid[vis]
    if pts.shape[0] == 0:  # nothing faces the camera: no candidates
        return GpgCandidates(jnp.zeros((0, 5, 3), pts.dtype),
                             jnp.zeros((0,), bool))
    gpg_kwargs.setdefault("r_ball", gripper.hand_height)
    if curvature_frames:
        gpg_kwargs["point_frames"] = _curvature_frames(sdf, pts_grid, normals)
    return gpg_sample_candidates(pts, normals, k_gpg, gripper, **gpg_kwargs)


def point_sample_grasps_sdf(sdf: sdf_lib.SdfGrid, key, gripper: Gripper,
                            *, height_sigma_frac: float = 3.0,
                            max_surface_points: int = 2048,
                            **gpg_kwargs) -> GpgCandidates:
    """PointGraspSampler (grasp_sampler.py:985-1170): the GPG loop with a
    Gaussian-over-height bias on the seed selection (:1040-1046 — seeds
    preferentially near the top of the object). OldPointGraspSampler
    (:1173-1380) is the legacy chain-sampling variant the reference itself
    marks "need to totally rewrite" (:988); this sampler supersedes both.
    """
    k_pts, k_bias, k_gpg = jax.random.split(key, 3)
    pts, normals, _ = _sdf_surface_points_and_normals(sdf, max_surface_points,
                                                      k_pts)
    vis = _visible_filter(pts, normals,
                          gpg_kwargs.pop("camera_pos", (0.0, 0.0, 1.0)))
    pts, normals = pts[vis], normals[vis]
    if pts.shape[0] == 0:  # nothing faces the camera: no candidates
        return GpgCandidates(jnp.zeros((0, 5, 3), pts.dtype),
                             jnp.zeros((0,), bool))
    z = pts[:, 2]
    z_min, z_max = jnp.min(z), jnp.max(z)
    sigma = jnp.maximum((z_max - z_min) / height_sigma_frac, 1e-6)
    selected_height = z_max - jnp.abs(
        jax.random.normal(k_bias, ()) * sigma)
    # bias: prefer points near the selected height by perturbing the seed
    # randomness with the height distance (the masked-argsort seed selection
    # in gpg_sample_candidates picks low keys first)
    weight = jnp.abs(z - selected_height) / jnp.maximum(z_max - z_min, 1e-6)
    # reorder points so low-weight (near selected height) come first; the
    # sampler's uniform seed choice then favors them
    order = jnp.argsort(weight)
    gpg_kwargs.setdefault("r_ball", gripper.hand_height)
    return gpg_sample_candidates(pts[order], normals[order], k_gpg, gripper,
                                 **gpg_kwargs)


# ---------------------------------------------------------------------------
# Host-side accumulation wrapper (the reference's while-loop, host-side)
# ---------------------------------------------------------------------------

def dedupe_grasps(configs, min_dist: float = 0.0025, alpha: float = 0.05):
    """Coverage rejection: greedily drop grasps closer than ``min_dist`` to an
    already-kept grasp under the center+axis distance
    (generate_grasps' pruning loop, grasp_sampler.py:153-234 with
    ParallelJawPtGrasp3D.distance, grasp.py:212-232). Host-side greedy over a
    device-computed pairwise distance matrix."""
    configs = np.asarray(configs)
    n = len(configs)
    if n == 0:
        return configs
    centers = jnp.asarray(configs[:, 0:3])
    axes = jnp.asarray(configs[:, 3:6])
    center_d = jnp.linalg.norm(centers[:, None, :] - centers[None, :, :],
                               axis=-1)
    dots = jnp.clip(jnp.abs(axes @ axes.T), -1.0, 1.0)
    axis_d = (2.0 / jnp.pi) * jnp.arccos(dots)
    dist = np.asarray(center_d + alpha * axis_d)
    keep = []
    for i in range(n):
        if all(dist[i, j] >= min_dist for j in keep):
            keep.append(i)
    return configs[keep]


def sample_until(sample_fn, key, num_wanted: int, max_rounds: int = 10):
    """Run a fixed-budget batched sampler until enough valid samples packed.

    sample_fn(key) must return a NamedTuple whose last field is a validity
    mask; returns the packed (host numpy) fields.
    """
    collected = None
    for _ in range(max_rounds):
        key, sub = jax.random.split(key)
        out = sample_fn(sub)
        valid = np.asarray(out[-1])
        packed = [np.asarray(f)[valid] for f in out[:-1]]
        if collected is None:
            collected = packed
        else:
            collected = [np.concatenate([c, p]) for c, p in zip(collected, packed)]
        if len(collected[0]) >= num_wanted:
            break
    return [c[:num_wanted] for c in collected]
