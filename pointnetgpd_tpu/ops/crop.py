"""Closing-region crop: the per-candidate preprocessing, as batched device code.

The reference does this per-sample on the host with numpy, twice:
- training:  BaseGraspDataset.collect_pc (reference: PointNetGPD/model/dataset.py:15-76)
  builds the gripper frame from the 10-dim grasp configuration, rotates the
  cloud into it, and keeps points in a box x,z in +-width/4, y in +-width/2;
- online:    check_collision_square / collect_pc (reference:
  dex-net/apps/kinect2grasp.py:178-258) uses an explicit [approach, binormal,
  minor] frame and a box x in (0, hand_depth), y in +-width/2, z in +-width/4.

Here both are ONE vmapped fixed-shape kernel: G grasp frames x P cloud points
-> (G, N, 3) cropped+resampled clouds, counts, and validity mask — a single
device call for an entire scene's candidates instead of a host loop. Dynamic
point counts are handled with masks; the <min_point_limit rejection becomes a
``valid`` flag (the reference returns None, dataset.py:71-72).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def grasp_frame_from_config(grasp):
    """10-dim grasp configuration -> (center, approach, binormal, minor_normal).

    Mirrors the frame math in dataset.py:16-37: binormal = config[3:6]
    (normalized), approach = first column of R2 @ R1 where R1 rotates by the
    approach angle about the binormal and R2 aligns y with the binormal.
    ``grasp`` may carry trailing score columns; only [0:8] are read.
    """
    center = grasp[0:3]
    axis = grasp[3:6]
    width = grasp[6]
    angle = grasp[7]

    axis = axis / jnp.linalg.norm(axis)
    cos_t, sin_t = jnp.cos(angle), jnp.sin(angle)
    # R1 columns: [cos,0,sin], [0,1,0], [-sin,0,cos]  (dataset.py:26)
    r1 = jnp.stack(
        [
            jnp.stack([cos_t, jnp.zeros_like(cos_t), sin_t]),
            jnp.array([0.0, 1.0, 0.0], dtype=grasp.dtype),
            jnp.stack([-sin_t, jnp.zeros_like(cos_t), cos_t]),
        ],
        axis=1,  # columns
    )
    axis_y = axis
    axis_x = jnp.stack([axis_y[1], -axis_y[0], jnp.zeros_like(axis_y[0])])
    # degenerate when axis is +-z: fall back to x-hat (dataset.py:29-30)
    degenerate = jnp.linalg.norm(axis_x) == 0
    axis_x = jnp.where(degenerate, jnp.array([1.0, 0.0, 0.0], dtype=grasp.dtype), axis_x)
    axis_x = axis_x / jnp.linalg.norm(axis_x)
    axis_z = jnp.cross(axis_x, axis_y)
    r2 = jnp.stack([axis_x, axis_y, axis_z], axis=1)  # columns
    approach = (r2 @ r1)[:, 0]
    approach = approach / jnp.linalg.norm(approach)
    minor_normal = jnp.cross(axis, approach)
    return center, approach, axis, minor_normal, width


def apply_transform_to_frame(transform, center, approach, binormal, minor_normal):
    """Apply a 4x4 homogeneous transform: point to center, rotation to axes.

    (dataset.py:42-49 — the google-mesh -> rgbd-cloud frame transform.)
    """
    rot = transform[:3, :3]
    center = rot @ center + transform[:3, 3]
    return center, rot @ approach, rot @ binormal, rot @ minor_normal


def _masked_resample(points_g, mask, num_out, key):
    """Fixed-size resample of the masked subset of ``points_g``.

    Matches the reference's semantics (dataset.py:263-268): sample
    ``num_out`` of the in-region points without replacement when there are
    more than ``num_out``, with replacement otherwise. RNG streams differ
    from numpy (explicit key threading), statistics match.
    """
    p_total = points_g.shape[0]
    count = jnp.sum(mask)
    k1, k2 = jax.random.split(key)

    # Random keys per point, invalid points pushed to -inf; top_k picks the
    # num_out LARGEST keys == a uniform random subset of the valid indices
    # (and, when count < num_out, its first `count` entries are exactly all
    # the valid indices). top_k is O(P * num_out / lanes), far cheaper than
    # the full argsort over P for the typical P=20k, num_out<=1000.
    z = jax.random.uniform(k1, (p_total,))
    z = jnp.where(mask, z, -jnp.inf)
    kk = min(num_out, p_total)
    _, perm = jax.lax.top_k(z, kk)                      # (kk,)
    if kk < num_out:  # cloud smaller than num_out: pad (dead branch below)
        perm = jnp.pad(perm, (0, num_out - kk), mode="edge")

    # without replacement: the top-num_out subset itself
    idx_wo = perm
    # with replacement: num_out uniform draws from the first `count` entries
    r = jax.random.randint(k2, (num_out,), 0, jnp.maximum(count, 1))
    idx_w = perm[jnp.minimum(r, kk - 1)]

    idx = jnp.where(count > num_out, idx_wo, idx_w)
    return points_g[idx], count


def crop_closing_region(
    grasp_center,
    rot_rows,
    box_lo,
    box_hi,
    pc,
    num_out: int,
    key,
):
    """Core crop for one grasp: rotate ``pc`` into the grasp frame and keep
    points strictly inside (box_lo, box_hi), resampled to ``num_out``.

    rot_rows: (3, 3) with rows [approach, binormal, minor_normal]
    (matrix = hstack([approach, binormal, minor]).T, dataset.py:50).
    Returns (points (num_out, 3), count, in-frame cloud mask fn inputs).

    Single-grasp reference path; the batched ``collect_*`` entry points use
    ``_crop_batch`` (two-stage selection) instead.
    """
    pc_t = (pc - grasp_center) @ rot_rows.T  # == (rot_rows @ (pc-center)^T)^T
    mask = jnp.all((pc_t > box_lo) & (pc_t < box_hi), axis=-1)
    points, count = _masked_resample(pc_t, mask, num_out, key)
    return points, count


# --- batched crop core -------------------------------------------------------
#
# The vmapped form of crop_closing_region is dominated by two ops XLA handles
# poorly at scene scale (G=512 candidates x P=20k points):
#   - lax.top_k over (G, P) with k=num_out (~11 ms on a v5e chip), and
#   - the (G, num_out) gather out of the per-candidate (G, P, 3) transformed
#     cloud (~4 ms, plus materializing 123 MB of pc_t).
# _crop_batch picks one of three EXACT selection strategies:
#
#   PREFIX RANK-SELECT (many candidates sharing one cloud — the scene
#   path): shuffle the cloud once per call (uniform-without-replacement ==
#   the first num_out in-region points in a random order), then find the
#   t-th in-region point by RANK instead of by sorting keys: an inclusive
#   prefix sum over the mask, per-128-block last-element totals, a compare
#   layer locating each target's block, one contiguous 128-row gather, and
#   a compare layer for the in-block offset. Replaces the ~8 ms top_k
#   selection (~0.9 ns/key over 10M keys) with a cumsum plus ~50M cheap
#   VPU compares; the with-replacement branch draws ranks uniformly in
#   [1, count] through the same machinery. The shuffle's 20k argsort
#   amortizes over the candidate axis — which is why the per-sample
#   training path (G=1 per cloud) does NOT use this scheme.
#
#   TWO-STAGE TOP-K (few candidates, big cloud — the training path):
#   strided-interleave the cloud once with a constant index (segment s =
#   points s, s+SEG, ...; depth-camera clouds are spatially ordered, so
#   in-region runs spread evenly over segments), per-segment top-L over
#   (G, SEG, P/SEG), exact top-k over the SEG*L survivors. Exact whenever
#   no segment holds more than L of the top-num_out keys — per-segment
#   share is Poisson(num_out/SEG), L=128 is 8+ sigma above it (~1e-12
#   tail); the only breaking pattern is a mask aligned to the stride
#   itself, which scan-ordered clouds do not produce.
#
#   DIRECT TOP-K (small clouds): one batched top_k is already cheap.
#
# In all cases points are gathered from the SHARED (P, 4)-padded cloud and
# transformed into each grasp frame only after selection (num_out, not P,
# per grasp).

_SEG = 16                 # selection segments (two-stage stage-1 fan-in)
_DIRECT_TOPK_MAX = 4096   # below this, one batched top_k is already cheap
_PREFIX_MIN_G = 32        # candidates needed to amortize the scene shuffle
_BLK = 128                # rank-select block width


def _rbg_key(key):
    """Derive an XLA RngBitGenerator key from a threefry key: z-key
    generation for (G, P) selection keys is ~1.5x cheaper with the hardware
    generator, and the selection only needs statistical uniformity."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        data = jax.random.key_data(key)
    else:
        data = key
    data = jnp.concatenate([data, data]).astype(jnp.uint32)[:4]
    return jax.random.wrap_key_data(data, impl="rbg")


def _to_frames(pts, centers, rot_rows):
    """(..., P, 3) points -> per-grasp frame coords, elementwise on the VPU.

    pts broadcasts against the leading grasp axis of centers (G, 3) /
    rot_rows (G, 3, 3). Written as mul/add chains (not einsum/matmul) so the
    arithmetic is exact fp32 and byte-identical between the mask pass and
    the output pass."""
    dx = pts[..., 0] - centers[:, 0, None]
    dy = pts[..., 1] - centers[:, 1, None]
    dz = pts[..., 2] - centers[:, 2, None]
    y = [dx * rot_rows[:, i, 0, None] + dy * rot_rows[:, i, 1, None]
         + dz * rot_rows[:, i, 2, None] for i in range(3)]
    return jnp.stack(y, axis=-1)


def _rank_select_indices(mask, count, num_out: int, k2):
    """Rank-select core: (G, P') in-region mask -> (G, num_out) indices of
    the selected points in the (shuffled) cloud order.

    Target ranks, 1-based. Without replacement: a PER-CANDIDATE random
    cyclic window of num_out ranks — any fixed window of a uniformly
    shuffled sequence is a uniform subset (exchangeability), and the
    random start decorrelates overlapping candidates, which would
    otherwise all receive the 'first num_out of the shared shuffle'
    (full per-candidate independence would need G shuffles — the cost
    this scheme exists to avoid; the residual window overlap between
    same-region candidates is ~num_out^2/count draws). With replacement:
    num_out uniform draws from [1, count] (dataset.py:263-268).
    """
    g, p_pad = mask.shape
    nb = p_pad // _BLK

    prefix = jnp.cumsum(mask.astype(jnp.int32), axis=1)       # (G, P')
    pref_blocks = prefix.reshape(g, nb, _BLK)
    incl = pref_blocks[..., -1]                               # (G, NB)

    k2a, k2b = jax.random.split(k2)
    r = jax.random.randint(k2a, (g, num_out), 0,
                           jnp.maximum(count, 1)[:, None])
    start = jax.random.randint(k2b, (g, 1), 0,
                               jnp.maximum(count, 1)[:, None])
    window = (start + jnp.arange(num_out, dtype=jnp.int32)[None, :]) \
        % jnp.maximum(count, 1)[:, None]
    t = jnp.where((count > num_out)[:, None], window + 1,
                  r.astype(jnp.int32) + 1)                    # (G, num_out)

    # block of the t-th in-region point: #blocks whose inclusive total < t
    blk = jnp.sum((incl[:, None, :] < t[:, :, None]), axis=-1)
    blk = jnp.minimum(blk, nb - 1)
    # whole-row gather (slice_sizes (1, BLK)) — an element-broadcast
    # take_along_axis here lowers to 49M scalar gathers (measured 35x
    # slower than the whole scene program)
    sel = jax.vmap(lambda pb, b: pb[b])(pref_blocks, blk)     # (G, N, BLK)
    off = jnp.sum(sel < t[..., None], axis=-1)                # (G, num_out)
    idx = jnp.minimum(blk * _BLK + off, p_pad - 1)
    # count == 0: every rank misses and idx clamps to the far pad row —
    # return finite row-0 points instead (callers with min_point_limit <= 0
    # would otherwise feed ~1e9 coordinates to the network)
    return jnp.where((count > 0)[:, None], idx, 0)


def _crop_batch_prefix(pc4, centers, rot_rows, box_lo, box_hi,
                       num_out: int, k1, k2):
    """Shuffle + prefix-sum rank-select (see the strategy comment above).

    pc4: (P, 4) padded cloud shared by all G grasps. Exact semantics:
    uniform without replacement when count > num_out (the first num_out
    in-region points of a uniformly shuffled cloud), with replacement
    otherwise (uniform ranks in [1, count])."""
    p_total = pc4.shape[0]

    perm = jax.random.permutation(k1, p_total)
    pcs = jnp.take(pc4, perm, axis=0)
    p_pad = -(-p_total // _BLK) * _BLK
    if p_pad > p_total:  # pad rows far away: outside every crop box
        pcs = jnp.pad(pcs, ((0, p_pad - p_total), (0, 0)),
                      constant_values=1e9)

    frame = _to_frames(pcs[None, :, :3], centers, rot_rows)   # (G, P', 3)
    mask = jnp.all((frame > box_lo[:, None]) & (frame < box_hi[:, None]),
                   axis=-1)                                   # (G, P')
    count = jnp.sum(mask, axis=-1)                            # (G,)

    idx = _rank_select_indices(mask, count, num_out, k2)
    sel_pts = jnp.take(pcs, idx, axis=0)[..., :3]             # (G, N, 3)
    return _to_frames(sel_pts, centers, rot_rows), count


def _crop_batch_prefix_percloud(pc4, centers, rot_rows, box_lo, box_hi,
                                num_out: int, k1, k2):
    """Per-cloud rank-select: grasp g crops ITS OWN cloud pc4[g] — the
    training path's layout (B samples, one view cloud each), batched as one
    G=B program instead of a vmapped per-sample two-stage top-k.

    pc4: (G, P, 4). ONE index shuffle is shared by the batch: the clouds
    differ per sample, so 'first num_out in-region points of a common
    random order' is still a uniform random subset per sample, and the
    per-sample random rank windows (_rank_select_indices) decorrelate the
    occasional same-cloud pair (same trade as the scene path, documented
    in docs/QUIRKS.md). This amortizes the 20k-point shuffle over the
    whole batch — the reason the per-sample path couldn't use rank-select.
    """
    g, p_total = pc4.shape[0], pc4.shape[1]

    perm = jax.random.permutation(k1, p_total)
    pcs = jnp.take(pc4, perm, axis=1)                         # (G, P, 4)
    p_pad = -(-p_total // _BLK) * _BLK
    if p_pad > p_total:  # pad rows far away: outside every crop box
        pcs = jnp.pad(pcs, ((0, 0), (0, p_pad - p_total), (0, 0)),
                      constant_values=1e9)

    frame = _to_frames(pcs[..., :3], centers, rot_rows)       # (G, P', 3)
    mask = jnp.all((frame > box_lo[:, None]) & (frame < box_hi[:, None]),
                   axis=-1)                                   # (G, P')
    count = jnp.sum(mask, axis=-1)                            # (G,)

    idx = _rank_select_indices(mask, count, num_out, k2)
    # whole-row per-cloud gather (slice_sizes (1, 4) batched over G)
    sel_pts = jax.vmap(lambda pc_g, ix: pc_g[ix])(pcs, idx)[..., :3]
    return _to_frames(sel_pts, centers, rot_rows), count


def _crop_batch(pc, centers, rot_rows, box_lo, box_hi, num_out: int, key):
    """Batched crop+resample for all grasps in one pass.

    pc: (P, 3) shared scene cloud; centers: (G, 3); rot_rows: (G, 3, 3) rows
    [approach, binormal, minor]; box_lo/box_hi: (G, 3) per-grasp strict box.
    Returns (points (G, num_out, 3) in grasp frames, counts (G,)).
    """
    import numpy as np

    g = centers.shape[0]
    p_total = pc.shape[0]
    k1, k2 = jax.random.split(key)

    # pad to 4 columns up front: rows gather ~1.5x faster than (P, 3)
    pc4 = jnp.pad(pc, ((0, 0), (0, 1)))

    if g >= _PREFIX_MIN_G and p_total > _DIRECT_TOPK_MAX:
        return _crop_batch_prefix(pc4, centers, rot_rows, box_lo, box_hi,
                                  num_out, k1, k2)

    two_stage = p_total > _DIRECT_TOPK_MAX
    if two_stage:
        # strided interleave of the CLOUD (constant-index gather, once):
        # segment s = points s, s+SEG, s+2*SEG, ... as a contiguous chunk,
        # so the per-segment top_k below needs no (G, P) transpose
        seg = _SEG
        seg_len = -(-p_total // seg)
        perm_np = np.full((seg, seg_len), p_total, np.int32)
        for s in range(seg):
            run = np.arange(s, p_total, seg, dtype=np.int32)
            perm_np[s, : len(run)] = run
        slot_real = jnp.asarray((perm_np < p_total).reshape(-1))  # constant
        pc4 = jnp.take(pc4, jnp.asarray(
            np.minimum(perm_np.reshape(-1), p_total - 1)), axis=0)
        p_len = seg * seg_len
    else:
        slot_real = None
        p_len = p_total

    frame = _to_frames(pc4[None, :, :3], centers, rot_rows)   # (G, P', 3)
    mask = jnp.all((frame > box_lo[:, None]) & (frame < box_hi[:, None]),
                   axis=-1)                                   # (G, P')
    if slot_real is not None:
        mask = mask & slot_real                 # duplicated pad rows dropped
    count = jnp.sum(mask, axis=-1)                            # (G,)

    z = jax.random.uniform(_rbg_key(k1), (g, p_len), jnp.float32)
    z = jnp.where(mask, z, -jnp.inf)
    kk = min(num_out, p_total)

    if not two_stage:
        _, perm = jax.lax.top_k(z, kk)                        # (G, kk)
    else:
        # L: 8+ sigma above the expected per-segment share of the top-kk
        lim = min(max(128, 2 * (-(-kk // seg))), seg_len)
        zs, iseg = jax.lax.top_k(z.reshape(g, seg, seg_len), lim)
        gidx = iseg + (jnp.arange(seg) * seg_len)[None, :, None]
        _, j = jax.lax.top_k(zs.reshape(g, seg * lim), kk)
        perm = jnp.take_along_axis(gidx.reshape(g, seg * lim), j, axis=1)

    if kk < num_out:  # cloud smaller than num_out: pad (dead branch below)
        perm = jnp.pad(perm, ((0, 0), (0, num_out - kk)), mode="edge")

    # without replacement: the top-num_out subset itself; with replacement:
    # num_out uniform draws from the first `count` entries (dataset.py:263-268)
    r = jax.random.randint(k2, (g, num_out), 0,
                           jnp.maximum(count, 1)[:, None])
    idx = jnp.where((count > num_out)[:, None], perm[:, :num_out],
                    jnp.take_along_axis(perm, jnp.minimum(r, kk - 1), axis=1))

    # gather from the shared (permuted) cloud, then transform only the
    # selected points (num_out, not P, per grasp)
    sel = jnp.take(pc4, idx, axis=0)[..., :3]                 # (G, num_out, 3)
    return _to_frames(sel, centers, rot_rows), count


@functools.partial(jax.jit, static_argnames=("num_out", "min_point_limit"))
def collect_grasp_clouds(
    grasps,
    pc,
    transform,
    key,
    *,
    num_out: int = 750,
    min_point_limit: int = 50,
):
    """Batched training-path crop == vmapped dataset.py collect_pc.

    Args:
      grasps: (G, >=8) grasp configuration rows (10-dim + score columns ok).
      pc: (P, 3) object point cloud (cloud frame).
      transform: (4, 4) mesh->cloud frame transform (google2cloud).
      key: PRNG key for the resampling.
      num_out: points per cropped cloud (grasp_points_num).
      min_point_limit: validity threshold (dataset.py:71-72; default 50).

    Returns:
      points: (G, num_out, 3) in the gripper frame (channels-last, feeds the
              model directly).
      counts: (G,) number of in-region points before resampling.
      valid:  (G,) bool, counts >= min_point_limit.
    """
    def frame_of(grasp):
        center, approach, binormal, minor, width = grasp_frame_from_config(grasp)
        center, approach, binormal, minor = apply_transform_to_frame(
            transform, center, approach, binormal, minor
        )
        rot_rows = jnp.stack([approach, binormal, minor])
        box = jnp.stack([width / 4.0, width / 2.0, width / 4.0])
        return center, rot_rows, box

    centers, rot_rows, boxes = jax.vmap(frame_of)(grasps)
    points, counts = _crop_batch(pc, centers, rot_rows, -boxes, boxes,
                                 num_out, key)
    valid = counts >= min_point_limit
    # zero out invalid entries so downstream batched scoring is well-defined
    points = jnp.where(valid[:, None, None], points, 0.0)
    return points, counts, valid


@functools.partial(jax.jit, static_argnames=("num_out", "min_point_limit"))
def collect_grasp_clouds_batched(
    grasps,
    clouds,
    transforms,
    key,
    *,
    num_out: int = 750,
    min_point_limit: int = 50,
):
    """Per-sample training crop, batched: sample i crops ITS OWN cloud.

    The training batch layout (one grasp + one view cloud + one transform
    per sample, dataset.py:420-453) as ONE rank-select program over the
    whole batch — replaces vmapping ``collect_grasp_clouds`` per sample
    (which fell back to the two-stage top-k because a single sample's
    shuffle can't amortize; the batch's can — see
    ``_crop_batch_prefix_percloud``).

    Args:
      grasps: (B, >=8) grasp configuration rows.
      clouds: (B, P, 3) per-sample view clouds.
      transforms: (B, 4, 4) per-sample mesh->cloud transforms.
      key: PRNG key (one shuffle + per-sample rank windows).

    Returns (points (B, num_out, 3) in gripper frames, counts (B,),
    valid (B,) = counts >= min_point_limit).
    """
    def frame_of(grasp, transform):
        center, approach, binormal, minor, width = grasp_frame_from_config(
            grasp)
        center, approach, binormal, minor = apply_transform_to_frame(
            transform, center, approach, binormal, minor
        )
        rot_rows = jnp.stack([approach, binormal, minor])
        box = jnp.stack([width / 4.0, width / 2.0, width / 4.0])
        return center, rot_rows, box

    centers, rot_rows, boxes = jax.vmap(frame_of)(grasps, transforms)
    k1, k2 = jax.random.split(key)
    pc4 = jnp.pad(clouds, ((0, 0), (0, 0), (0, 1)))
    points, counts = _crop_batch_prefix_percloud(
        pc4, centers, rot_rows, -boxes, boxes, num_out, k1, k2)
    valid = counts >= min_point_limit
    points = jnp.where(valid[:, None, None], points, 0.0)
    return points, counts, valid


@functools.partial(jax.jit, static_argnames=("num_out", "min_point_limit",
                                             "recenter"))
def collect_candidate_clouds(
    bottom_centers,
    approaches,
    binormals,
    minor_normals,
    pc,
    hand_depth,
    width,
    key,
    *,
    num_out: int = 500,
    min_point_limit: int = 10,
    recenter: bool = False,
):
    """Batched online-path crop == vmapped kinect2grasp.py collect_pc
    (use_dataset_py=True box, kinect2grasp.py:216-233).

    Box: x in (0, hand_depth), y in +-width/2, z in +-width/4, where width is
    the gripper opening (hand_outer_diameter - 2*finger_width), measured
    from the hand BOTTOM CENTER.

    ``recenter=True`` fixes the reference's own train/deploy frame mismatch
    (docs/QUIRKS.md): the TRAINING crop (dataset.py:50-69) is taken around
    the grasp CENTER with box x,z in +-width/4, y in +-width/2, so its x
    coordinates are near-zero-mean — while this online crop spans
    x in (0, hand_depth), shifting every deployed input ~hand_depth/2 along
    x out of the training support (measured: class-good probability < 1e-3
    for EVERY candidate of a scene whose ground-truth pool is 45% good).
    With recenter, a first pass estimates the grasp-center depth as the
    in-box points' mean x and the final crop is the TRAINING box around
    that center — the deployed input distribution matches what the model
    was trained on. Returns (points (G, num_out, 3), counts (G,),
    valid (G,)).
    """
    g = bottom_centers.shape[0]
    if pc.shape[0] == 0:  # static shape: empty scene -> all-invalid crops
        return (jnp.zeros((g, num_out, 3), pc.dtype),
                jnp.zeros((g,), jnp.int32), jnp.zeros((g,), bool))

    def normalize(v):
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    rot_rows = jnp.stack([normalize(approaches), normalize(binormals),
                          normalize(minor_normals)], axis=1)    # (G, 3, 3)

    if recenter:
        # pass 1: reference-box membership -> per-candidate grasp-center
        # depth estimate (mean in-box x), cheap masked reduction
        rel = pc[None, :, :] - bottom_centers[:, None, :]       # (G, P, 3)
        loc = jnp.einsum("gpj,gij->gpi", rel, rot_rows)
        inref = ((loc[..., 0] > 0) & (loc[..., 0] < hand_depth)
                 & (jnp.abs(loc[..., 1]) < width / 2.0)
                 & (jnp.abs(loc[..., 2]) < width / 4.0))
        n_in = jnp.maximum(jnp.sum(inref, axis=1), 1)
        xbar = jnp.sum(jnp.where(inref, loc[..., 0], 0.0), axis=1) / n_in
        centers = bottom_centers + approaches * xbar[:, None]
        box_hi = jnp.stack([width / 4.0, width / 2.0, width / 4.0])
        box_hi = jnp.broadcast_to(box_hi, (g, 3))
        box_lo = -box_hi
    else:
        centers = bottom_centers
        box_lo = jnp.stack([jnp.zeros_like(width), -width / 2.0,
                            -width / 4.0])
        box_hi = jnp.stack([hand_depth * jnp.ones_like(width), width / 2.0,
                            width / 4.0])
        box_lo = jnp.broadcast_to(box_lo, (g, 3))
        box_hi = jnp.broadcast_to(box_hi, (g, 3))

    points, counts = _crop_batch(pc, centers, rot_rows, box_lo,
                                 box_hi, num_out, key)
    valid = counts >= min_point_limit
    points = jnp.where(valid[:, None, None], points, 0.0)
    return points, counts, valid
