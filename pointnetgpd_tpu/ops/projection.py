"""GPD projection features: 60x60 occupancy + normal images, on device.

Re-design of the reference's projection pipeline for the GPD baseline CNN
(reference: PointNetGPD/model/dataset.py:88-198): the cropped closing-region
cloud is voxelized at res = gripper_width / (60 - margin); each occupied 3-D
voxel accumulates up to ``voxel_point_num``=50 points' normals (first-come,
order-dependent, dataset.py:178-184); each (u, v) image cell takes the count
and mean normal of its LAST occupied voxel in np.unique's lexicographic order
(== the max-w voxel, dataset.py:186-194); occupancy is max-normalized.

The host loops become segment ops: per-voxel ranks from a stable sort, masked
segment sums, and a per-cell argmax over the third axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("size", "margin", "voxel_point_num"))
def project_to_image(points, normals, valid, gripper_width, order,
                     *, size: int = 60, margin: int = 1,
                     voxel_point_num: int = 50):
    """One projection image pair for one axis order.

    points/normals: (P, 3) cropped gripper-frame points + their normals;
    valid: (P,) mask of real (unpadded) points; order: static 3-tuple axis
    permutation (dataset.py:104-115 uses (0,1,2), (1,2,0), (0,2,1)).

    Returns (occupy (size, size, 1), norm (size, size, 3)).
    """
    res = gripper_width / (size - margin)
    coords = jnp.floor(points / res + size / 2.0).astype(jnp.int32)
    coords = coords[:, jnp.asarray(order)]
    in_range = jnp.all((coords >= 0) & (coords < size), axis=1) & valid
    u, v, w = coords[:, 0], coords[:, 1], coords[:, 2]

    n_vox = size * size * size
    vid = jnp.where(in_range, (u * size + v) * size + w, n_vox)  # pad bucket

    # per-point rank within its voxel (stable sort == first-come order),
    # replicating the reference's 50-points-per-voxel cap (dataset.py:178-184)
    p_total = points.shape[0]
    sort_idx = jnp.argsort(vid, stable=True)
    sorted_vid = vid[sort_idx]
    first_of_run = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_vid[1:] != sorted_vid[:-1]])
    run_start = jnp.maximum.accumulate(
        jnp.where(first_of_run, jnp.arange(p_total), 0))
    rank_sorted = jnp.arange(p_total) - run_start
    rank = jnp.zeros((p_total,), jnp.int32).at[sort_idx].set(
        rank_sorted.astype(jnp.int32))
    counted = in_range & (rank < voxel_point_num)

    seg = jnp.where(counted, vid, n_vox)
    counts = jax.ops.segment_sum(
        jnp.ones((p_total,), jnp.int32), seg, num_segments=n_vox + 1)[:n_vox]
    norm_sums = jax.ops.segment_sum(
        jnp.where(counted[:, None], normals, 0.0), seg,
        num_segments=n_vox + 1)[:n_vox]

    counts3 = counts.reshape(size, size, size)
    norm3 = norm_sums.reshape(size, size, size, 3)
    occupied = counts3 > 0

    # per (u, v) cell: the LAST occupied w in lexicographic order == max w
    # (np.unique sorts, duplicate writes keep the last — dataset.py:186-194)
    w_idx = jnp.arange(size)[None, None, :]
    w_pick = jnp.max(jnp.where(occupied, w_idx, -1), axis=2)      # (size, size)
    any_occ = w_pick >= 0
    w_safe = jnp.maximum(w_pick, 0)
    cell_count = jnp.take_along_axis(counts3, w_safe[..., None], axis=2)[..., 0]
    cell_norm = jnp.take_along_axis(
        norm3, w_safe[..., None, None], axis=2)[..., 0, :]
    cell_count = jnp.where(any_occ, cell_count, 0)
    denom = jnp.maximum(cell_count, 1).astype(points.dtype)
    norm_pic = jnp.where(any_occ[..., None], cell_norm / denom[..., None], 0.0)

    occupy = cell_count.astype(points.dtype)[..., None]
    max_occ = jnp.max(occupy)
    occupy = occupy / jnp.maximum(max_occ, 1.0)
    return occupy, norm_pic


@functools.partial(jax.jit, static_argnames=("project_chann", "size", "margin",
                                             "voxel_point_num"))
def gpd_projection_features(points, normals, valid, gripper_width,
                            *, project_chann: int = 12, size: int = 60,
                            margin: int = 1, voxel_point_num: int = 50):
    """Full GPD input features (dataset.py:88-120): 3 channels (normal image
    of order (0,1,2)) or 12 channels (occupancy+normal images over orders
    (0,1,2), (1,2,0), (0,2,1), stacked in the reference's dstack order).

    Returns (size, size, project_chann), NHWC. vmap over a leading batch of
    crops for whole-batch feature extraction in one device call.
    """
    o1, n1 = project_to_image(points, normals, valid, gripper_width, (0, 1, 2),
                              size=size, margin=margin,
                              voxel_point_num=voxel_point_num)
    if project_chann == 3:
        return n1
    if project_chann != 12:
        raise NotImplementedError("project_chann must be 3 or 12")
    o2, n2 = project_to_image(points, normals, valid, gripper_width, (1, 2, 0),
                              size=size, margin=margin,
                              voxel_point_num=voxel_point_num)
    o3, n3 = project_to_image(points, normals, valid, gripper_width, (0, 2, 1),
                              size=size, margin=margin,
                              voxel_point_num=voxel_point_num)
    return jnp.concatenate([o1, n1, o2, n2, o3, n3], axis=-1)
