"""Point-cloud preprocessing ops: voxel downsampling + KNN normal estimation.

Replaces the reference's host-side stack for the online path: the numba
VoxelGrid (reference: dex-net/apps/voxelgrid.py:13-246, used at
kinect2grasp.py:102-127) and python-pcl NormalEstimation with KSearch=30 +
camera-consistent flipping (kinect2grasp.py:131-144). Both are fixed-shape
batched device ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_grid",))
def voxel_downsample(points, n_grid: int = 500):
    """Occupied-voxel-center downsampling (voxelgrid.py:89-160 +
    kinect2grasp.py:102-107: ``voxel_centers[voxel_n]`` deduplicated).

    points: (P, 3). Returns (centers (P, 3), mask (P,)) — row i is the center
    of the i-th point's voxel, kept (mask=True) only for the first point
    landing in each voxel; masked rows are zeros. Fixed output shape: the
    number of occupied voxels is data-dependent, so callers consume the mask
    (or compact on host).
    """
    if points.shape[0] == 0:  # static shape: empty cloud -> empty output
        return (jnp.zeros((0, 3), points.dtype), jnp.zeros((0,), bool))
    lo = jnp.min(points, axis=0)
    hi = jnp.max(points, axis=0)
    span = jnp.maximum(hi - lo, 1e-9)
    step = span / n_grid
    idx = jnp.clip(((points - lo) / step).astype(jnp.int32), 0, n_grid - 1)
    centers = lo + (idx.astype(points.dtype) + 0.5) * step

    vid = (idx[:, 0] * n_grid + idx[:, 1]) * n_grid + idx[:, 2]
    order = jnp.argsort(vid)
    sorted_vid = vid[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_vid[1:] != sorted_vid[:-1]])
    mask = jnp.zeros((points.shape[0],), bool).at[order].set(first)
    return jnp.where(mask[:, None], centers, 0.0), mask


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def estimate_normals_knn(points, camera_pos, *, k: int = 30, chunk: int = 1024):
    """Per-point surface normals by k-NN plane fitting, flipped toward the
    camera (kinect2grasp.py:131-144; pcl NormalEstimation KSearch=30 —
    covariance of the k nearest neighbors, normal = least eigenvector).

    points: (P, 3); camera_pos: (3,). Returns (P, 3) unit normals. Pairwise
    distances are computed in query chunks so HBM stays bounded for large P.
    """
    p_total = points.shape[0]
    k = min(k, p_total)  # clouds smaller than KSearch use all points
    if k == 0:
        return jnp.zeros((0, 3), points.dtype)
    pad = (-p_total) % chunk
    pts_pad = jnp.concatenate(
        [points, jnp.full((pad, 3), jnp.inf, points.dtype)]) if pad else points
    n_chunks = pts_pad.shape[0] // chunk

    def one_chunk(queries):
        d2 = jnp.sum((queries[:, None, :] - points[None, :, :]) ** 2, axis=-1)
        _, nbr = jax.lax.top_k(-d2, k)                 # (chunk, k) incl. self
        nbr_pts = points[nbr]                          # (chunk, k, 3)
        mean = jnp.mean(nbr_pts, axis=1, keepdims=True)
        centered = nbr_pts - mean
        cov = jnp.einsum("qki,qkj->qij", centered, centered)
        _, vecs = jnp.linalg.eigh(cov)
        return vecs[:, :, 0]                           # least eigenvector

    normals = jax.lax.map(
        one_chunk, pts_pad.reshape(n_chunks, chunk, 3)).reshape(-1, 3)
    normals = normals[:p_total]

    # flip toward the camera (kinect2grasp.py:137-144)
    to_cam = camera_pos - points
    flip = jnp.sum(to_cam * normals, axis=-1) < 0
    normals = jnp.where(flip[:, None], -normals, normals)
    return normals / jnp.maximum(
        jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12)
