"""Mesh -> signed-distance-grid voxelizer: the SDFGen replacement, on TPU.

The reference shells out to the external C++ ``SDFGen`` binary (reference:
dex-net/apps/read_file_sdf.py:34-41; config path_to_sdfgen, sdf_dim=100,
sdf_padding=5 in test/config.yaml) to produce the .sdf grids everything else
consumes. Here the voxelizer is a batched JAX program:

- unsigned distance: exact point-to-triangle distance, minimized over all
  triangles (grid points x triangles, chunked so HBM stays bounded);
- sign: vertical ray parity per (x, y) column — triangle crossings are
  bucketed into z-cells with a scatter-add histogram, and a suffix cumsum
  gives the crossing count above every grid z (odd == inside).

Complexity is O(grid * triangles); at the reference's 100^3 x ~50k triangles
this is a few seconds on a v5e chip. Decimate very large meshes first.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry.mesh import Mesh3D
from ..geometry.sdf import SdfGrid, make_sdf
from ..grasping.quality import closest_point_on_triangle_to_origin


def _point_triangle_dist(points, tri_a, tri_b, tri_c):
    """Min distance from each point (P, 3) to one triangle — reuses the
    closed-form closest-point-on-triangle (quality.py) with a shift."""
    def one(p):
        return closest_point_on_triangle_to_origin(tri_a - p, tri_b - p,
                                                   tri_c - p)

    return jax.vmap(one)(points)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _unsigned_distance(points, tri_v, *, chunk: int = 2048):
    """(P,) min distance from each grid point to the mesh surface.
    tri_v: (F, 3, 3). Chunked over grid points; triangles stay resident."""
    p_total = points.shape[0]
    pad = (-p_total) % chunk
    pts = jnp.concatenate([points, jnp.zeros((pad, 3), points.dtype)]) \
        if pad else points

    a, b, c = tri_v[:, 0], tri_v[:, 1], tri_v[:, 2]

    def one_chunk(q):
        def per_point(p):
            d = jax.vmap(
                lambda ta, tb, tc: closest_point_on_triangle_to_origin(
                    ta - p, tb - p, tc - p))(a, b, c)
            return jnp.min(d)

        return jax.vmap(per_point)(q)

    out = jax.lax.map(one_chunk, pts.reshape(-1, chunk, 3)).reshape(-1)
    return out[:p_total]


@functools.partial(jax.jit, static_argnames=("nz", "chunk"))
def _inside_parity(columns_xy, z0, res, tri_v, *, nz: int, chunk: int = 512):
    """(C, nz) bool inside-mask by vertical ray parity.

    columns_xy: (C, 2) the (x, y) of each grid column; z0/res: grid z origin
    and spacing. For each column, intersect the vertical ray with every
    triangle (2-D barycentric test in the xy plane), histogram the crossing
    z's into cells, suffix-cumsum -> crossings strictly above each grid z.
    """
    a, b, c = tri_v[:, 0], tri_v[:, 1], tri_v[:, 2]
    # 2-D edge setup in xy
    ax, ay = a[:, 0], a[:, 1]
    bx, by = b[:, 0], b[:, 1]
    cx, cy = c[:, 0], c[:, 1]
    denom = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy)
    denom_safe = jnp.where(jnp.abs(denom) < 1e-18, 1e-18, denom)

    c_total = columns_xy.shape[0]
    pad = (-c_total) % chunk
    cols = jnp.concatenate(
        [columns_xy, jnp.full((pad, 2), 1e9, columns_xy.dtype)]) \
        if pad else columns_xy

    def one_chunk(q):  # q: (chunk, 2)
        px, py = q[:, 0, None], q[:, 1, None]           # (chunk, 1)
        w1 = ((by - cy) * (px - cx) + (cx - bx) * (py - cy)) / denom_safe
        w2 = ((cy - ay) * (px - cx) + (ax - cx) * (py - cy)) / denom_safe
        w3 = 1.0 - w1 - w2
        hit = (w1 >= 0) & (w2 >= 0) & (w3 >= 0) & (jnp.abs(denom) > 1e-18)
        z_int = w1 * a[:, 2] + w2 * b[:, 2] + w3 * c[:, 2]  # (chunk, F)

        # bucket crossings: cell k counts crossings with z_int in
        # [z0 + k*res, z0 + (k+1)*res); crossings above grid z_k are the
        # suffix sum over cells > k plus same-cell crossings above z_k —
        # we use half-cell offset grid comparisons, exact enough at res/1e3
        kbin = jnp.clip(jnp.floor((z_int - z0) / res).astype(jnp.int32) + 1,
                        0, nz + 1)
        kbin = jnp.where(hit, kbin, nz + 1)

        hist = jax.vmap(
            lambda kb: jnp.zeros((nz + 2,), jnp.int32).at[kb].add(1)
        )(kbin)                                          # (chunk, nz+2)
        # crossings with z_int >= z_k  (bin index k..nz)
        suffix = jnp.cumsum(hist[:, ::-1], axis=1)[:, ::-1]
        above = suffix[:, 1:nz + 1]                      # (chunk, nz)
        return (above % 2) == 1

    out = jax.lax.map(one_chunk, cols.reshape(-1, chunk, 2))
    return out.reshape(-1, nz)[:c_total]


def mesh_to_sdf(mesh: Mesh3D, dim: int = 100, padding: int = 5,
                jitter: float = 1e-4, max_triangles: int = 60000) -> SdfGrid:
    """Voxelize a watertight mesh into a (dim^3) SDF grid with ``padding``
    empty cells on each side (SDFGen's dim/padding semantics,
    read_file_sdf.py:34-41 + test/config.yaml).

    ``jitter`` nudges the grid off exact vertex/edge alignments so the ray
    parity is robust (SDFGen uses exact predicates instead).

    Precondition (shared with SDFGen): the mesh must not be SELF-INTERSECTING
    — in an overlapping union a ray entering both solids counts two crossings
    and parity marks the overlap region outside. Merge touching solids on a
    shared face, or boolean-union them upstream.
    """
    if len(mesh.triangles) > max_triangles:
        # the distance pass is O(grid x triangles): decimate huge meshes
        # (e.g. YCB google_512k) to a voxelizer-friendly size; at SDFGen's
        # 100^3 resolution the geometric detail lost is below the cell size
        mesh = mesh.decimate(max_triangles)
    verts = np.asarray(mesh.vertices, np.float32)
    tris = np.asarray(mesh.triangles, np.int32)
    if len(verts) == 0 or len(tris) == 0:
        raise ValueError("mesh_to_sdf requires a mesh with vertices and "
                         f"triangles (got {len(verts)} verts, {len(tris)} tris)")
    lo = verts.min(axis=0)
    hi = verts.max(axis=0)
    span = float((hi - lo).max())
    res = span / (dim - 1 - 2 * padding)
    # asymmetric per-axis jitter: a symmetric shift keeps columns on diagonal
    # shared edges (e.g. a cube face's triangulation diagonal x == y), where
    # the parity ray double-counts; incommensurate offsets avoid all edges
    origin = lo - padding * res + jitter * res * np.array([1.0, 2.6180339887,
                                                           4.2360679775])

    idx = np.arange(dim, dtype=np.float32)
    tri_v_np = verts[tris]                               # (F, 3, 3)
    tri_v = jnp.asarray(tri_v_np)

    if jax.default_backend() == "tpu":
        # Pallas kernel: spatially-blocked grid + bounding-sphere pruning
        # (ops/point_triangle_pallas.py) — ~2.6x the XLA path at 8k tris
        from .point_triangle_pallas import (
            blocked_grid, min_point_triangle_dist2, pack_triangles)

        pts_blocked, unblock = blocked_grid(dim, dim, dim, origin, res)
        tri_data, sup_data = pack_triangles(tri_v_np)
        d2 = min_point_triangle_dist2(
            jnp.asarray(pts_blocked), jnp.asarray(tri_data),
            jnp.asarray(sup_data))
        dist = np.sqrt(np.maximum(unblock(d2), 0.0))
    else:
        ii, jj, kk = np.meshgrid(idx, idx, idx, indexing="ij")
        pts = origin + res * np.stack([ii, jj, kk], axis=-1)
        pts_flat = jnp.asarray(pts.reshape(-1, 3))
        dist = np.asarray(_unsigned_distance(pts_flat, tri_v)).reshape(
            dim, dim, dim)

    cols = origin[:2] + res * np.stack(
        np.meshgrid(idx, idx, indexing="ij"), axis=-1).reshape(-1, 2)
    inside = np.asarray(_inside_parity(
        jnp.asarray(cols.astype(np.float32)), jnp.float32(origin[2]),
        jnp.float32(res), tri_v, nz=dim)).reshape(dim, dim, dim)

    data = np.where(inside, -dist, dist).astype(np.float32)
    return make_sdf(data, origin, res)
