"""Pallas TPU kernel: min point-triangle distance (the voxelizer hot loop).

``ops/mesh_to_sdf._unsigned_distance`` (the SDFGen replacement's distance
pass, reference: dex-net/apps/read_file_sdf.py:34-41) is O(grid x triangles)
and XLA-compiled it runs far off the VPU roofline: every intermediate of the
closest-point-on-triangle select chain materializes as a (chunk, F) HBM
array (~1 TB of traffic at 100^3 x 8k triangles). This kernel keeps the
whole pairwise computation in registers/VMEM and adds geometric pruning XLA
cannot express:

- grid points are processed in SPATIALLY COMPACT blocks of 128 cells
  (4x4x8), one block per program, as a (1, 128) lane vector;
- triangles (Morton-sorted for locality) are resident in VMEM, packed 16
  floats per row; the pairwise body evaluates 8 triangles x 128 points per
  step with a single (8, 16) vector load — no scalar loads in the hot loop;
- triangles are grouped into supertiles of 128 with precomputed bounding
  spheres; a supertile is processed only if its sphere can beat the block's
  running upper bound ``cur`` = sqrt(max over the block of the current min
  squared distance) — and the closest supertile is processed first so
  ``cur`` tightens before the scan.

The per-pair body is a branchless Ericson closest-point-on-triangle
(Real-Time Collision Detection §5.1.5).

Used by ``ops.mesh_to_sdf.mesh_to_sdf`` on TPU; the XLA path remains for
CPU and as the parity oracle (tests/test_point_triangle_pallas.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend (absent on CPU; interpret mode still works)
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

BLOCK_POINTS = 128       # points per program, one (1, 128) lane vector
SUPER = 128              # triangles per supertile (pruning granularity)
_FAR = 1.0e8             # padding sentinel coordinate
_EPS = 1.0e-30


def morton_order(centroids: np.ndarray, bits: int = 10) -> np.ndarray:
    """Sort order by Morton code of quantized 3-D positions (host-side;
    shared encode: ops/cloud.py morton_codes)."""
    from .cloud import morton_codes

    code = np.asarray(morton_codes(np.asarray(centroids, np.float32),
                                   bits=bits))
    return np.argsort(code, kind="stable")


def pack_triangles(tri_v: np.ndarray):
    """(F, 3, 3) float triangle vertices -> (tri_data (Fp, 16) f32,
    sup_data (8, Sp) f32), Morton-sorted, padded to a SUPER multiple.

    tri_data columns: ax ay az bx by bz cx cy cz 0 0 0 0 0 0 0.
    sup_data columns: scx, scy, scz, sr (bounding sphere of each supertile's
    triangles), rest zero.
    """
    tri_v = np.asarray(tri_v, np.float32)
    f = tri_v.shape[0]
    cent = tri_v.mean(axis=1)
    order = morton_order(cent)
    tri_v = tri_v[order]
    cent = cent[order]

    f_pad = max(-(-f // SUPER) * SUPER, SUPER)
    data = np.zeros((f_pad, 16), np.float32)
    data[f:, 0:9] = _FAR      # degenerate far triangle: A=B=C=(FAR,FAR,FAR)
    data[:f, 0:3] = tri_v[:, 0]
    data[:f, 3:6] = tri_v[:, 1]
    data[:f, 6:9] = tri_v[:, 2]

    s = f_pad // SUPER
    sup = np.zeros((s, 8), np.float32)
    sup[:, 0:3] = _FAR        # padded supertiles: far away, never processed
    verts_flat = data[:, 0:9].reshape(f_pad, 3, 3)
    for i in range(s):
        vv = verts_flat[i * SUPER:(i + 1) * SUPER].reshape(-1, 3)
        vv = vv[(np.abs(vv) < _FAR / 2).all(axis=1)]
        if len(vv) == 0:      # all-padding supertile
            continue
        sc = 0.5 * (vv.min(axis=0) + vv.max(axis=0))
        sup[i, 0:3] = sc
        sup[i, 3] = np.linalg.norm(vv - sc, axis=1).max()
    return data, sup


def _ptd_kernel(px_ref, py_ref, pz_ref, tri_ref, sup_ref, out_ref, db_scr):
    px, py, pz = px_ref[0], py_ref[0], pz_ref[0]         # (1, 128)
    n_sup = sup_ref.shape[0]

    # block geometry: center + half-diagonal of this 128-point tile
    lox, hix = jnp.min(px), jnp.max(px)
    loy, hiy = jnp.min(py), jnp.max(py)
    loz, hiz = jnp.min(pz), jnp.max(pz)
    bxc, byc, bzc = (lox + hix) * 0.5, (loy + hiy) * 0.5, (loz + hiz) * 0.5
    bhd = 0.5 * jnp.sqrt((hix - lox) ** 2 + (hiy - loy) ** 2
                         + (hiz - loz) ** 2)

    # supertile lower bounds: dist(block center, sphere) - bhd (scalar pass)
    def sup_bound(s, best):
        best_d, best_s = best
        d = (jnp.sqrt((sup_ref[s, 0] - bxc) ** 2 + (sup_ref[s, 1] - byc) ** 2
                      + (sup_ref[s, 2] - bzc) ** 2) - sup_ref[s, 3] - bhd)
        db_scr[s] = d
        take = d < best_d
        return (jnp.where(take, d, best_d),
                jnp.where(take, s, best_s))

    _, best_s = jax.lax.fori_loop(0, n_sup, sup_bound,
                                  (jnp.float32(jnp.inf), jnp.int32(0)))

    out_ref[0] = jnp.full((1, 128), jnp.inf, jnp.float32)

    def eval_group(gi):
        """8 triangles x 128 points: branchless Ericson, min-d^2 update."""
        blk = tri_ref[pl.ds(gi * 8, 8), :]               # (8, 16)
        ax, ay, az = blk[:, 0:1], blk[:, 1:2], blk[:, 2:3]   # (8, 1)
        bx, by, bz = blk[:, 3:4], blk[:, 4:5], blk[:, 5:6]
        cx, cy, cz = blk[:, 6:7], blk[:, 7:8], blk[:, 8:9]
        abx, aby, abz = bx - ax, by - ay, bz - az
        acx, acy, acz = cx - ax, cy - ay, cz - az
        apx, apy, apz = px - ax, py - ay, pz - az        # (8, 128)
        d1 = abx * apx + aby * apy + abz * apz
        d2 = acx * apx + acy * apy + acz * apz
        bpx, bpy, bpz = px - bx, py - by, pz - bz
        d3 = abx * bpx + aby * bpy + abz * bpz
        d4 = acx * bpx + acy * bpy + acz * bpz
        cpx, cpy, cpz = px - cx, py - cy, pz - cz
        d5 = abx * cpx + aby * cpy + abz * cpz
        d6 = acx * cpx + acy * cpy + acz * cpz
        va = d3 * d6 - d5 * d4
        vb = d5 * d2 - d1 * d6
        vc = d1 * d4 - d3 * d2

        m_a = (d1 <= 0) & (d2 <= 0)
        m_b = (d3 >= 0) & (d4 <= d3)
        m_c = (d6 >= 0) & (d5 <= d6)
        m_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
        m_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
        e43, e56 = d4 - d3, d5 - d6
        m_bc = (va <= 0) & (e43 >= 0) & (e56 >= 0)

        t_ab = d1 / jnp.maximum(d1 - d3, _EPS)
        t_ac = d2 / jnp.maximum(d2 - d6, _EPS)
        t_bc = e43 / jnp.maximum(e43 + e56, _EPS)
        denom = jnp.maximum(va + vb + vc, _EPS)
        v = vb / denom
        w = vc / denom

        def coord(a0, b0, c0, ab0, ac0):
            q = a0 + ab0 * v + ac0 * w                       # face
            q = jnp.where(m_bc, b0 + (c0 - b0) * t_bc, q)    # edge BC
            q = jnp.where(m_ac, a0 + ac0 * t_ac, q)          # edge AC
            q = jnp.where(m_ab, a0 + ab0 * t_ab, q)          # edge AB
            q = jnp.where(m_c, c0, q)                        # vertex C
            q = jnp.where(m_b, b0, q)                        # vertex B
            return jnp.where(m_a, a0, q)                     # vertex A

        qx = coord(ax, bx, cx, abx, acx)
        qy = coord(ay, by, cy, aby, acy)
        qz = coord(az, bz, cz, abz, acz)
        d2_ = (px - qx) ** 2 + (py - qy) ** 2 + (pz - qz) ** 2  # (8, 128)
        out_ref[0] = jnp.minimum(out_ref[0],
                                 jnp.min(d2_, axis=0, keepdims=True))

    def process_supertile(s):
        base = s * (SUPER // 8)

        def body(g, _):
            eval_group(base + g)
            return 0

        jax.lax.fori_loop(0, SUPER // 8, body, 0)

    process_supertile(best_s)

    def sup_body(s, cur):
        @pl.when((s != best_s) & (db_scr[s] < cur))
        def _():
            process_supertile(s)

        return jnp.sqrt(jnp.max(out_ref[0]))

    jax.lax.fori_loop(0, n_sup, sup_body, jnp.sqrt(jnp.max(out_ref[0])))


@functools.partial(jax.jit, static_argnames=("interpret",))
def min_point_triangle_dist2(points_blocked, tri_data, sup_data, *,
                             interpret: bool = False):
    """(P,) min SQUARED distance from each point to the triangle set.

    points_blocked: (P, 3) f32, P a multiple of 128, ordered so that each
        consecutive 128 points are spatially compact (the pruning bound is
        the block's bounding-sphere half-diagonal — a spatially random order
        is still correct, just slower).
    tri_data, sup_data: from ``pack_triangles``.
    """
    p = points_blocked.shape[0]
    assert p % BLOCK_POINTS == 0, p
    coords = points_blocked.reshape(p // 128, 1, 128, 3)
    px = coords[..., 0]
    py = coords[..., 1]
    pz = coords[..., 2]

    if _VMEM is not None and not interpret:
        spec = lambda shape, imap=None: pl.BlockSpec(
            shape, imap, memory_space=_VMEM)
    else:  # interpret mode (CPU tests)
        spec = lambda shape, imap=None: pl.BlockSpec(shape, imap)
    scratch = [] if pltpu is None else [
        pltpu.SMEM((sup_data.shape[0],), jnp.float32)]

    out = pl.pallas_call(
        _ptd_kernel,
        grid=(p // BLOCK_POINTS,),
        in_specs=[
            spec((1, 1, 128), lambda i: (i, 0, 0)),
            spec((1, 1, 128), lambda i: (i, 0, 0)),
            spec((1, 1, 128), lambda i: (i, 0, 0)),
            spec(tri_data.shape, lambda i: (0, 0)),
            spec(sup_data.shape, lambda i: (0, 0)),
        ],
        out_specs=spec((1, 1, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((p // 128, 1, 128), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(px, py, pz, tri_data, sup_data)
    return out.reshape(-1)


def blocked_grid(dim_x: int, dim_y: int, dim_z: int, origin, res,
                 block=(4, 4, 8)):
    """Grid points of a (dim_x, dim_y, dim_z) lattice in spatially-blocked
    order (each 128 consecutive points = one (4,4,8) cell block), plus the
    inverse mapping.

    Returns (points (P, 3) f32 with P % 128 == 0, unblock) where
    ``unblock(flat)`` maps the kernel's (P,) output back to a numpy array of
    shape (dim_x, dim_y, dim_z).
    """
    bx, by, bz = block
    nx = -(-dim_x // bx) * bx
    ny = -(-dim_y // by) * by
    nz = -(-dim_z // bz) * bz
    ii, jj, kk = np.meshgrid(np.arange(nx, dtype=np.float32),
                             np.arange(ny, dtype=np.float32),
                             np.arange(nz, dtype=np.float32), indexing="ij")
    pts = np.asarray(origin, np.float32) + np.float32(res) * np.stack(
        [ii, jj, kk], axis=-1)
    blocked = pts.reshape(nx // bx, bx, ny // by, by, nz // bz, bz, 3)
    blocked = blocked.transpose(0, 2, 4, 1, 3, 5, 6).reshape(-1, 3)

    def unblock(flat):
        a = np.asarray(flat).reshape(nx // bx, ny // by, nz // bz, bx, by, bz)
        a = a.transpose(0, 3, 1, 4, 2, 5).reshape(nx, ny, nz)
        return a[:dim_x, :dim_y, :dim_z]

    return np.ascontiguousarray(blocked), unblock


def unsigned_distance_pallas(points, tri_v_np, *, interpret: bool = False):
    """Convenience wrapper: (P, 3) numpy points (any order — spatially
    blocked order makes the pruning effective) -> (P,) unsigned distances."""
    pts = np.asarray(points, np.float32)
    p = pts.shape[0]
    pad = (-p) % BLOCK_POINTS
    if pad:
        pts = np.concatenate(
            [pts, np.full((pad, 3), _FAR, np.float32)], axis=0)
    tri_data, sup_data = pack_triangles(tri_v_np)
    d2 = min_point_triangle_dist2(
        jnp.asarray(pts), jnp.asarray(tri_data), jnp.asarray(sup_data),
        interpret=interpret)
    return np.sqrt(np.maximum(np.asarray(d2)[:p], 0.0))
