"""Pallas TPU kernel: GPG shifted-box panel counts (the online sampler's
hot loop).

``grasping/samplers.gpg_sample_candidates`` (the GpgGraspSamplerPcl
replacement, reference: dex-net/src/dexnet/grasping/grasp_sampler.py:
1389-1656) tests, for every (seed, theta) grasp frame, ~47 shifted
placements of the 4 gripper panel boxes [open, bottom, left, right]
against the scene cloud: 21 dy offsets along the binormal, ~25 approach
steps along the normal, and one final check. The best XLA formulation
(one rotation per frame + factored shifted-bounds masks) runs this at
~24 ms for 150 seeds x 19 thetas x 20k points, fetch-amortized, and is
essentially VPU-bound — measured, not assumed.

This kernel computes a whole scan's counts in one VMEM-resident pass
(~12 ms for all three scans at the same scale, ~1.2x end to end with the
glue — and unlike XLA it can SKIP far point tiles, which grows the win on
spatially spread scenes):

- FRAMES LIVE ON THE LANE AXIS. Each (frame-block, tile) invocation
  rotates a (T, 4) homogeneous point tile into BF=128 frames with ONE MXU
  matmul — (T, 4) @ (4, 3*BF) -> [px | py | pz] as (T, BF) panes — so the
  per-frame offset (rot . seed, plus the scan's fixed-axis shift) rides in
  the matmul's constant row and every subsequent compare/AND/reduce is a
  lane-aligned VPU op. (A frames-on-sublanes layout needs (BF,1) x (1,T)
  outer-product broadcasts, which Mosaic lowers ~10x slower — measured.)
- a scan varies exactly one frame axis (dy scan -> y, approach scan -> x),
  so each shift costs one lane-broadcast subtract, two compares against
  STATIC box constants, an AND with the per-panel base mask, and a
  sublane-reduction; box bounds are Python floats (the gripper is a
  static argument) folded into the compare immediates;
- counts accumulate across cloud tiles in the revisited (NS4, BF) output
  block.

Numerics: the kernel computes frame coordinates as ``r.p - (r.seed +
fix)`` (the jnp path uses the same association so interpret-mode parity
is exact); points within one float ulp of a box bound may still classify
differently from a host-double oracle, which the reference itself (host
numpy, float64) does not guarantee either.

Used by ``grasping.samplers.gpg_sample_candidates`` on TPU; the jnp path
remains for CPU and as the parity oracle (tests/test_gpg_counts_pallas.py).
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

BLOCK_FRAMES = 128       # frames per program (lane axis)
BLOCK_POINTS = 2048      # cloud points per tile (sublane axis)
_FAR = -1.0e6            # cloud padding sentinel (outside every panel box)


def _kernel(pts_ref, w_ref, scan_ref, sph_ref, out_ref, *, ns, scan_is_y,
            boxes):
    t = pl.program_id(1)
    bf = BLOCK_FRAMES

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # tile pruning (the part XLA cannot express): skip this point tile if
    # its bounding box cannot reach the frame block's reach sphere (seed
    # bounding sphere + max shifted-box extent, precomputed by the wrapper).
    # Sentinel pad points (x == _FAR) are excluded from the bbox.
    xs = pts_ref[:, 0:1]
    ys = pts_ref[:, 1:2]
    zs = pts_ref[:, 2:3]
    real = xs > _FAR * 0.5
    big = jnp.float32(-_FAR)
    lox = jnp.min(jnp.where(real, xs, big))
    hix = jnp.max(jnp.where(real, xs, -big))
    loy = jnp.min(jnp.where(real, ys, big))
    hiy = jnp.max(jnp.where(real, ys, -big))
    loz = jnp.min(jnp.where(real, zs, big))
    hiz = jnp.max(jnp.where(real, zs, -big))
    fb = pl.program_id(0)
    scx, scy, scz, sr = (sph_ref[fb, 0], sph_ref[fb, 1], sph_ref[fb, 2],
                         sph_ref[fb, 3])
    dx = jnp.maximum(jnp.maximum(lox - scx, scx - hix), 0.0)
    dy = jnp.maximum(jnp.maximum(loy - scy, scy - hiy), 0.0)
    dz = jnp.maximum(jnp.maximum(loz - scz, scz - hiz), 0.0)
    near = dx * dx + dy * dy + dz * dz <= sr * sr

    @pl.when(near)
    def _():
        # ONE matmul rotates the tile into all BF frames: (T, 4) @
        # (4, 3*BF). Column layout per block: [px lanes | py lanes |
        # pz lanes]; the constant row of pts (all ones) picks up
        # -(rot.seed + fixed shift). HIGHEST precision: default TPU matmul
        # takes bf16 passes, whose ~1e-3 relative coordinate error would
        # misclassify points near box bounds.
        pxyz = jnp.dot(pts_ref[:], w_ref[:],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)  # (T, 3*BF)
        px = pxyz[:, 0 * bf:1 * bf]
        py = pxyz[:, 1 * bf:2 * bf]
        pz = pxyz[:, 2 * bf:3 * bf]

        scanned = py if scan_is_y else px

        rows = [None] * (ns * 4)
        for k in range(4):
            (lx, hx), (ly, hy), (lz, hz) = boxes[k]
            base = (pz > lz) & (pz < hz)
            if scan_is_y:
                base &= (px > lx) & (px < hx)
                lo_s, hi_s = ly, hy
            else:
                base &= (py > ly) & (py < hy)
                lo_s, hi_s = lx, hx
            for n in range(ns):
                sv = scan_ref[n:n + 1, :]                 # (1, BF)
                c = scanned - sv                          # lane-aligned bcast
                m = base & (c > lo_s) & (c < hi_s)
                rows[n * 4 + k] = jnp.sum(m.astype(jnp.float32), axis=0,
                                          keepdims=True)  # (1, BF)
        total = jnp.concatenate(rows, axis=0)             # (ns*4, BF)
        out_ref[0:ns * 4, :] = out_ref[0:ns * 4, :] + total


@functools.partial(jax.jit, static_argnames=("ns", "scan_is_y", "boxes",
                                             "interpret"))
def _counts_pallas(pts4, w, scan, spheres, *, ns, scan_is_y, boxes,
                   interpret=False):
    p_pad = pts4.shape[0]
    nf = w.shape[1] // (3 * BLOCK_FRAMES)
    ns_pad = scan.shape[0]
    ns4_pad = -(-(ns * 4) // 8) * 8
    kern = functools.partial(_kernel, ns=ns, scan_is_y=scan_is_y,
                             boxes=boxes)
    if _VMEM is not None and not interpret:
        spec = lambda shape, imap: pl.BlockSpec(shape, imap,
                                                memory_space=_VMEM)
        # per-fblock sphere scalars live in SMEM, whole array (tiny; the
        # tiling rules reject sub-blocks that are not 8x128-tileable) —
        # the kernel indexes its row with program_id(0)
        sph_spec = pl.BlockSpec(spheres.shape, lambda f, t: (0, 0),
                                memory_space=pltpu.SMEM)
    else:  # interpret mode (CPU tests)
        spec = lambda shape, imap: pl.BlockSpec(shape, imap)
        sph_spec = pl.BlockSpec(spheres.shape, lambda f, t: (0, 0))
    out = pl.pallas_call(
        kern,
        grid=(nf, p_pad // BLOCK_POINTS),
        in_specs=[
            spec((BLOCK_POINTS, 4), lambda f, t: (t, 0)),
            spec((4, 3 * BLOCK_FRAMES), lambda f, t: (0, f)),
            spec((ns_pad, BLOCK_FRAMES), lambda f, t: (0, f)),
            sph_spec,
        ],
        out_specs=spec((ns4_pad, BLOCK_FRAMES), lambda f, t: (0, f)),
        out_shape=jax.ShapeDtypeStruct((ns4_pad, nf * BLOCK_FRAMES),
                                       jnp.float32),
        interpret=interpret,
    )(pts4, w, scan, spheres)
    return out


class GpgScanContext:
    """Shared per-(cloud, frames) preparation for the scan kernel.

    The sampler runs THREE scans (dy, approach, final) over the same cloud
    and frames; the padded homogeneous cloud, the rotation part of the
    weight matrix, and the seed bounding spheres only depend on
    (points, seeds, rot_rows) and are built once here. ``counts`` adds the
    per-scan offsets and calls the kernel. All jnp — usable inside jit.

    ``active``: optional (F,) bool — frames whose counts the caller will
    ignore (scan-independent validity already failed: below-table seeds,
    degenerate covariance, the hoisted downward guard). Blocks with NO
    active frame get a far/zero-radius pruning sphere, so the kernel skips
    every cloud tile for them — with the sampler's compaction permutation
    (actives packed into the leading blocks) this removes the scan work
    for the ~96% of (seed, theta) frames the downward guard rejects.
    Sphere bounds also tighten to active seeds only; inactive frames in a
    mixed block may therefore return 0 instead of real counts — they are
    don't-cares by contract.
    """

    def __init__(self, points, seeds, rot_rows, boxes, active=None):
        points = jnp.asarray(points, jnp.float32)
        self.p_total = points.shape[0]
        self.f = seeds.shape[0]
        bf = BLOCK_FRAMES

        boxes_np = np.asarray(boxes, np.float32)
        self.boxes_t = tuple(
            tuple((float(boxes_np[k, 0, a]), float(boxes_np[k, 1, a]))
                  for a in range(3))
            for k in range(4)
        )
        self.corner = float(np.max(np.linalg.norm(
            np.abs(boxes_np).reshape(-1, 3), axis=-1)))

        p_pad = max(-(-self.p_total // BLOCK_POINTS) * BLOCK_POINTS,
                    BLOCK_POINTS)
        pts4 = jnp.full((p_pad, 4), _FAR, jnp.float32)
        pts4 = pts4.at[:self.p_total, :3].set(points)
        self.pts4 = pts4.at[:, 3].set(1.0)

        self.f_pad = max(-(-self.f // bf) * bf, bf)
        self.nf = nf = self.f_pad // bf
        rr = jnp.zeros((self.f_pad, 3, 3), jnp.float32)
        rr = rr.at[:self.f].set(jnp.asarray(rot_rows, jnp.float32))
        sd = jnp.zeros((self.f_pad, 3), jnp.float32)
        sd = sd.at[:self.f].set(jnp.asarray(seeds, jnp.float32))

        # weight columns: for frame j, axis a: [r_a0, r_a1, r_a2,
        # -(r_a . seed [- per-scan fixed shift])]; stored in the kernel's
        # (4, nf, 3, BF) pane layout so per-scan work is one .at[].add
        off = jnp.einsum("fab,fb->fa", rr, sd)           # (F, 3) r_a . seed
        w = jnp.concatenate([rr, -off[:, :, None]], axis=2)  # (F, 3, 4)
        self.w_base = w.reshape(nf, bf, 3, 4).transpose(3, 0, 2, 1)

        # per-fblock seed bounding spheres (tile pruning); the per-scan
        # reach is added in counts(). Pad-only blocks sit far away with
        # zero radius: always skipped, counts discarded by [:f] anyway.
        sdg = sd.reshape(nf, bf, 3)
        is_real = (jnp.arange(self.f_pad) < self.f).reshape(nf, bf)
        if active is not None:
            act = jnp.zeros((self.f_pad,), bool).at[:self.f].set(
                jnp.asarray(active, bool))
            is_real = is_real & act.reshape(nf, bf)
        big = jnp.float32(1e9)
        lo = jnp.min(jnp.where(is_real[..., None], sdg, big), axis=1)
        hi = jnp.max(jnp.where(is_real[..., None], sdg, -big), axis=1)
        any_real = jnp.any(is_real, axis=1)
        self.ctr = jnp.where(any_real[:, None], 0.5 * (lo + hi), 1e8)
        self.seed_r = jnp.max(jnp.where(
            is_real, jnp.linalg.norm(sdg - self.ctr[:, None, :], axis=-1),
            0.0), axis=1)                                          # (nf,)
        self.any_real = any_real

    def counts(self, fixed_shift, scan_shifts, *, scan_is_y: bool,
               interpret: bool = False):
        """Panel counts (F, Ns, 4) int32 for every (frame, shift) — see
        ``gpg_scan_counts_pallas``."""
        bf = BLOCK_FRAMES
        ns = scan_shifts.shape[1]
        fx = jnp.zeros((self.f_pad,), jnp.float32)
        fx = fx.at[:self.f].set(jnp.asarray(fixed_shift, jnp.float32))
        fixed_axis = 0 if scan_is_y else 1
        w = self.w_base.at[3, :, fixed_axis, :].add(
            -fx.reshape(self.nf, bf))
        w = w.reshape(4, self.nf * 3 * bf)

        ns_pad = -(-ns // 8) * 8
        sc = jnp.zeros((ns_pad, self.f_pad), jnp.float32)
        sc = sc.at[:ns, :self.f].set(
            jnp.asarray(scan_shifts, jnp.float32).T)

        reach = (jnp.max(jnp.abs(fx)) + jnp.max(jnp.abs(sc))
                 + jnp.float32(self.corner))
        rad = jnp.where(self.any_real, self.seed_r + reach, 0.0)
        spheres = jnp.zeros((self.nf, 8), jnp.float32)
        spheres = spheres.at[:, 0:3].set(self.ctr)
        spheres = spheres.at[:, 3].set(rad)

        out = _counts_pallas(self.pts4, w, sc, spheres, ns=ns,
                             scan_is_y=scan_is_y, boxes=self.boxes_t,
                             interpret=interpret)
        return out[:ns * 4, :self.f].T.reshape(self.f, ns, 4).astype(
            jnp.int32)


def gpg_scan_counts_pallas(points, seeds, rot_rows, fixed_shift, scan_shifts,
                           boxes, *, scan_is_y: bool, interpret: bool = False):
    """Panel counts for every (frame, shift): the GPG scan primitive.

    points: (P, 3) scene cloud. seeds: (F, 3) frame origins (bottom centers
    before shifting). rot_rows: (F, 3, 3) rows [normal, major, minor].
    fixed_shift: (F,) shift applied to the non-scanned in-frame axis
    (x when scan_is_y, else y). scan_shifts: (F, Ns) per-frame shifts of
    the scanned axis. boxes: (4, 2, 3) panel [lo, hi] bounds as a STATIC
    numpy array (folds into compare constants).

    Returns counts (F, Ns, 4) int32 in panel order [open, bottom, left,
    right]: the number of cloud points strictly inside panel k's box with
    the frame origin moved by (shift on scanned axis, fixed on the other).
    """
    ctx = GpgScanContext(points, seeds, rot_rows, boxes)
    return ctx.counts(fixed_shift, scan_shifts, scan_is_y=scan_is_y,
                      interpret=interpret)


def gpg_scan_counts_jnp(points, seeds, rot_rows, fixed_shift, scan_shifts,
                        boxes, *, scan_is_y: bool, frame_chunk: int = 128):
    """Pure-JAX reference with the kernel's algebra (fixed shift folded
    into the frame offset), chunked over frames so (chunk, P) masks bound
    peak memory. CPU path + interpret-mode oracle."""
    points = jnp.asarray(points, jnp.float32)
    boxes = jnp.asarray(boxes, jnp.float32)
    x, y, z = points[:, 0], points[:, 1], points[:, 2]    # (P,)
    f = seeds.shape[0]
    ns = scan_shifts.shape[1]
    fixed_axis = 0 if scan_is_y else 1

    chunk = max(1, min(frame_chunk, f))
    pad = (-f) % chunk

    def padc(a):
        return jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:],
                                             a.dtype)]) if pad else a

    def one_chunk(args):
        sd, rr, fx, sc = args                             # (C, ...)
        off = jnp.einsum("fab,fb->fa", rr, sd)            # (C, 3)
        off = off.at[:, fixed_axis].add(fx)

        def axis_coord(i):
            return (rr[:, i, 0, None] * x[None] + rr[:, i, 1, None] * y[None]
                    + rr[:, i, 2, None] * z[None] - off[:, i, None])

        px, py, pz = axis_coord(0), axis_coord(1), axis_coord(2)  # (C, P)
        scanned = py if scan_is_y else px
        counts = []
        for k in range(4):
            lo, hi = boxes[k, 0], boxes[k, 1]
            base = (pz > lo[2]) & (pz < hi[2])
            if scan_is_y:
                base &= (px > lo[0]) & (px < hi[0])
                lo_s, hi_s = lo[1], hi[1]
            else:
                base &= (py > lo[1]) & (py < hi[1])
                lo_s, hi_s = lo[0], hi[0]

            def one_shift(sv, base=base, lo_s=lo_s, hi_s=hi_s):
                c = scanned - sv[:, None]
                return jnp.sum(base & (c > lo_s) & (c < hi_s), axis=1)

            counts.append(jax.vmap(one_shift, in_axes=1, out_axes=1)(sc))
        return jnp.stack(counts, axis=-1)                 # (C, Ns, 4)

    out = jax.lax.map(one_chunk, (
        padc(jnp.asarray(seeds, jnp.float32)).reshape(-1, chunk, 3),
        padc(jnp.asarray(rot_rows, jnp.float32)).reshape(-1, chunk, 3, 3),
        padc(jnp.asarray(fixed_shift, jnp.float32)).reshape(-1, chunk),
        padc(jnp.asarray(scan_shifts, jnp.float32)).reshape(-1, chunk, ns)))
    return out.reshape(-1, ns, 4)[:f].astype(jnp.int32)


# (no module-level dispatcher on purpose: the one consumer —
# grasping/samplers.frames_block — must reuse ONE GpgScanContext across its
# three scans, which a stateless dispatch function would rebuild 3x)
