"""Parity tests for the GPG shifted-box-count Pallas kernel.

The kernel (ops/gpg_counts_pallas.py) computes, for every grasp frame and
every shift of a one-axis scan, the number of cloud points strictly inside
each of the 4 gripper panel boxes — the hot loop of the online GPG sampler
(reference: dex-net/src/dexnet/grasping/grasp_sampler.py:1539-1614).
Oracle: the chunked jnp path with identical algebra (exact match expected —
both compute r.p - r.seed in f32), plus an independent numpy float64
membership check with boundary-point slack.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pointnetgpd_tpu.ops.gpg_counts_pallas import (
    GpgScanContext,
    gpg_scan_counts_jnp,
    gpg_scan_counts_pallas,
)

BOXES = np.array(
    [[[-0.02, -0.04, -0.01], [0.02, 0.04, 0.01]],     # open
     [[-0.03, -0.04, -0.01], [-0.02, 0.04, 0.01]],    # bottom
     [[-0.02, -0.05, -0.01], [0.02, -0.04, 0.01]],    # left
     [[-0.02, 0.04, -0.01], [0.02, 0.05, 0.01]]],     # right
    np.float32)


def _random_case(seed, p=3000, f=37, ns=13):
    rs = np.random.RandomState(seed)
    pts = rs.rand(p, 3).astype(np.float32) * 0.2 - 0.1
    seeds = pts[rs.choice(p, f)]
    q = rs.randn(f, 3, 3).astype(np.float32)
    u, _, vt = np.linalg.svd(q)
    rots = np.ascontiguousarray((u @ vt).astype(np.float32))
    fixed = (rs.rand(f).astype(np.float32) - 0.5) * 0.02
    scan = (rs.rand(f, ns).astype(np.float32) - 0.5) * 0.06
    return pts, seeds, rots, fixed, scan


class TestGpgScanCounts:
    @pytest.mark.parametrize("scan_is_y", [True, False])
    def test_kernel_matches_jnp_oracle(self, scan_is_y):
        pts, seeds, rots, fixed, scan = _random_case(0)
        a = np.asarray(gpg_scan_counts_pallas(
            pts, seeds, rots, fixed, scan, BOXES, scan_is_y=scan_is_y,
            interpret=True))
        b = np.asarray(gpg_scan_counts_jnp(
            pts, seeds, rots, fixed, scan, BOXES, scan_is_y=scan_is_y))
        np.testing.assert_array_equal(a, b)
        assert b.sum() > 0  # case is non-degenerate

    @pytest.mark.parametrize("scan_is_y", [True, False])
    def test_active_mask_preserves_active_counts(self, scan_is_y):
        """A context with an ``active`` mask must return the SAME counts as
        the unmasked context for every active frame (inactive frames are
        don't-cares by contract); a 256-frame case exercises block-level
        skipping (2 blocks, one fully inactive after compaction-like
        ordering)."""
        pts, seeds, rots, fixed, scan = _random_case(3, f=256)
        rs = np.random.RandomState(7)
        active = np.zeros(256, bool)
        active[:19] = True                # leading block partially active
        full = GpgScanContext(pts, seeds, rots, BOXES)
        masked = GpgScanContext(pts, seeds, rots, BOXES,
                                active=jnp.asarray(active))
        a = np.asarray(full.counts(fixed, scan, scan_is_y=scan_is_y,
                                   interpret=True))
        b = np.asarray(masked.counts(fixed, scan, scan_is_y=scan_is_y,
                                     interpret=True))
        np.testing.assert_array_equal(a[active], b[active])
        assert a[active].sum() > 0
        # the fully-inactive trailing block was skipped: zero counts
        assert b[128:].sum() == 0

    def test_matches_f64_membership(self):
        """Independent oracle: double-precision box membership per frame."""
        pts, seeds, rots, fixed, scan = _random_case(1, p=800, f=5, ns=4)
        got = np.asarray(gpg_scan_counts_jnp(
            pts, seeds, rots, fixed, scan, BOXES, scan_is_y=True))
        p64 = pts.astype(np.float64)
        for fi in range(5):
            pf = (p64 - seeds[fi].astype(np.float64)) @ rots[fi].T.astype(
                np.float64)
            for n in range(4):
                for k in range(4):
                    lo = BOXES[k, 0].astype(np.float64).copy()
                    hi = BOXES[k, 1].astype(np.float64).copy()
                    lo[0] += fixed[fi]
                    hi[0] += fixed[fi]
                    lo[1] += scan[fi, n]
                    hi[1] += scan[fi, n]
                    want = int(np.sum(np.all((pf > lo) & (pf < hi), axis=1)))
                    # f32 vs f64 rounding may flip points on the boundary
                    assert abs(int(got[fi, n, k]) - want) <= 2

    def test_padding_frames_and_points(self):
        """Non-multiple frame/point counts: padded rows don't leak counts."""
        pts, seeds, rots, fixed, scan = _random_case(2, p=257, f=3, ns=2)
        a = np.asarray(gpg_scan_counts_pallas(
            pts, seeds, rots, fixed, scan, BOXES, scan_is_y=False,
            interpret=True))
        b = np.asarray(gpg_scan_counts_jnp(
            pts, seeds, rots, fixed, scan, BOXES, scan_is_y=False))
        assert a.shape == (3, 2, 4)
        np.testing.assert_array_equal(a, b)

    def test_tile_pruning_exact_on_sparse_scene(self):
        """Clustered seeds + a mostly-far cloud: pruned tiles must not
        change counts (the reach-sphere bound is conservative)."""
        rs = np.random.RandomState(3)
        near = rs.rand(4096, 3).astype(np.float32) * 0.2 - 0.1
        far = rs.rand(4096, 3).astype(np.float32) * 0.2 + 5.0
        pts = np.concatenate([near, far])
        f = 9
        seeds = near[rs.choice(len(near), f)]
        q = rs.randn(f, 3, 3).astype(np.float32)
        u, _, vt = np.linalg.svd(q)
        rots = np.ascontiguousarray((u @ vt).astype(np.float32))
        fixed = (rs.rand(f).astype(np.float32) - 0.5) * 0.02
        scan = (rs.rand(f, 5).astype(np.float32) - 0.5) * 0.06
        a = np.asarray(gpg_scan_counts_pallas(
            pts, seeds, rots, fixed, scan, BOXES, scan_is_y=True,
            interpret=True))
        b = np.asarray(gpg_scan_counts_jnp(
            pts, seeds, rots, fixed, scan, BOXES, scan_is_y=True))
        np.testing.assert_array_equal(a, b)
        assert b.sum() > 0

    def test_empty_region_counts_zero(self):
        pts = np.full((100, 3), 5.0, np.float32)  # far from every box
        seeds = np.zeros((2, 3), np.float32)
        rots = np.broadcast_to(np.eye(3, dtype=np.float32),
                               (2, 3, 3)).copy()
        out = np.asarray(gpg_scan_counts_jnp(
            pts, seeds, rots, np.zeros(2, np.float32),
            np.zeros((2, 3), np.float32), BOXES, scan_is_y=True))
        assert (out == 0).all()
