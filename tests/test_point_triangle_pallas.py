"""Pallas point-triangle distance kernel vs the XLA oracle (interpret mode).

The kernel is the TPU production path of ops/mesh_to_sdf.mesh_to_sdf's
distance pass; on CPU these tests run it through the Pallas interpreter on
small shapes and compare against ops/mesh_to_sdf._unsigned_distance.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pointnetgpd_tpu.ops.mesh_to_sdf import _unsigned_distance
from pointnetgpd_tpu.ops.point_triangle_pallas import (
    BLOCK_POINTS,
    blocked_grid,
    min_point_triangle_dist2,
    morton_order,
    pack_triangles,
    unsigned_distance_pallas,
)


class TestPackTriangles:
    def test_padding_is_far(self):
        tv = np.random.RandomState(0).rand(5, 3, 3).astype(np.float32)
        data, sup = pack_triangles(tv)
        assert data.shape[0] % 128 == 0
        assert (data[5:, 0:9] >= 1e7).all()
        # real supertile sphere encloses all real vertices
        sc, sr = sup[0, 0:3], sup[0, 3]
        d = np.linalg.norm(tv.reshape(-1, 3) - sc, axis=1)
        assert (d <= sr + 1e-5).all()

    def test_morton_is_permutation(self):
        c = np.random.RandomState(1).rand(257, 3)
        o = morton_order(c)
        assert sorted(o.tolist()) == list(range(257))


class TestBlockedGrid:
    def test_unblock_roundtrip(self):
        pts, unblock = blocked_grid(10, 9, 17, origin=[1.0, 2.0, 3.0],
                                    res=0.5)
        assert pts.shape[0] % BLOCK_POINTS == 0
        # the flattened x coordinate unblocks to the meshgrid x
        x = unblock(pts[:, 0])
        ii = 1.0 + 0.5 * np.arange(10, dtype=np.float32)
        np.testing.assert_allclose(x, np.broadcast_to(
            ii[:, None, None], (10, 9, 17)))
        # each 128-point block is spatially compact
        blk = pts.reshape(-1, BLOCK_POINTS, 3)
        span = blk.max(axis=1) - blk.min(axis=1)
        assert (span < 0.5 * np.array([4, 4, 8]) + 1e-6).all()


@pytest.mark.slow
class TestKernelParity:
    def test_random_points_vs_oracle(self):
        rs = np.random.RandomState(0)
        pts = (rs.rand(256, 3).astype(np.float32) - 0.5) * 0.2
        tv = (rs.rand(37, 3, 3).astype(np.float32) - 0.5) * 0.1
        d_ref = np.asarray(
            _unsigned_distance(jnp.asarray(pts), jnp.asarray(tv)))
        d_pal = unsigned_distance_pallas(pts, tv, interpret=True)
        rel = np.abs(d_pal - d_ref) / np.maximum(d_ref, 1e-6)
        assert rel.max() < 1e-4

    def test_blocked_grid_path(self):
        """The exact shape mesh_to_sdf uses: blocked grid + pack + unblock."""
        rs = np.random.RandomState(1)
        tv = (rs.rand(9, 3, 3).astype(np.float32) - 0.5) * 0.05
        pts, unblock = blocked_grid(4, 4, 8, origin=[-0.05] * 3, res=0.025)
        tri_data, sup_data = pack_triangles(tv)
        d2 = min_point_triangle_dist2(
            jnp.asarray(pts), jnp.asarray(tri_data), jnp.asarray(sup_data),
            interpret=True)
        d_pal = unblock(np.sqrt(np.maximum(np.asarray(d2), 0.0)))
        d_ref = np.asarray(_unsigned_distance(
            jnp.asarray(pts), jnp.asarray(tv)))
        d_ref = unblock(d_ref)
        np.testing.assert_allclose(d_pal, d_ref, rtol=1e-4, atol=1e-7)
