"""Cloud-op tests: voxel downsampling invariants, KNN normals on analytic
surfaces, and GPD projection parity vs the reference cal_projection
(reference: PointNetGPD/model/dataset.py:142-198 as oracle; the numba
VoxelGrid oracle is unavailable — numba is not installed — so downsampling is
tested on invariants instead)."""

import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pointnetgpd_tpu.ops.cloud import (
    estimate_normals_knn,
    seed_window_normals,
    voxel_downsample,
)
from pointnetgpd_tpu.ops.projection import gpd_projection_features, project_to_image

from conftest import REFERENCE_ROOT, requires_reference


class TestVoxelDownsample:
    def test_dedupes_dense_cloud(self):
        rng = np.random.RandomState(0)
        # many duplicated points in few voxels
        base = rng.rand(32, 3).astype(np.float32)
        pts = np.repeat(base, 50, axis=0)
        centers, mask = voxel_downsample(jnp.asarray(pts), n_grid=100)
        kept = np.asarray(centers)[np.asarray(mask)]
        assert len(kept) <= 32 * 2  # at most a couple voxels per base point
        # each kept center is inside the cloud bbox
        assert (kept >= pts.min(0) - 1e-5).all() and (kept <= pts.max(0) + 1e-5).all()

    def test_preserves_sparse_cloud(self):
        rng = np.random.RandomState(1)
        pts = rng.rand(200, 3).astype(np.float32)
        centers, mask = voxel_downsample(jnp.asarray(pts), n_grid=500)
        # at 500^3 resolution nearly all random points are unique voxels
        assert int(np.asarray(mask).sum()) >= 195
        # centers within half a voxel of their source points
        step = (pts.max(0) - pts.min(0)) / 500
        kept_rows = np.asarray(mask)
        d = np.abs(np.asarray(centers)[kept_rows] - pts[kept_rows])
        assert (d <= step / 2 + 1e-6).all()


class TestVoxelDownsamplePacked:
    def test_packed_matches_masked(self):
        from pointnetgpd_tpu.ops.cloud import (
            voxel_downsample,
            voxel_downsample_packed,
        )

        rng = np.random.RandomState(0)
        pts = jnp.asarray((rng.rand(3000, 3) * 0.2).astype(np.float32))
        centers, mask = voxel_downsample(pts, n_grid=24)
        packed, count = voxel_downsample_packed(pts, n_grid=24)
        want = np.asarray(centers)[np.asarray(mask)]
        assert int(count) == len(want)
        got = np.asarray(packed)[: int(count)]
        # same voxel centers, original relative order preserved
        np.testing.assert_allclose(got, want, atol=0)
        # sentinel tail
        assert (np.asarray(packed)[int(count):] == -1e6).all()

    def test_empty(self):
        from pointnetgpd_tpu.ops.cloud import voxel_downsample_packed

        packed, count = voxel_downsample_packed(jnp.zeros((0, 3)))
        assert packed.shape == (0, 3) and int(count) == 0


class TestSmallestEigvec3x3:
    def test_matches_eigh_on_random_covariances(self):
        from pointnetgpd_tpu.ops.cloud import smallest_eigvec_sym3x3

        rng = np.random.RandomState(0)
        x = rng.randn(200, 12, 3) * rng.rand(200, 1, 3)  # anisotropic
        cov = np.einsum("bki,bkj->bij", x - x.mean(1, keepdims=True),
                        x - x.mean(1, keepdims=True))
        v = np.asarray(smallest_eigvec_sym3x3(jnp.asarray(cov)))
        w, vecs = np.linalg.eigh(cov)
        want = vecs[:, :, 0]
        # eigenvector up to sign; tolerance scales with the eigengap
        cos = np.abs(np.sum(v * want, axis=-1))
        gap = (w[:, 1] - w[:, 0]) / np.maximum(w[:, 2], 1e-30)
        assert cos[gap > 1e-3].min() > 1 - 1e-4
        np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0,
                                   atol=1e-6)

    def test_isotropic_falls_back(self):
        from pointnetgpd_tpu.ops.cloud import smallest_eigvec_sym3x3

        v = np.asarray(smallest_eigvec_sym3x3(jnp.stack(
            [jnp.eye(3), jnp.zeros((3, 3)), 2.0 * jnp.eye(3)])))
        assert np.isfinite(v).all()
        np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-6)

    def test_tiny_scale_conditioning(self):
        """Covariances of mm-scale clouds (entries ~1e-8) must not lose the
        eigenvector to fp32 underflow."""
        from pointnetgpd_tpu.ops.cloud import smallest_eigvec_sym3x3

        rng = np.random.RandomState(1)
        x = (rng.randn(50, 30, 3) * [1e-3, 1e-3, 1e-5]).astype(np.float32)
        cov = np.einsum("bki,bkj->bij", x, x)
        v = np.asarray(smallest_eigvec_sym3x3(jnp.asarray(cov)))
        cos = np.abs(v[:, 2])
        assert cos.min() > 0.99  # least variance along z


class TestKnnNormals:
    def test_plane_normals(self):
        rng = np.random.RandomState(2)
        pts = np.zeros((500, 3), np.float32)
        pts[:, :2] = rng.rand(500, 2)
        normals = np.asarray(estimate_normals_knn(
            jnp.asarray(pts), jnp.asarray([0.5, 0.5, 1.0]), k=15, chunk=256))
        # all normals ~ +z (flipped toward the camera above)
        assert normals[:, 2].min() > 0.99

    def test_sphere_normals_radial(self):
        rng = np.random.RandomState(3)
        v = rng.randn(800, 3).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts = 0.1 * v
        cam = np.array([0.0, 0.0, 10.0], np.float32)
        normals = np.asarray(estimate_normals_knn(
            jnp.asarray(pts), jnp.asarray(cam), k=12, chunk=256))
        cos = np.abs(np.sum(normals * v, axis=1))
        assert np.quantile(cos, 0.1) > 0.95  # radial up to sign
        # camera-consistent: normals on the top hemisphere point up
        top = v[:, 2] > 0.5
        assert normals[top, 2].min() > 0


class TestSeedWindowNormals:
    def _scene(self, n=12000, seed=4):
        """Two dense panels + a sphere patch, ~12k points."""
        rng = np.random.RandomState(seed)
        a = rng.rand(n // 3, 3).astype(np.float32) * [0.2, 0.2, 0]
        b = rng.rand(n // 3, 3).astype(np.float32) * [0.2, 0, 0.2] \
            + [0.3, 0, 0]
        v = rng.randn(n - 2 * (n // 3), 3).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        c = 0.08 * v + [0.15, 0.4, 0.1]
        return np.concatenate([a, b, c])

    def test_matches_dense_neighbor_normals(self):
        """Lazy per-seed windows must agree with the dense whole-cloud
        estimator on the seeds' neighbor normals and distances."""
        pts = jnp.asarray(self._scene())
        cam = jnp.asarray([0.2, 0.2, 1.5])
        rng = np.random.RandomState(0)
        seed_idx = jnp.asarray(rng.choice(pts.shape[0], 40, replace=False))
        pd2, nn, sn = seed_window_normals(pts, seed_idx, cam, k=15, knn=50,
                                          window=2048)
        dense = estimate_normals_knn(pts, cam, k=15)
        # dense oracle neighbors (exact, full cloud)
        seeds = pts[seed_idx]
        d2 = jnp.sum((seeds[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
        _, nbr = jax.lax.top_k(-d2, 50)
        # distances: sorted sets should match almost everywhere (window
        # boundary effects allowed on a small tail)
        a = np.sort(np.asarray(pd2), axis=1)
        b = np.sort(np.asarray(-jax.lax.top_k(-d2, 50)[0]), axis=1)
        close = np.isclose(a, b, rtol=1e-4, atol=1e-9)
        # window straddling truncates some 50-NN tails (the documented
        # Morton-window trade); the covariance frame downstream is what
        # must survive, tested via the normals agreement below and the
        # sampler-level test in test_samplers.py
        assert close.mean() > 0.7
        # neighbor normals: high cosine agreement with the dense estimator
        dn = np.asarray(dense[np.asarray(nbr)])          # (S, 50, 3)
        ln = np.asarray(nn)
        # compare where the neighbor SETS coincide: match by distance rank
        cos = np.abs(np.einsum("ski,ski->sk", dn, ln))
        assert np.quantile(cos, 0.1) > 0.9
        # seed normals ~ dense normals at the seeds
        cs = np.abs(np.einsum("si,si->s",
                              np.asarray(dense[np.asarray(seed_idx)]),
                              np.asarray(sn)))
        assert np.quantile(cs, 0.1) > 0.95

    def test_small_cloud_falls_back_dense(self):
        pts = jnp.asarray(self._scene(n=900))
        cam = jnp.asarray([0.2, 0.2, 1.5])
        seed_idx = jnp.asarray([3, 100, 700])
        pd2, nn, sn = seed_window_normals(pts, seed_idx, cam, k=12, knn=30,
                                          window=2048)
        dense = estimate_normals_knn(pts, cam, k=12)
        np.testing.assert_allclose(np.asarray(sn),
                                   np.asarray(dense[np.asarray(seed_idx)]),
                                   atol=1e-5)
        assert pd2.shape == (3, 30) and nn.shape == (3, 30, 3)
        # self-distance present (the seed is its own nearest neighbor)
        assert np.asarray(pd2).min(axis=1).max() < 1e-10

    def test_window_smaller_than_knn(self):
        """A window narrower than the requested neighbor count must clamp
        the selection (not crash top_k/approx_min_k) and pad the outputs
        back to the static knn width (regression: DetectorConfig
        (normal_window=64) with the default knn=100 killed process_frame)."""
        pts = jnp.asarray(self._scene(n=6000))
        cam = jnp.asarray([0.2, 0.2, 1.5])
        seed_idx = jnp.asarray([5, 2000, 4500])
        pd2, nn, sn = seed_window_normals(pts, seed_idx, cam, k=100, knn=100,
                                          window=64)
        assert pd2.shape == (3, 100) and nn.shape == (3, 100, 3)
        # the pad region carries a far sentinel distance so the sampler's
        # r-ball filter masks it (round-3 advisor: edge-duplicated pd2 could
        # weight the farthest real neighbor multiple times in the covariance
        # frame whenever it fell inside r_ball)
        assert np.asarray(pd2[:, 64:]).min() >= 1e9 - 1
        # real entries are still sane: seed is its own nearest neighbor and
        # normals are unit
        assert np.asarray(pd2).min(axis=1).max() < 1e-10
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(nn), axis=-1), 1.0, atol=1e-5)


@pytest.fixture(scope="module")
def ref_dataset_cls():
    import importlib.util
    import os
    import pickle
    import tempfile

    if "open3d" not in sys.modules:
        sys.modules["open3d"] = types.ModuleType("open3d")
    tmp = tempfile.mkdtemp()
    os.makedirs(f"{tmp}/PointNetGPD/data", exist_ok=True)
    with open(f"{tmp}/PointNetGPD/data/google2cloud.pkl", "wb") as f:
        pickle.dump({}, f)
    os.environ["PointNetGPD_FOLDER"] = tmp
    spec = importlib.util.spec_from_file_location(
        "_ref_dataset2", f"{REFERENCE_ROOT}/PointNetGPD/model/dataset.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    ds = mod.BaseGraspDataset()
    ds.voxel_point_num = 50
    ds.project_chann = 12
    ds.project_size = 60
    ds.projection_margin = 1
    return ds


@requires_reference
class TestProjectionParity:
    def _case(self, seed, n=400):
        rng = np.random.RandomState(seed)
        width = 0.085
        pts = (rng.rand(n, 3) - 0.5) * [width / 2, width, width / 2]
        normals = rng.randn(n, 3)
        normals /= np.linalg.norm(normals, axis=1, keepdims=True)
        return pts, normals, width

    @pytest.mark.parametrize("order", [(0, 1, 2), (1, 2, 0), (0, 2, 1)])
    def test_single_projection_matches_reference(self, ref_dataset_cls, order):
        pts, normals, width = self._case(4)
        ref_occ, ref_norm = ref_dataset_cls.cal_projection(
            pts, 60, 1, normals, np.asarray(order), width)
        occ, norm = project_to_image(
            jnp.asarray(pts), jnp.asarray(normals),
            jnp.ones(len(pts), bool), width, order)
        np.testing.assert_allclose(np.asarray(occ), ref_occ, atol=1e-5)
        np.testing.assert_allclose(np.asarray(norm), ref_norm, atol=1e-5)

    def test_full_12_channel_features(self, ref_dataset_cls):
        pts, normals, width = self._case(5)
        occ1, n1 = ref_dataset_cls.cal_projection(pts, 60, 1, normals,
                                                  np.asarray([0, 1, 2]), width)
        occ2, n2 = ref_dataset_cls.cal_projection(pts, 60, 1, normals,
                                                  np.asarray([1, 2, 0]), width)
        occ3, n3 = ref_dataset_cls.cal_projection(pts, 60, 1, normals,
                                                  np.asarray([0, 2, 1]), width)
        ref = np.dstack([occ1, n1, occ2, n2, occ3, n3])
        ours = gpd_projection_features(
            jnp.asarray(pts), jnp.asarray(normals), jnp.ones(len(pts), bool),
            width, project_chann=12)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    def test_3_channel(self, ref_dataset_cls):
        pts, normals, width = self._case(6)
        _, ref_norm = ref_dataset_cls.cal_projection(pts, 60, 1, normals,
                                                     np.asarray([0, 1, 2]), width)
        ours = gpd_projection_features(
            jnp.asarray(pts), jnp.asarray(normals), jnp.ones(len(pts), bool),
            width, project_chann=3)
        np.testing.assert_allclose(np.asarray(ours), ref_norm, atol=1e-5)

    def test_batched_vmap(self):
        rng = np.random.RandomState(7)
        pts = (rng.rand(4, 300, 3) - 0.5).astype(np.float32) * 0.08
        normals = rng.randn(4, 300, 3).astype(np.float32)
        normals /= np.linalg.norm(normals, axis=2, keepdims=True)
        valid = jnp.ones((4, 300), bool)
        out = jax.vmap(lambda p, n, v: gpd_projection_features(
            p, n, v, 0.085, project_chann=12))(jnp.asarray(pts),
                                               jnp.asarray(normals), valid)
        assert out.shape == (4, 60, 60, 12)
        assert np.isfinite(np.asarray(out)).all()


class TestDegenerateInputs:
    """Zero/tiny-input edges across the device ops (regression tests for the
    guards added after systematic empty-input probing)."""

    def test_voxel_downsample_empty(self):
        from pointnetgpd_tpu.ops.cloud import voxel_downsample

        centers, mask = voxel_downsample(jnp.zeros((0, 3)), 100)
        assert centers.shape == (0, 3) and mask.shape == (0,)

    def test_normals_fewer_points_than_k(self):
        from pointnetgpd_tpu.ops.cloud import estimate_normals_knn

        pts = jnp.asarray(np.random.RandomState(0).rand(2, 3))
        n = estimate_normals_knn(pts, jnp.asarray([0.0, 0, 1]), k=30)
        assert n.shape == (2, 3)
        assert np.isfinite(np.asarray(n)).all()
        assert estimate_normals_knn(jnp.zeros((0, 3)),
                                    jnp.asarray([0.0, 0, 1])).shape == (0, 3)

    def test_crop_empty_scene(self):
        from pointnetgpd_tpu.ops.crop import collect_candidate_clouds

        pts, counts, valid = collect_candidate_clouds(
            jnp.zeros((2, 3)), jnp.tile(jnp.asarray([1.0, 0, 0]), (2, 1)),
            jnp.tile(jnp.asarray([0.0, 1, 0]), (2, 1)),
            jnp.tile(jnp.asarray([0.0, 0, 1]), (2, 1)),
            jnp.zeros((0, 3)), jnp.float32(0.05), jnp.float32(0.08),
            jax.random.PRNGKey(0), num_out=16, min_point_limit=2)
        assert pts.shape == (2, 16, 3)
        assert not np.asarray(valid).any()

    def test_antipodal_on_surfaceless_sdf(self):
        from pointnetgpd_tpu.geometry.sdf import make_sdf
        from pointnetgpd_tpu.grasping.samplers import antipodal_sample_grasps

        sdf = make_sdf(np.ones((8, 8, 8)), np.zeros(3), 0.01)
        out = antipodal_sample_grasps(sdf, jax.random.PRNGKey(0),
                                      max_width=0.08)
        assert out.configs.shape == (256, 10)
        assert not np.asarray(out.valid).any()


class TestExtremeEigvecs:
    def test_orthonormal_pair_on_random(self):
        from pointnetgpd_tpu.ops.cloud import extreme_eigvecs_sym3x3

        rng = np.random.RandomState(0)
        b = rng.randn(64, 3, 5).astype(np.float32)
        m = jnp.asarray(np.einsum("nik,njk->nij", b, b))
        vmin, vmax = extreme_eigvecs_sym3x3(m)
        vmin, vmax = np.asarray(vmin), np.asarray(vmax)
        np.testing.assert_allclose(np.linalg.norm(vmin, axis=-1), 1, atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(vmax, axis=-1), 1, atol=1e-5)
        np.testing.assert_allclose(np.abs(np.sum(vmin * vmax, axis=-1)), 0,
                                   atol=1e-4)
        # match eigh's extreme eigenvectors up to sign
        w, v = np.linalg.eigh(np.asarray(m))
        for i in range(64):
            assert abs(abs(np.dot(vmin[i], v[i, :, 0])) - 1) < 1e-3
            assert abs(abs(np.dot(vmax[i], v[i, :, 2])) - 1) < 1e-3

    def test_rank_one_stays_orthonormal(self):
        """Identical neighbor normals -> exactly rank-1 covariance: the
        (minor, normal) pair must still be orthonormal (a parallel fallback
        pair would zero out the GPG frame's major = cross(minor, normal))."""
        from pointnetgpd_tpu.ops.cloud import extreme_eigvecs_sym3x3

        for n in ([0.0, 0.0, 1.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0],
                  [0.6, 0.0, 0.8]):
            nv = np.asarray(n, np.float32)
            m = jnp.asarray(30.0 * np.outer(nv, nv)[None])
            vmin, vmax = extreme_eigvecs_sym3x3(m)
            vmin, vmax = np.asarray(vmin)[0], np.asarray(vmax)[0]
            assert abs(np.linalg.norm(vmin) - 1) < 1e-5
            assert abs(abs(np.dot(vmax, nv)) - 1) < 1e-4  # normal recovered
            assert abs(np.dot(vmin, vmax)) < 1e-4         # orthogonal
            assert np.linalg.norm(np.cross(vmin, vmax)) > 0.99


class TestWindowKnnNormals:
    """Morton-window KNN normals (estimate_normals_knn_window): near-linear
    in P, must agree with the exact all-pairs plane-fit normals."""

    @staticmethod
    def _tabletop(rng, n_obj=3, n=1500):
        objs = []
        for cx, cy in ((-0.2, -0.1), (0.15, 0.2), (0.05, -0.25))[:n_obj]:
            top = rng.rand(n, 3) * [0.06, 0.06, 0] + [cx, cy, 0.08]
            front = rng.rand(n, 3) * [0.06, 0, 0.06] + [cx, cy, 0.02]
            side = rng.rand(n, 3) * [0, 0.06, 0.06] + [cx + 0.06, cy, 0.02]
            objs.append(np.concatenate([top, front, side]))
        return np.concatenate(objs).astype(np.float32)

    def test_agrees_with_exact_on_tabletop(self):
        from pointnetgpd_tpu.ops.cloud import estimate_normals_knn_window

        rng = np.random.RandomState(5)
        pts = self._tabletop(rng)                       # 13.5k points
        cam = np.array([1.0, 1.0, 1.2], np.float32)
        n_exact = np.asarray(estimate_normals_knn(
            jnp.asarray(pts), jnp.asarray(cam), k=30, exact=True))
        n_win = np.asarray(estimate_normals_knn_window(
            jnp.asarray(pts), jnp.asarray(cam), k=30, window=2048))
        cos = np.abs(np.sum(n_exact * n_win, axis=1))
        assert np.mean(cos > 0.99) > 0.97               # same plane fits
        assert np.quantile(cos, 0.02) > 0.9
        # camera-consistent flip preserved
        flip_agree = np.sum(n_exact * n_win, axis=1) > 0
        assert np.mean(flip_agree) > 0.98

    def test_sphere_radial(self):
        from pointnetgpd_tpu.ops.cloud import estimate_normals_knn_window

        rng = np.random.RandomState(6)
        v = rng.randn(6000, 3).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts = 0.1 * v
        cam = np.array([0.0, 0.0, 10.0], np.float32)
        normals = np.asarray(estimate_normals_knn_window(
            jnp.asarray(pts), jnp.asarray(cam), k=12, window=1024))
        cos = np.abs(np.sum(normals * v, axis=1))
        assert np.quantile(cos, 0.1) > 0.95
        top = v[:, 2] > 0.5
        assert normals[top, 2].min() > 0

    def test_small_cloud_falls_back(self):
        from pointnetgpd_tpu.ops.cloud import estimate_normals_knn_window

        rng = np.random.RandomState(7)
        pts = np.zeros((300, 3), np.float32)
        pts[:, :2] = rng.rand(300, 2)
        n = np.asarray(estimate_normals_knn_window(
            jnp.asarray(pts), jnp.asarray([0.5, 0.5, 1.0]), k=15,
            window=2048))
        assert n[:, 2].min() > 0.99

    def test_sentinel_padding_with_bbox(self):
        """The detector's -1e6 sentinel tail must not poison real normals
        when the real bbox is passed."""
        from pointnetgpd_tpu.ops.cloud import estimate_normals_knn_window

        rng = np.random.RandomState(8)
        pts = self._tabletop(rng, n_obj=2)              # 9k real
        pad = np.full((4096, 3), -1e6, np.float32)
        both = np.concatenate([pts, pad])
        cam = np.array([1.0, 1.0, 1.2], np.float32)
        lo, hi = pts.min(0), pts.max(0)
        n_pad = np.asarray(estimate_normals_knn_window(
            jnp.asarray(both), jnp.asarray(cam), k=30, window=2048,
            bbox=(lo, hi)))[:len(pts)]
        n_ref = np.asarray(estimate_normals_knn_window(
            jnp.asarray(pts), jnp.asarray(cam), k=30, window=2048))
        cos = np.abs(np.sum(n_pad * n_ref, axis=1))
        assert np.mean(cos > 0.99) > 0.95
