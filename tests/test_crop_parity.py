"""Parity of the batched closing-region crop kernel vs the reference's
host-side numpy implementation (reference: PointNetGPD/model/dataset.py:15-76
and dex-net/apps/kinect2grasp.py:178-235).

The crop *membership set* must match exactly (same frame math, same strict
box inequalities); the fixed-N resampling is compared statistically since RNG
streams differ by design (explicit JAX key threading vs global numpy state).
"""

import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pointnetgpd_tpu.ops.crop import (
    apply_transform_to_frame,
    collect_candidate_clouds,
    collect_grasp_clouds,
    grasp_frame_from_config,
)

from conftest import REFERENCE_ROOT, requires_reference


# ---------------------------------------------------------------------------
# Reference oracle: BaseGraspDataset.collect_pc without the package machinery
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_collect_pc():
    """Load the reference collect_pc with open3d/env stubs (oracle only)."""
    import importlib.util
    import os
    import pickle
    import tempfile

    # open3d is not installed; collect_pc never touches it (only the GPD
    # projection path does), so a stub module suffices for import.
    if "open3d" not in sys.modules:
        sys.modules["open3d"] = types.ModuleType("open3d")

    # BaseGraspDataset.__init__ reads $PointNetGPD_FOLDER/.../google2cloud.pkl;
    # point it at a temp dir with an empty transform dict.
    tmp = tempfile.mkdtemp()
    os.makedirs(f"{tmp}/PointNetGPD/data", exist_ok=True)
    with open(f"{tmp}/PointNetGPD/data/google2cloud.pkl", "wb") as f:
        pickle.dump({}, f)
    os.environ["PointNetGPD_FOLDER"] = tmp

    path = f"{REFERENCE_ROOT}/PointNetGPD/model/dataset.py"
    spec = importlib.util.spec_from_file_location("_ref_dataset", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    ds = mod.BaseGraspDataset()
    ds.min_point_limit = 50
    ds.projection = False
    return ds.collect_pc


def _random_grasp(rng):
    center = rng.randn(3) * 0.02
    axis = rng.randn(3)
    axis /= np.linalg.norm(axis)
    width = 0.08
    angle = rng.uniform(-np.pi, np.pi)
    jaw, minw = 0.08, 0.0
    return np.concatenate([center, axis, [width, angle, jaw, minw, 0.0, 0.0]]).astype(
        np.float64
    )


def _ref_membership(grasp, pc, transform):
    """Recompute the reference's in-region membership mask only (frame math
    identical to dataset.py:16-69) to compare sets, not sample order."""
    center, axis = grasp[0:3], grasp[3:6] / np.linalg.norm(grasp[3:6])
    width, angle = grasp[6], grasp[7]
    cos_t, sin_t = np.cos(angle), np.sin(angle)
    R1 = np.c_[[cos_t, 0, sin_t], [0, 1, 0], [-sin_t, 0, cos_t]]
    axis_y = axis
    axis_x = np.array([axis_y[1], -axis_y[0], 0])
    if np.linalg.norm(axis_x) == 0:
        axis_x = np.array([1, 0, 0])
    axis_x = axis_x / np.linalg.norm(axis_x)
    axis_z = np.cross(axis_x, axis_y)
    R2 = np.c_[axis_x, np.c_[axis_y, axis_z]]
    approach = R2.dot(R1)[:, 0]
    approach /= np.linalg.norm(approach)
    minor = np.cross(axis, approach)
    center_t = transform[:3, :3] @ center + transform[:3, 3]
    rot = np.stack(
        [transform[:3, :3] @ approach, transform[:3, :3] @ axis, transform[:3, :3] @ minor]
    )
    pc_t = (pc - center_t) @ rot.T
    lim = np.array([width / 4, width / 2, width / 4])
    return np.all((pc_t > -lim) & (pc_t < lim), axis=1), pc_t


@requires_reference
def test_frame_math_matches_reference(ref_collect_pc, rng):
    """The gripper-frame transform of the cloud must match collect_pc's
    internal pc_t bit-for-bit (same in-region point coordinates)."""
    transform = np.eye(4)
    transform[:3, 3] = [0.01, -0.02, 0.005]
    # small random rotation
    theta = 0.3
    transform[:3, :3] = np.array(
        [[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1]]
    )

    for trial in range(10):
        grasp = _random_grasp(rng)
        pc = (rng.randn(2000, 3) * 0.04 + grasp[0:3]).astype(np.float64)

        ref_out = ref_collect_pc(grasp, pc, transform)
        ref_mask, ref_pc_t = _ref_membership(grasp, pc, transform)

        # our frame math
        center, approach, binormal, minor, width = jax.tree_util.tree_map(
            np.asarray,
            grasp_frame_from_config(jnp.asarray(grasp)),
        )
        center, approach, binormal, minor = jax.tree_util.tree_map(
            np.asarray,
            apply_transform_to_frame(
                jnp.asarray(transform), jnp.asarray(center), jnp.asarray(approach),
                jnp.asarray(binormal), jnp.asarray(minor),
            ),
        )
        rot = np.stack([approach, binormal, minor])
        pc_t = (pc - center) @ rot.T
        np.testing.assert_allclose(pc_t, ref_pc_t, rtol=0, atol=1e-6)  # XLA CPU sin is fp32-accurate

        lim = np.array([width / 4, width / 2, width / 4])
        mask = np.all((pc_t > -lim) & (pc_t < lim), axis=1)
        np.testing.assert_array_equal(mask, ref_mask)

        # cross-check against the actual reference function's output set
        # (lexicographic sort; last-bit matmul association diffs ~1e-10)
        if ref_out is not None:
            ref_sorted = ref_out[np.lexsort(ref_out.T)]
            ours_sorted = pc_t[mask][np.lexsort(pc_t[mask].T)]
            assert ref_sorted.shape == ours_sorted.shape
            np.testing.assert_allclose(ours_sorted, ref_sorted, rtol=0, atol=1e-6)


@requires_reference
def test_batched_crop_counts_and_membership(ref_collect_pc, rng):
    """collect_grasp_clouds counts == reference in-region counts; resampled
    points are all members of the reference crop set."""
    transform = np.eye(4)
    grasps = np.stack([_random_grasp(rng) for _ in range(16)])
    pc = (rng.randn(3000, 3) * 0.05).astype(np.float64)

    points, counts, valid = collect_grasp_clouds(
        jnp.asarray(grasps), jnp.asarray(pc), jnp.asarray(transform),
        jax.random.PRNGKey(0), num_out=128, min_point_limit=50,
    )
    points, counts, valid = map(np.asarray, (points, counts, valid))

    for i in range(len(grasps)):
        ref_out = ref_collect_pc(grasps[i], pc, transform)
        ref_mask, ref_pc_t = _ref_membership(grasps[i], pc, transform)
        assert counts[i] == ref_mask.sum()
        assert valid[i] == (ref_out is not None)
        if valid[i]:
            members = ref_pc_t[ref_mask]  # (C, 3)
            d = np.linalg.norm(points[i][:, None, :] - members[None, :, :], axis=-1)
            assert d.min(axis=1).max() < 1e-6  # every sampled point is a member


def test_resample_without_replacement_is_distinct():
    """count > num_out must produce num_out *distinct* in-region points."""
    pc = np.random.RandomState(1).randn(4000, 3).astype(np.float32) * 0.01
    grasp = np.zeros(12, dtype=np.float32)
    grasp[3:6] = [0, 1, 0]
    grasp[6] = 0.15  # wide box catches many points
    points, counts, valid = collect_grasp_clouds(
        jnp.asarray(grasp)[None], jnp.asarray(pc), jnp.eye(4),
        jax.random.PRNGKey(3), num_out=64, min_point_limit=50,
    )
    assert bool(valid[0]) and int(counts[0]) > 64
    uniq = np.unique(np.asarray(points[0]), axis=0)
    assert len(uniq) == 64


def test_resample_with_replacement_covers_small_sets():
    """count < num_out resamples with replacement from the in-region set."""
    rs = np.random.RandomState(2)
    pc = np.concatenate(
        [rs.randn(60, 3) * 0.001, rs.randn(1000, 3) * 1.0 + 5.0]  # 60 near, rest far
    ).astype(np.float32)
    grasp = np.zeros(12, dtype=np.float32)
    grasp[3:6] = [0, 1, 0]
    grasp[6] = 0.4
    points, counts, valid = collect_grasp_clouds(
        jnp.asarray(grasp)[None], jnp.asarray(pc), jnp.eye(4),
        jax.random.PRNGKey(4), num_out=128, min_point_limit=50,
    )
    assert bool(valid[0])
    c = int(counts[0])
    assert 50 <= c < 128
    uniq = np.unique(np.asarray(points[0]), axis=0)
    assert len(uniq) <= c  # drawn only from the in-region set


def test_online_crop_box_semantics():
    """Online box: x in (0, hand_depth) — bottom-center anchored, one-sided."""
    pc = np.array(
        [[0.01, 0.0, 0.0], [-0.01, 0.0, 0.0], [0.05, 0.0, 0.0], [0.09, 0.0, 0.0]],
        dtype=np.float32,
    )
    points, counts, valid = collect_candidate_clouds(
        jnp.zeros((1, 3)),                      # bottom center at origin
        jnp.asarray([[1.0, 0.0, 0.0]]),          # approach = +x
        jnp.asarray([[0.0, 1.0, 0.0]]),          # binormal = +y
        jnp.asarray([[0.0, 0.0, 1.0]]),          # minor = +z
        jnp.asarray(pc),
        jnp.float32(0.06),                       # hand_depth
        jnp.float32(0.08),                       # width
        jax.random.PRNGKey(0),
        num_out=8,
        min_point_limit=1,
    )
    # x=0.01 and x=0.05 are inside; x=-0.01 (behind) and x=0.09 (too deep) not
    assert int(counts[0]) == 2
    assert bool(valid[0])


def test_online_crop_recenter_matches_training_convention():
    """recenter=True (DetectorConfig crop_mode='dataset') must produce
    crops in the TRAINING frame: coordinates centered at the in-box
    points' mean depth with the dataset box (x,z in +-width/4,
    y in +-width/2, dataset.py:57-69) — the fix for the reference's
    train/deploy crop mismatch (docs/QUIRKS.md)."""
    rng = np.random.RandomState(0)
    # a dense slab of points at depth x ~ [0.03, 0.05] in front of the hand
    pc = np.stack([rng.uniform(0.03, 0.05, 600),
                   rng.uniform(-0.03, 0.03, 600),
                   rng.uniform(-0.015, 0.015, 600)], axis=1).astype(
                       np.float32)
    args = (jnp.zeros((1, 3)), jnp.asarray([[1.0, 0, 0]]),
            jnp.asarray([[0.0, 1.0, 0]]), jnp.asarray([[0.0, 0, 1.0]]),
            jnp.asarray(pc), jnp.float32(0.06), jnp.float32(0.08),
            jax.random.PRNGKey(0))
    pts_ref, counts_ref, _ = collect_candidate_clouds(
        *args, num_out=256, min_point_limit=10)
    pts_rc, counts_rc, valid_rc = collect_candidate_clouds(
        *args, num_out=256, min_point_limit=10, recenter=True)
    assert bool(valid_rc[0])
    ref = np.asarray(pts_ref[0])
    rc = np.asarray(pts_rc[0])
    # reference crop x sits at the slab's absolute depth (~0.04); the
    # recentered crop's x must be near zero-mean like a training crop
    assert abs(ref[:, 0].mean() - 0.04) < 0.005
    assert abs(rc[:, 0].mean()) < 0.005
    # recentered box bounds: x,z in +-width/4, y in +-width/2
    assert np.abs(rc[:, 0]).max() < 0.02 + 1e-6
    assert np.abs(rc[:, 1]).max() < 0.04 + 1e-6
    assert np.abs(rc[:, 2]).max() < 0.02 + 1e-6


class TestPrefixRankSelect:
    """The scene-path selection strategy (G >= 32 candidates, P > 4096):
    shuffle + prefix-sum rank-select must keep the exact crop semantics."""

    @staticmethod
    def _scene(rng, g=64, p=8192):
        pc = (rng.rand(p, 3) * 0.2 - 0.1).astype(np.float32)
        bottom = pc[rng.choice(p, g)]
        approach = np.tile([1.0, 0, 0], (g, 1)).astype(np.float32)
        binormal = np.tile([0, 1.0, 0], (g, 1)).astype(np.float32)
        minor = np.tile([0, 0, 1.0], (g, 1)).astype(np.float32)
        return pc, bottom, approach, binormal, minor

    def test_counts_and_membership_vs_oracle(self):
        rng = np.random.RandomState(0)
        pc, bottom, approach, binormal, minor = self._scene(rng)
        hand_depth, width = 0.06, 0.08
        points, counts, valid = collect_candidate_clouds(
            jnp.asarray(bottom), jnp.asarray(approach), jnp.asarray(binormal),
            jnp.asarray(minor), jnp.asarray(pc), jnp.float32(hand_depth),
            jnp.float32(width), jax.random.PRNGKey(1), num_out=100,
            min_point_limit=10)
        points, counts, valid = map(np.asarray, (points, counts, valid))
        assert valid.sum() > 10
        for i in range(len(bottom)):
            d = pc.astype(np.float64) - bottom[i]
            pf = d  # identity frame rows
            m = ((pf[:, 0] > 0) & (pf[:, 0] < hand_depth)
                 & (np.abs(pf[:, 1]) < width / 2)
                 & (np.abs(pf[:, 2]) < width / 4))
            assert counts[i] == m.sum()
            if valid[i]:
                members = pf[m]
                dd = np.linalg.norm(points[i][:, None] - members[None],
                                    axis=-1)
                assert dd.min(axis=1).max() < 1e-5

    def test_without_replacement_distinct(self):
        rng = np.random.RandomState(1)
        pc, bottom, approach, binormal, minor = self._scene(rng)
        points, counts, valid = collect_candidate_clouds(
            jnp.asarray(bottom), jnp.asarray(approach), jnp.asarray(binormal),
            jnp.asarray(minor), jnp.asarray(pc), jnp.float32(0.1),
            jnp.float32(0.2), jax.random.PRNGKey(2), num_out=32,
            min_point_limit=10)
        points, counts, valid = map(np.asarray, (points, counts, valid))
        hit = (counts > 32) & valid
        assert hit.sum() > 5
        for i in np.where(hit)[0][:10]:
            uniq = np.unique(points[i], axis=0)
            assert len(uniq) == 32, (i, len(uniq), counts[i])

    def test_selection_is_not_spatially_biased(self):
        """Ranks 1..num_out of a SHUFFLED order must sample uniformly: the
        mean selected x-coordinate tracks the in-region mean, not the
        cloud's storage order."""
        rng = np.random.RandomState(2)
        p = 8192
        # storage order = sorted by x: an unshuffled first-k would pick the
        # lowest-x points only
        pc = (rng.rand(p, 3) * 0.2 - 0.1).astype(np.float32)
        pc = pc[np.argsort(pc[:, 0])]
        g = 64
        bottom = np.tile([-0.05, 0.0, 0.0], (g, 1)).astype(np.float32)
        approach = np.tile([1.0, 0, 0], (g, 1)).astype(np.float32)
        binormal = np.tile([0, 1.0, 0], (g, 1)).astype(np.float32)
        minor = np.tile([0, 0, 1.0], (g, 1)).astype(np.float32)
        points, counts, valid = collect_candidate_clouds(
            jnp.asarray(bottom), jnp.asarray(approach), jnp.asarray(binormal),
            jnp.asarray(minor), jnp.asarray(pc), jnp.float32(0.1),
            jnp.float32(0.4), jax.random.PRNGKey(3), num_out=64,
            min_point_limit=10)
        points, counts = np.asarray(points), np.asarray(counts)
        assert int(counts[0]) > 1000
        d = pc.astype(np.float64) - bottom[0]
        m = ((d[:, 0] > 0) & (d[:, 0] < 0.1) & (np.abs(d[:, 1]) < 0.2)
             & (np.abs(d[:, 2]) < 0.1))
        region_mean = d[m, 0].mean()
        sel_mean = points[0][:, 0].mean()
        spread = d[m, 0].std()
        assert abs(sel_mean - region_mean) < spread / 2


class TestBatchedPerCloudCrop:
    """collect_grasp_clouds_batched: the training path's one-program crop
    (sample i crops its OWN cloud) must keep the exact crop semantics of the
    per-sample path."""

    @staticmethod
    def _batch(rng, b=24, p=3000):
        grasps = np.stack([_random_grasp(rng) for _ in range(b)]).astype(
            np.float32)
        clouds = (rng.randn(b, p, 3) * 0.05).astype(np.float32)
        transforms = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
        theta = 0.3
        transforms[::2, :3, :3] = np.array(
            [[np.cos(theta), -np.sin(theta), 0],
             [np.sin(theta), np.cos(theta), 0], [0, 0, 1]], np.float32)
        transforms[::2, :3, 3] = [0.01, -0.02, 0.005]
        return grasps, clouds, transforms

    def test_counts_and_membership_vs_oracle(self):
        from pointnetgpd_tpu.ops.crop import collect_grasp_clouds_batched

        rng = np.random.RandomState(7)
        grasps, clouds, transforms = self._batch(rng)
        points, counts, valid = collect_grasp_clouds_batched(
            jnp.asarray(grasps), jnp.asarray(clouds),
            jnp.asarray(transforms), jax.random.PRNGKey(0), num_out=128,
            min_point_limit=50)
        points, counts, valid = map(np.asarray, (points, counts, valid))
        assert valid.sum() > 0
        for i in range(len(grasps)):
            mask, pc_t = _ref_membership(
                grasps[i].astype(np.float64),
                clouds[i].astype(np.float64),
                transforms[i].astype(np.float64))
            assert counts[i] == mask.sum()
            assert valid[i] == (mask.sum() >= 50)
            if valid[i]:
                members = pc_t[mask]
                d = np.linalg.norm(points[i][:, None] - members[None],
                                   axis=-1)
                assert d.min(axis=1).max() < 1e-4

    def test_counts_match_per_sample_path(self):
        """Membership is deterministic: the batched program's counts must
        equal vmapped collect_grasp_clouds' counts exactly."""
        from pointnetgpd_tpu.ops.crop import collect_grasp_clouds_batched

        rng = np.random.RandomState(8)
        grasps, clouds, transforms = self._batch(rng, b=16)
        _, counts_b, valid_b = collect_grasp_clouds_batched(
            jnp.asarray(grasps), jnp.asarray(clouds),
            jnp.asarray(transforms), jax.random.PRNGKey(1), num_out=64,
            min_point_limit=50)
        keys = jax.random.split(jax.random.PRNGKey(2), len(grasps))
        _, counts_s, valid_s = jax.vmap(
            lambda g, pc, t, k: collect_grasp_clouds(
                g[None], pc, t, k, num_out=64, min_point_limit=50)
        )(jnp.asarray(grasps), jnp.asarray(clouds), jnp.asarray(transforms),
          keys)
        np.testing.assert_array_equal(np.asarray(counts_b),
                                      np.asarray(counts_s)[:, 0])
        np.testing.assert_array_equal(np.asarray(valid_b),
                                      np.asarray(valid_s)[:, 0])

    def test_without_replacement_distinct_and_small_cloud(self):
        from pointnetgpd_tpu.ops.crop import collect_grasp_clouds_batched

        rs = np.random.RandomState(9)
        b = 4
        grasps = np.zeros((b, 12), np.float32)
        grasps[:, 3:6] = [0, 1, 0]
        grasps[:, 6] = 0.15
        clouds = rs.randn(b, 2000, 3).astype(np.float32) * 0.01
        # sample 2: tiny in-region set (with-replacement branch)
        clouds[2, 60:] += 5.0
        transforms = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
        points, counts, valid = collect_grasp_clouds_batched(
            jnp.asarray(grasps), jnp.asarray(clouds),
            jnp.asarray(transforms), jax.random.PRNGKey(5), num_out=128,
            min_point_limit=50)
        points, counts, valid = map(np.asarray, (points, counts, valid))
        assert valid.all()
        for i in (0, 1, 3):
            assert counts[i] > 128
            assert len(np.unique(points[i], axis=0)) == 128
        assert 50 <= counts[2] < 128
        assert len(np.unique(points[2], axis=0)) <= counts[2]

    def test_cloud_smaller_than_block(self):
        """P < 128 (one rank block, heavy padding) stays exact."""
        from pointnetgpd_tpu.ops.crop import collect_grasp_clouds_batched

        rs = np.random.RandomState(10)
        grasps = np.zeros((2, 12), np.float32)
        grasps[:, 3:6] = [0, 1, 0]
        grasps[:, 6] = 0.3
        clouds = rs.randn(2, 70, 3).astype(np.float32) * 0.01
        transforms = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
        points, counts, valid = collect_grasp_clouds_batched(
            jnp.asarray(grasps), jnp.asarray(clouds),
            jnp.asarray(transforms), jax.random.PRNGKey(6), num_out=32,
            min_point_limit=10)
        counts = np.asarray(counts)
        assert (counts == 70).all()  # wide box catches every point
        assert np.isfinite(np.asarray(points)).all()
