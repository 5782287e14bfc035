"""Sampler tests on analytic geometry: contact finding on a sphere SDF,
antipodal sampling produces force-closure grasps, GPG produces collision-free
candidates on a synthetic box scene (test strategy modeled on
dex-net/test/grasping_test.py:216-336)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pointnetgpd_tpu.geometry.sdf import make_sdf, world_to_grid
from pointnetgpd_tpu.grasping.grasp import (
    close_fingers,
    configuration_from_params,
    find_contact,
    grasp_from_contact_and_axis,
    line_of_action,
    rotated_full_axis,
)
from pointnetgpd_tpu.grasping.gripper import (
    Gripper,
    collision_and_open_counts,
    hand_points,
    panel_box_array,
    panel_boxes,
)
from pointnetgpd_tpu.grasping.quality import force_closure
from pointnetgpd_tpu.grasping.samplers import (
    antipodal_sample_grasps,
    gaussian_sample_grasps,
    gpg_sample_candidates,
    sample_until,
    uniform_sample_grasps,
)

DIM, RES, RADIUS = 48, 0.005, 0.06


@pytest.fixture(scope="module")
def sphere():
    origin = -RES * (DIM - 1) / 2.0 * np.ones(3)
    ii, jj, kk = np.meshgrid(*(np.arange(DIM),) * 3, indexing="ij")
    pts = origin + RES * np.stack([ii, jj, kk], axis=-1)
    data = np.linalg.norm(pts, axis=-1) - RADIUS
    return make_sdf(data, origin, RES)


class TestContactFinding:
    def test_find_contact_on_sphere(self, sphere):
        """A line of action from outside toward the center must contact at
        radius RADIUS (within a fraction of the grid resolution)."""
        start_w = np.array([-0.1, 0.0, 0.0])
        start = world_to_grid(sphere, jnp.asarray(start_w))
        loa = line_of_action(start, jnp.asarray([1.0, 0, 0]),
                             2 * 0.1 / RES, 60)
        found, pt_grid, strict = find_contact(sphere, loa)
        assert bool(found) and bool(strict)
        pt_world = np.asarray(sphere.origin) + RES * np.asarray(pt_grid)
        np.testing.assert_allclose(np.linalg.norm(pt_world), RADIUS,
                                   atol=RES / 2)

    def test_find_contact_miss(self, sphere):
        start = world_to_grid(sphere, jnp.asarray([-0.1, 0.1, 0.0]))
        loa = line_of_action(start, jnp.asarray([1.0, 0, 0]), 2 * 0.1 / RES, 60)
        found, _, strict = find_contact(sphere, loa)
        assert not bool(found) and not bool(strict)

    def test_close_fingers_on_sphere(self, sphere):
        """Grasp through the center: contacts at +-RADIUS along the axis,
        outward normals radial."""
        config = configuration_from_params(
            jnp.zeros(3), jnp.asarray([0.0, 1.0, 0.0]), 0.18)
        contacts = close_fingers(sphere, config[None], num_samples=60,
                                 check_approach=False)
        assert bool(contacts.found[0])
        pts = np.asarray(contacts.points[0])
        np.testing.assert_allclose(np.abs(pts[:, 1]), RADIUS, atol=RES)
        np.testing.assert_allclose(pts[:, [0, 2]], 0.0, atol=RES)
        normals = np.asarray(contacts.normals[0])
        # outward radial: n ~ +-y
        assert normals[0, 1] < -0.9 and normals[1, 1] > 0.9

    def test_close_fingers_approach_collision(self, sphere):
        """Approach angle 0 means the palm comes in along +x of the grasp
        frame; a grasp whose approach path passes through the object must be
        rejected when check_approach=True."""
        # grasp center on the far side so the approach sweeps the sphere
        config = configuration_from_params(
            jnp.asarray([RADIUS + 2 * RES, 0.0, 0.0]),
            jnp.asarray([0.0, 0.0, 1.0]), 0.18)
        blocked = close_fingers(sphere, config[None], num_samples=60,
                                check_approach=True, approach_dist=0.5,
                                num_approach_samples=120)
        free = close_fingers(sphere, config[None], num_samples=60,
                             check_approach=False)
        # without the approach check the fingers contact the sphere edge;
        # with it, the palm sweep through the sphere must reject the grasp
        assert not bool(blocked.found[0])

    def test_approach_collision_free_matches_close_fingers(self, sphere):
        """approach_collision_free(config, angles) must equal the per-angle
        check_approach close_fingers decomposition: found(check_approach) ==
        approach_ok & found(no check) for every angle candidate — the
        antipodal sampler relies on this factorization."""
        from pointnetgpd_tpu.grasping.grasp import approach_collision_free
        from pointnetgpd_tpu.grasping.samplers import APPROACH_ANGLE_CANDIDATES
        angles = jnp.asarray(APPROACH_ANGLE_CANDIDATES)
        for center, axis in [
            (jnp.zeros(3), jnp.asarray([0.0, 1.0, 0.0])),
            (jnp.asarray([RADIUS + 2 * RES, 0.0, 0.0]),
             jnp.asarray([0.0, 0.0, 1.0])),
            (jnp.asarray([0.0, RADIUS - RES, 0.0]),
             jnp.asarray([1.0, 0.0, 0.0])),
        ]:
            config = configuration_from_params(center, axis, 0.18)
            ok = np.asarray(approach_collision_free(
                sphere, config, angles, num_samples=60))
            configs_a = jnp.tile(config, (angles.shape[0], 1))
            configs_a = configs_a.at[:, 7].set(angles)
            with_app = np.asarray(close_fingers(
                sphere, configs_a, num_samples=60, check_approach=True,
                num_approach_samples=60).found)
            without = np.asarray(close_fingers(
                sphere, configs_a, num_samples=60,
                check_approach=False).found)
            np.testing.assert_array_equal(with_app, ok & without)

    def test_grasp_from_contact_and_axis(self, sphere):
        c1 = jnp.asarray([-RADIUS, 0.0, 0.0])
        config, contacts, valid = grasp_from_contact_and_axis(
            sphere, c1, jnp.asarray([1.0, 0.0, 0.0]), 0.18, num_samples=80)
        assert bool(valid)
        pts = np.asarray(contacts.points)
        np.testing.assert_allclose(np.abs(pts[:, 0]), RADIUS, atol=2 * RES)
        center = np.asarray(config[0:3])
        np.testing.assert_allclose(center, 0.0, atol=2 * RES)


class TestAntipodalSampler:
    def test_sampled_grasps_are_force_closure(self, sphere):
        """Every valid sampled grasp must pass the reference's acceptance
        criteria; on a sphere, contact pairs should be near-antipodal
        (grasping_test.py:216-233 idea)."""
        out = antipodal_sample_grasps(
            sphere, jax.random.PRNGKey(0), max_width=0.18,
            friction_coef=2.0, num_attempts=48, num_samples_loa=48)
        valid = np.asarray(out.valid)
        assert valid.sum() >= 3  # sphere is easy; plenty must survive
        configs = np.asarray(out.configs)[valid]
        pts = np.asarray(out.contacts)[valid]
        nrms = np.asarray(out.normals)[valid]
        for p, n in zip(pts, nrms):
            assert int(force_closure(jnp.asarray(p[0]), jnp.asarray(n[0]),
                                     jnp.asarray(p[1]), jnp.asarray(n[1]),
                                     2.0)) == 1
            # contacts on the sphere surface
            np.testing.assert_allclose(np.linalg.norm(p, axis=1), RADIUS,
                                       atol=2 * RES)
        # angle quirk: approach angles from the degree candidate set
        assert set(np.asarray(configs)[:, 7].round(0)) <= {-90., -60., -30.,
                                                           0., 30., 60., 90.}

    def test_sample_until_accumulates(self, sphere):
        fn = lambda k: antipodal_sample_grasps(
            sphere, k, max_width=0.18, friction_coef=2.0,
            num_attempts=32, num_samples_loa=48)
        configs, pts, nrms = sample_until(fn, jax.random.PRNGKey(1), 5,
                                          max_rounds=6)
        assert len(configs) == 5


class TestUniformGaussianSamplers:
    def test_uniform(self, sphere):
        out = uniform_sample_grasps(sphere, jax.random.PRNGKey(2),
                                    max_width=0.18, num_attempts=64,
                                    num_samples_loa=48)
        assert int(np.asarray(out.valid).sum()) > 0

    def test_gaussian(self, sphere):
        out = gaussian_sample_grasps(
            sphere, jax.random.PRNGKey(3), max_width=0.18,
            center_of_mass=jnp.zeros(3),
            principal_dims=jnp.asarray([2 * RADIUS] * 3),
            num_attempts=64, num_samples_loa=48)
        assert int(np.asarray(out.valid).sum()) > 0


class TestHandGeometry:
    def test_hand_points_layout(self):
        g = Gripper()
        p = hand_points(g)
        assert p.shape == (21, 3)
        # p1 is at the finger tip: hand_depth along x
        np.testing.assert_allclose(p[1][0], g.hand_depth)
        # open width between p5 and p6
        np.testing.assert_allclose(p[6][1] - p[5][1], g.open_width)

    def test_open_box_matches_reference_corners(self):
        g = Gripper()
        boxes = panel_boxes(g)
        lo, hi = boxes["p_open"]
        # open region: x in (0, hand_depth), y in +-open_w/2, z in +-hh/2
        np.testing.assert_allclose(lo, [0.0, -g.open_width / 2, -g.hand_height / 2])
        np.testing.assert_allclose(hi, [g.hand_depth, g.open_width / 2,
                                        g.hand_height / 2])

    def test_counts(self):
        g = Gripper()
        boxes = jnp.asarray(panel_box_array(g))
        # one point in the open region, one inside the left finger
        open_pt = [g.hand_depth / 2, 0.0, 0.0]
        left_pt = [g.hand_depth / 2, -(g.open_width / 2 + g.finger_width / 2), 0.0]
        far_pt = [1.0, 1.0, 1.0]
        pts = jnp.asarray([open_pt, left_pt, far_pt])
        counts = np.asarray(collision_and_open_counts(pts, boxes))
        assert counts[0] == 1   # open
        assert counts[2] == 1   # left finger body
        assert counts[1] == 0 and counts[3] == 0


class TestNamedGrippers:
    """Built-in gripper assets (reference: dex-net/data/grippers/*)."""

    def test_baxter_params(self):
        g = Gripper.named("baxter")
        assert g.name == "baxter"
        assert g.min_width == 0.025
        assert g.max_width == 0.06
        assert g.force_limit == 30.0
        assert g.max_depth == 0.05
        assert g.finger_width == 0.01

    def test_yumi_params(self):
        g = Gripper.named("yumi_metal_spline")
        assert g.min_width == 0.0
        assert g.max_width == 0.05
        assert g.force_limit == 20.0
        assert g.max_depth == 0.04

    def test_robotiq_named_is_default(self):
        assert Gripper.named("robotiq_85") == Gripper()

    def test_unknown_name(self):
        with pytest.raises(KeyError):
            Gripper.named("no_such_gripper")

    def test_named_matches_from_json(self, tmp_path):
        """A reference-format params.json round-trips to the built-in set."""
        import json

        path = tmp_path / "params.json"
        path.write_text(json.dumps({
            "min_width": 0.025, "max_width": 0.06, "force_limit": 30.0,
            "finger_radius": 0.01, "max_depth": 0.05, "finger_width": 0.01}))
        g = Gripper.from_json(str(path), name="baxter")
        assert g == Gripper.named("baxter")

    def test_transforms_are_rigid(self):
        from pointnetgpd_tpu.grasping.gripper import named_transforms

        for name in ("robotiq_85", "baxter", "yumi_metal_spline"):
            tfs = named_transforms(name)
            for t in tfs.values():
                r = t[:3, :3]
                np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)
                np.testing.assert_allclose(t[3], [0, 0, 0, 1])

    def test_gripper_pose_composes_convention(self):
        """gripper_pose applies t_grasp_gripper on the right, matching the
        reference's T_grasp_obj * T_gripper_grasp (grasp.py:393-399)."""
        from pointnetgpd_tpu.grasping.gripper import named_transforms

        g = Gripper.named("baxter")
        tf = named_transforms("baxter")["t_grasp_gripper"]
        config = np.zeros(10)
        config[3:6] = [0, 1, 0]  # binormal
        config[6] = 0.05
        pose_id = g.gripper_pose(config)
        pose_bx = g.gripper_pose(config, t_grasp_gripper=tf)
        np.testing.assert_allclose(pose_bx, pose_id @ tf, atol=1e-12)
        # baxter's convention swaps gripper x into grasp -z and back
        np.testing.assert_allclose(pose_bx[:3, :3] @ tf[:3, :3].T,
                                   pose_id[:3, :3], atol=1e-12)


class TestGpgSampler:
    def test_box_scene_candidates(self):
        """A box on a table: GPG must produce valid candidates whose open
        region contains points and whose hand does not collide."""
        rng = np.random.RandomState(0)
        # camera-visible faces only (top + two sides), camera-consistent
        # normals — a closed box would make the normal covariance isotropic
        # and the local frames degenerate, which no real depth camera produces
        n = 500
        top = rng.rand(n, 3) * [0.06, 0.06, 0] + [0, 0, 0.08]
        front = rng.rand(n, 3) * [0.06, 0, 0.06] + [0, 0, 0.02]
        side = rng.rand(n, 3) * [0, 0.06, 0.06] + [0.06, 0, 0.02]
        pts = np.concatenate([top, front, side]).astype(np.float32)
        pts[:, :2] -= 0.03
        normals = np.concatenate([
            np.tile([0, 0, 1.0], (n, 1)),
            np.tile([0, -1.0, 0], (n, 1)),
            np.tile([1.0, 0, 0], (n, 1)),
        ]).astype(np.float32)

        g = Gripper()
        out = gpg_sample_candidates(
            jnp.asarray(pts), jnp.asarray(normals),
            jax.random.PRNGKey(0), g, num_seeds=24, approach_steps=25)
        valid = np.asarray(out.valid)
        assert valid.sum() > 0
        frames = np.asarray(out.frames)[valid]
        boxes = jnp.asarray(panel_box_array(g), jnp.float32)
        from pointnetgpd_tpu.grasping.gripper import points_in_frame

        for fr in frames[:10]:
            bc_mod, approach, major, minor = fr[4], fr[1], fr[2], fr[3]
            pf = points_in_frame(jnp.asarray(bc_mod), jnp.asarray(approach),
                                 jnp.asarray(major), jnp.asarray(minor),
                                 jnp.asarray(pts))
            counts = np.asarray(collision_and_open_counts(pf, boxes))
            assert counts[0] > 10           # open region populated
            assert counts[1:].sum() == 0    # no collision
            # frame orthonormal
            rot = np.stack([approach, major, minor])
            np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-5)


def _box_scene(n=500, seed=0):
    """Camera-visible box-on-table scene (top + two sides) + normals."""
    rng = np.random.RandomState(seed)
    top = rng.rand(n, 3) * [0.06, 0.06, 0] + [0, 0, 0.08]
    front = rng.rand(n, 3) * [0.06, 0, 0.06] + [0, 0, 0.02]
    side = rng.rand(n, 3) * [0, 0.06, 0.06] + [0.06, 0, 0.02]
    pts = np.concatenate([top, front, side]).astype(np.float32)
    pts[:, :2] -= 0.03
    normals = np.concatenate([
        np.tile([0, 0, 1.0], (n, 1)),
        np.tile([0, -1.0, 0], (n, 1)),
        np.tile([1.0, 0, 0], (n, 1)),
    ]).astype(np.float32)
    return pts, normals


class TestGpgFunnel:
    def test_funnel_counts_monotone_and_match_valid(self):
        """debug=True returns the per-guard funnel: counts must be
        monotonically non-increasing in guard order, start at the frame
        total, end exactly at the number of valid candidates, and the
        candidates themselves must be IDENTICAL to the debug=False run
        (the pre-guard block pruning it disables is result-neutral)."""
        from pointnetgpd_tpu.grasping.samplers import FUNNEL_STAGES

        pts, normals = _box_scene()
        g = Gripper()
        base = gpg_sample_candidates(
            jnp.asarray(pts), jnp.asarray(normals), jax.random.PRNGKey(0),
            g, num_seeds=24, approach_steps=25)
        out, funnel = gpg_sample_candidates(
            jnp.asarray(pts), jnp.asarray(normals), jax.random.PRNGKey(0),
            g, num_seeds=24, approach_steps=25, debug=True)
        np.testing.assert_array_equal(np.asarray(base.valid),
                                      np.asarray(out.valid))
        np.testing.assert_allclose(np.asarray(base.frames),
                                   np.asarray(out.frames), atol=1e-6)
        counts = [int(funnel[k]) for k in FUNNEL_STAGES]
        assert counts[0] == out.valid.shape[0]
        assert all(a >= b for a, b in zip(counts, counts[1:])), counts
        assert counts[-1] == int(np.asarray(out.valid).sum())

    def test_height_bias_prefers_mid_height_seeds(self):
        """seed_bias='height' concentrates the seed draw at mid heights
        (where side-visible surfaces live): the selected seeds' mean
        distance from the cloud's mid height must be clearly smaller than
        the uniform draw's, and top-face seeds (which the downward guard
        can never accept) must be rarer."""
        pts, normals = _box_scene(n=900)  # top face has 1/3 of the points
        g = Gripper()

        def heights(bias, key):
            _, funnel = gpg_sample_candidates(
                jnp.asarray(pts), jnp.asarray(normals),
                jax.random.PRNGKey(key), g, num_seeds=32,
                approach_steps=10, seed_bias=bias, debug=True)
            return np.asarray(funnel["seed_heights"])

        hb = np.concatenate([heights("height", k) for k in range(4)])
        hu = np.concatenate([heights("none", k) for k in range(4)])
        mid = 0.5 * (pts[:, 2].min() + pts[:, 2].max())
        assert np.mean(np.abs(hb - mid)) < 0.8 * np.mean(np.abs(hu - mid))
        # top face sits at z = 0.08: biased draws avoid it
        assert (hb > 0.079).mean() < (hu > 0.079).mean()


class TestAdaptiveLoaSampling:
    def test_fine_grid_labeling_yields_rows(self):
        """Resolution regression (round-5 root cause of the r4 yield
        collapse): on a FINE grid (prepare_objects' 100-cube scale) a fixed
        40-sample line of action steps several cells per sample and
        find_contact never lands in the surface band — zero rows. The
        adaptive count (reference close_fingers grasp.py:464-466) must
        restore the yield."""
        from pointnetgpd_tpu.grasping.grasp import adaptive_num_samples
        from pointnetgpd_tpu.pipelines.generate_dataset import (
            label_grasps_for_object,
        )
        from pointnetgpd_tpu.pipelines.parity import (
            _box_sdf, _sdf_grid_from_fn,
        )

        sdf = _sdf_grid_from_fn(_box_sdf((0.024, 0.030, 0.020)), 0.03,
                                100, 0.00062)
        g = Gripper()
        ns = adaptive_num_samples(sdf, g.max_width)
        assert ns > 100  # ~2 samples per crossed grid cell
        rows, counts, stats = label_grasps_for_object(
            sdf, np.zeros(3, np.float32), g, jax.random.PRNGKey(0),
            grasps_per_class=2, max_rounds=2, batch_attempts=128)
        assert len(rows) > 0, stats
        # and the old fixed count indeed finds nothing (the regression)
        rows40, _, _ = label_grasps_for_object(
            sdf, np.zeros(3, np.float32), g, jax.random.PRNGKey(0),
            grasps_per_class=2, max_rounds=2, batch_attempts=128,
            num_samples_loa=40)
        assert len(rows40) < len(rows)

    def test_adaptive_count_matches_reference_formula(self):
        from pointnetgpd_tpu.grasping.grasp import adaptive_num_samples
        from pointnetgpd_tpu.pipelines.parity import (
            _box_sdf, _sdf_grid_from_fn,
        )

        sdf = _sdf_grid_from_fn(_box_sdf((0.02,) * 3), 0.03, 56, 0.0022)
        # samples_per_grid * width_grid / 2 = 2 * (0.085/0.0022) / 2 ~ 39
        # <= the legacy minimum -> exactly 40 (coarse grids unchanged)
        assert adaptive_num_samples(sdf, 0.085) == 40
        # above the minimum: rounded up to the compile-bucket multiple
        assert adaptive_num_samples(sdf, 0.085, minimum=8) == 64
        assert adaptive_num_samples(sdf, 0.3, cap=128) == 128


class TestLabelYieldAccounting:
    """Quota/exhaustion bookkeeping of the labeling while-loop (round-5
    yield accounting; the reference's loop runs to quota with no books,
    generate-dataset-canny.py:109-134)."""

    def test_patience_declares_ungraspable_object_exhausted(self):
        """A sphere wider than the hand everywhere (min antipodal chord
        2r*cos(atan(mu)) = 0.109 > max_width 0.085 at the sampling mu=2.0)
        accepts nothing; the patience escape must stop the loop — the
        reference's unbounded while-loop would spin forever."""
        from pointnetgpd_tpu.pipelines.generate_dataset import (
            label_grasps_for_object,
        )
        from pointnetgpd_tpu.pipelines.parity import (
            _sdf_grid_from_fn, _sphere_sdf,
        )

        sdf = _sdf_grid_from_fn(_sphere_sdf(0.12), 0.26, 48, 0.011)
        res = label_grasps_for_object(
            sdf, np.zeros(3, np.float32), Gripper(), jax.random.PRNGKey(1),
            grasps_per_class=2, patience=2, batch_attempts=64)
        assert len(res.rows) == 0
        assert res.stats["exhausted"] and not res.stats["quota_met"]
        assert res.stats["rounds"] == 2  # stopped by patience, not budget

    def test_books_balance(self):
        """rows/counts/stats must agree; a 2-round budget cannot fill a
        50/class quota, and a run that accepted rows is not 'exhausted'."""
        from pointnetgpd_tpu.pipelines.generate_dataset import (
            label_grasps_for_object,
        )
        from pointnetgpd_tpu.pipelines.parity import (
            _box_sdf, _sdf_grid_from_fn,
        )

        sdf = _sdf_grid_from_fn(_box_sdf((0.024, 0.030, 0.020)), 0.03,
                                100, 0.00062)
        res = label_grasps_for_object(
            sdf, np.zeros(3, np.float32), Gripper(), jax.random.PRNGKey(0),
            grasps_per_class=50, max_rounds=2, batch_attempts=128)
        assert len(res.rows) > 0
        assert res.stats["accepted"] == len(res.rows) == int(res.counts.sum())
        assert res.stats["per_class"] == res.counts.tolist()
        assert res.stats["rounds"] == 2
        assert not res.stats["quota_met"]
        assert not res.stats["exhausted"]


class TestGpgPaddedSeeds:
    def test_tiny_cloud_pad_slots_invalid(self):
        """Clouds smaller than num_seeds edge-pad the seed index buffer;
        the duplicated pad slots must be masked invalid so identical
        (seed, theta) candidates can't multiply (ADVICE r2)."""
        rng = np.random.RandomState(3)
        n = 12  # < num_seeds
        pts = (rng.rand(n, 3) * [0.05, 0.05, 0.0]
               + [0, 0, 0.08]).astype(np.float32)
        pts[:, :2] -= 0.025
        normals = np.tile([0, 0, 1.0], (n, 1)).astype(np.float32)
        num_seeds = 32
        out = gpg_sample_candidates(
            jnp.asarray(pts), jnp.asarray(normals),
            jax.random.PRNGKey(1), Gripper(), num_seeds=num_seeds,
            approach_steps=10)
        n_theta = out.valid.shape[0] // num_seeds
        valid = np.asarray(out.valid).reshape(num_seeds, n_theta)
        # pad slots are the seed indices >= n in the ORIGINAL selection
        # order, which is what the sampler returns: all must be invalid
        assert not valid[n:].any()


class TestGpgSamplerSharded:
    def test_mesh_sharded_equals_single_device(self):
        """Frame-axis shard_map over the 8-device mesh must reproduce the
        single-device candidates exactly (zero collectives; num_seeds *
        n_theta = 24 * 19 = 456 = 57 per device, pads to 64)."""
        from pointnetgpd_tpu.parallel.mesh import make_mesh

        rng = np.random.RandomState(1)
        n = 500
        top = rng.rand(n, 3) * [0.06, 0.06, 0] + [0, 0, 0.08]
        front = rng.rand(n, 3) * [0.06, 0, 0.06] + [0, 0, 0.02]
        side = rng.rand(n, 3) * [0, 0.06, 0.06] + [0.06, 0, 0.02]
        pts = np.concatenate([top, front, side]).astype(np.float32)
        pts[:, :2] -= 0.03
        normals = np.concatenate([
            np.tile([0, 0, 1.0], (n, 1)),
            np.tile([0, -1.0, 0], (n, 1)),
            np.tile([1.0, 0, 0], (n, 1)),
        ]).astype(np.float32)

        g = Gripper()
        kw = dict(num_seeds=24, approach_steps=25)
        base = gpg_sample_candidates(
            jnp.asarray(pts), jnp.asarray(normals),
            jax.random.PRNGKey(0), g, **kw)
        sharded = gpg_sample_candidates(
            jnp.asarray(pts), jnp.asarray(normals),
            jax.random.PRNGKey(0), g, mesh=make_mesh(), **kw)
        assert np.asarray(base.valid).sum() > 0
        # per-shard XLA fusion rounds frame coordinates differently at
        # ~1e-8, which can flip a knife-edge validity decision; candidates
        # must otherwise agree
        mism = np.sum(np.asarray(base.valid) != np.asarray(sharded.valid))
        assert mism <= 2, mism
        np.testing.assert_allclose(np.asarray(base.frames),
                                   np.asarray(sharded.frames), atol=1e-6)


class TestCurvatureFrames:
    """Deterministic SDF principal-curvature frames (the fix for the
    covariance estimator's eigen-lottery on isotropic neighborhoods)."""

    @staticmethod
    def _cylinder_sdf(radius=0.05, dim=40, res=0.004):
        origin = -res * (dim - 1) / 2 * np.ones(3)
        ii, jj, kk = np.meshgrid(*(np.arange(dim),) * 3, indexing="ij")
        pts = origin + res * np.stack([ii, jj, kk], axis=-1)
        from pointnetgpd_tpu.geometry.sdf import make_sdf

        return make_sdf(np.linalg.norm(pts[..., :2], axis=-1) - radius,
                        origin, res)

    def test_cylinder_minor_axis_is_rule_direction(self):
        """On a cylinder the minimum-curvature direction IS the axis: every
        frame's minor axis must align with z."""
        from pointnetgpd_tpu.grasping.samplers import (
            _curvature_frames,
            _sdf_surface_points_and_normals,
        )

        sdf = self._cylinder_sdf()
        pts, normals, pts_grid = _sdf_surface_points_and_normals(
            sdf, 512, jax.random.PRNGKey(0))
        frames = _curvature_frames(sdf, pts_grid, normals)
        interior = np.abs(np.asarray(pts)[:, 2]) < 0.06  # skip grid-cut caps
        minor_z = np.abs(np.asarray(frames[:, 2])[interior, 2])
        assert minor_z.min() > 0.99
        # orthonormal right-handed frames
        f = np.asarray(frames[interior])
        for row in f[:20]:
            rot = row  # [normal, major, minor]
            np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-4)

    def test_frames_deterministic(self):
        from pointnetgpd_tpu.grasping.samplers import (
            _curvature_frames,
            _sdf_surface_points_and_normals,
        )

        sdf = self._cylinder_sdf()
        _, normals, pts_grid = _sdf_surface_points_and_normals(
            sdf, 256, jax.random.PRNGKey(1))
        a = _curvature_frames(sdf, pts_grid, normals)
        b = _curvature_frames(sdf, pts_grid, normals)
        assert bool(jnp.all(a == b))

    def test_lazy_normals_agree_with_dense(self):
        """gpg_sample_candidates(normals=None, camera_pos=...) — normals
        estimated inside the seed windows — must produce candidates that
        agree with the dense-normals run: grossly similar valid counts and
        high per-candidate frame agreement on the shared valid set (the
        window estimator is a statistical, not bit-exact, stand-in)."""
        rng = np.random.RandomState(1)
        n = 1000  # 3000 total: exercises the windowed branch (P > 2W)
        top = rng.rand(n, 3) * [0.06, 0.06, 0] + [0, 0, 0.08]
        front = rng.rand(n, 3) * [0.06, 0, 0.06] + [0, 0, 0.02]
        side = rng.rand(n, 3) * [0, 0.06, 0.06] + [0.06, 0, 0.02]
        pts = np.concatenate([top, front, side]).astype(np.float32)
        pts[:, :2] -= 0.03
        cam = jnp.asarray([0.5, 0.5, 1.0])

        from pointnetgpd_tpu.ops.cloud import estimate_normals_knn

        dense_n = estimate_normals_knn(jnp.asarray(pts), cam, k=30)
        g = Gripper()
        dense = gpg_sample_candidates(
            jnp.asarray(pts), dense_n, jax.random.PRNGKey(0), g,
            num_seeds=32, normal_window=1024)
        lazy = gpg_sample_candidates(
            jnp.asarray(pts), None, jax.random.PRNGKey(0), g,
            num_seeds=32, camera_pos=cam, normal_window=1024)
        va, vb = np.asarray(dense.valid), np.asarray(lazy.valid)
        assert va.sum() > 0 and vb.sum() > 0
        both = va & vb
        # most valid candidates shared (seed selection is identical — same
        # key — so disagreement can only come from normal estimation)
        assert both.sum() >= 0.6 * max(va.sum(), vb.sum())
        fa = np.asarray(dense.frames)[both]
        fb = np.asarray(lazy.frames)[both]
        # shared candidates: same seeds/thetas, so the frames differ only
        # by the estimators' covariance noise — a few degrees of rotation
        # and a few mm of bottom center
        cos_app = np.einsum("si,si->s", fa[:, 1], fb[:, 1])
        assert np.quantile(cos_app, 0.5) > 0.995          # approach ~<6 deg
        bc_d = np.linalg.norm(fa[:, 0] - fb[:, 0], axis=1)
        assert np.quantile(bc_d, 0.5) < 5e-3              # bottom center mm

    def test_gpg_sdf_curvature_mode_executes(self):
        """curvature_frames=True runs the full sampler path and returns
        well-formed candidates (acceptance on closed SDF surfaces is
        characterized in tests/test_extras.py — same as the reference)."""
        from pointnetgpd_tpu.grasping.samplers import gpg_sample_grasps_sdf

        sdf = self._cylinder_sdf(radius=0.02)
        # side camera: the cylinder's radial normals never face a camera
        # directly above it
        out = gpg_sample_grasps_sdf(sdf, jax.random.PRNGKey(0), Gripper(),
                                    curvature_frames=True, num_seeds=8,
                                    max_surface_points=512,
                                    camera_pos=(1.0, 0.0, 0.0))
        assert out.frames.shape[1:] == (5, 3)
        assert out.valid.shape[0] == out.frames.shape[0]
        assert np.isfinite(np.asarray(out.frames)).all()

    def test_no_visible_points_returns_empty(self):
        """A camera the whole surface faces away from -> zero candidates,
        not a crash."""
        from pointnetgpd_tpu.grasping.samplers import gpg_sample_grasps_sdf

        sdf = self._cylinder_sdf(radius=0.02)
        out = gpg_sample_grasps_sdf(sdf, jax.random.PRNGKey(0), Gripper(),
                                    num_seeds=8, max_surface_points=256,
                                    camera_pos=(0.0, 0.0, 1.0))
        assert out.frames.shape[0] == 0 and out.valid.shape[0] == 0


class TestGpgOutputOrderUnbiased:
    def test_valid_candidates_span_clusters(self):
        """The Morton sort used for kernel tile pruning must NOT leak into
        the output order: consumers truncate to the first N valid
        candidates (node.py), and a spatially sorted order would give every
        slot to one corner of the scene. With the unsort in place, the
        first half of the valid candidates must span multiple clusters."""
        rng = np.random.RandomState(0)
        objs, nrms = [], []
        for cx, cy in ((-0.25, -0.15), (0.2, 0.25), (0.05, -0.3)):
            n = 700
            top = rng.rand(n, 3) * [0.06, 0.06, 0] + [cx, cy, 0.08]
            front = rng.rand(n, 3) * [0.06, 0, 0.06] + [cx, cy, 0.02]
            side = rng.rand(n, 3) * [0, 0.06, 0.06] + [cx + 0.06, cy, 0.02]
            objs.append(np.concatenate([top, front, side]).astype(np.float32))
            nrms.append(np.concatenate([
                np.tile([0, 0, 1.0], (n, 1)),
                np.tile([0, -1.0, 0], (n, 1)),
                np.tile([1.0, 0, 0], (n, 1))]).astype(np.float32))
        pts = np.concatenate(objs)
        normals = np.concatenate(nrms)

        out = gpg_sample_candidates(
            jnp.asarray(pts), jnp.asarray(normals), jax.random.PRNGKey(0),
            Gripper(), num_seeds=96, approach_steps=25)
        valid = np.asarray(out.valid)
        frames = np.asarray(out.frames)[valid]
        assert len(frames) >= 8
        # cluster id of each valid candidate's bottom center (by nearest
        # object center in xy)
        centers = np.array([[-0.22, -0.12], [0.23, 0.28], [0.08, -0.27]])
        first = frames[: max(4, len(frames) // 2), 0, :2]
        cid = np.argmin(
            np.linalg.norm(first[:, None] - centers[None], axis=-1), axis=1)
        assert len(np.unique(cid)) >= 2, (
            "first valid candidates all in one cluster: output order is "
            "spatially sorted")


def test_lazy_normals_require_positive_window():
    """normals=None with normal_window<=0 must fail loudly: the lazy path
    IS the windowed estimator, so there is no all-pairs fallback to hide
    behind (the detector maps normal_window=0 to the dense flow instead)."""
    import pytest

    pts = np.random.RandomState(0).rand(256, 3).astype(np.float32)
    with pytest.raises(ValueError, match="normal_window > 0"):
        gpg_sample_candidates(
            jnp.asarray(pts), None, jax.random.PRNGKey(0), Gripper(),
            num_seeds=8, camera_pos=jnp.asarray([0.5, 0.5, 1.0]),
            normal_window=0)
