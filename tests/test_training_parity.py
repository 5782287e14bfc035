"""Training-accuracy parity harness tests (pipelines/parity.py).

The full-size experiment (docs/TRAINING_PARITY.md) is driven by
examples/train_parity_experiment.py; these tests validate the harness on a
miniature: the generated dataset is readable by the REFERENCE's own dataset
class with identical labels, and both trainers run end-to-end on it and
learn (reference: PointNetGPD/main_1v_mc.py + model/dataset.py:464-549).
"""

import os
import sys

import numpy as np
import pytest

from conftest import requires_reference

from pointnetgpd_tpu.pipelines import parity


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("parity_mini"))
    meta = parity.build_parity_dataset(
        root, grasps_per_class=4, max_rounds=4, views_per_object=2,
        points_per_view=4000, seed=0,
        objects=["parity_sphere", "parity_box"])
    return root, meta


@pytest.mark.slow
class TestParityDatasetLayout:
    def test_layout_and_sizes(self, mini_dataset):
        root, meta = mini_dataset
        assert meta["n_train"] >= 8 and meta["n_test"] >= 2
        for obj in meta["objects"]:
            tr = np.load(f"{root}/PointNetGPD/data/ycb_grasp/train/{obj}.npy")
            te = np.load(f"{root}/PointNetGPD/data/ycb_grasp/test/{obj}.npy")
            assert tr.shape == (meta["n_train"], 12)
            assert te.shape == (meta["n_test"], 12)
            clouds = os.listdir(
                f"{root}/data/ycb-tools/models/ycb/{obj}/rgbd/clouds")
            assert len(clouds) == 2
        # label diversity: the 3-class thresholds must be populated overall
        rows = np.concatenate([
            np.load(f"{root}/PointNetGPD/data/ycb_grasp/train/{o}.npy")
            for o in meta["objects"]])
        score = rows[:, -2] + 0.01 * rows[:, -1]
        labels = np.where(score >= 1.2, 0, np.where(score <= 0.5, 2, 1))
        assert len(np.unique(labels)) >= 2

    @requires_reference
    def test_reference_dataset_class_reads_it(self, mini_dataset):
        """The reference's PointGraspOneViewMultiClassDataset must consume
        our generated tree and produce (750, pts) samples whose labels match
        labels_from_scores on the same rows."""
        root, meta = mini_dataset
        dataset_mod, _ = parity._load_reference_modules(root)
        ds = dataset_mod.PointGraspOneViewMultiClassDataset(
            grasp_points_num=200, grasp_amount_per_file=meta["n_train"],
            thresh_good=0.5, thresh_bad=1.2, tag="train", with_obj=True)
        assert len(ds) == len(meta["objects"]) * meta["n_train"]
        got = 0
        for i in range(len(ds)):
            item = ds[i]
            if item is None:  # crop < 50 points: the reference drops it
                continue
            pc, label, obj = item
            assert pc.shape == (3, 200)
            assert label in (0, 1, 2)
            # label must match the row's score columns
            obj_ind, grasp_ind = np.unravel_index(
                i, (len(ds.object), meta["n_train"]))
            row = np.load(ds.d_grasp[ds.object[obj_ind]])[grasp_ind]
            score = row[-2] + 0.01 * row[-1]
            want = 0 if score >= 1.2 else (2 if score <= 0.5 else 1)
            assert label == want
            got += 1
        assert got >= len(ds) // 2  # most crops must survive


class TestParityObjectRegistry:
    """The v2 10-object registry (7 analytic + 3 mesh-voxelized through
    ops/mesh_to_sdf): every sampler's surface points must sit on the SDF
    zero level with gradient-aligned normals — the contract both the grasp
    labeler (close_fingers steps the SDF) and the view generator
    (camera-visibility filter uses the normals) rely on."""

    def test_registry_has_ten_objects_incl_meshes(self):
        assert len(parity.PARITY_OBJECTS) >= 10
        assert sum(1 for n in parity.PARITY_OBJECTS if n.endswith("_mesh")) >= 3

    @pytest.mark.parametrize("name", ["parity_capsule", "parity_box_flat",
                                      "parity_torus_mesh",
                                      "parity_cone_mesh"])
    def test_sampler_matches_sdf(self, name):
        import jax.numpy as jnp

        from pointnetgpd_tpu.geometry import sdf as sdf_lib

        build, sampler = parity.PARITY_OBJECTS[name]
        sdf = build(40, 0.0032)
        rng = np.random.RandomState(0)
        pts, nrm = sampler(rng, 150)
        coords = sdf_lib.world_to_grid(sdf, jnp.asarray(pts, jnp.float32))
        sd = np.abs(np.asarray(sdf_lib.signed_distance(sdf, coords)))
        assert sd.max() < 2e-3, f"{name}: surface points off the SDF zero"
        g = np.asarray(sdf_lib.gradient(sdf, coords))
        g = g / np.maximum(np.linalg.norm(g, axis=1, keepdims=True), 1e-9)
        dots = np.sum(g * nrm, axis=1)
        assert (dots > 0).mean() > 0.97, f"{name}: normals misoriented"
        assert dots.mean() > 0.9, f"{name}: normals noisy vs gradient"


@pytest.mark.slow
class TestParityTrainers:
    def test_ours_runs_and_learns(self, mini_dataset):
        root, meta = mini_dataset
        hist = parity.train_ours(
            root, epochs=2, batch_size=16, num_points=128,
            cloud_points=meta["points_per_view"], seed=0,
            steps_per_epoch=4)
        assert len(hist["test_acc"]) == 2
        assert all(np.isfinite(hist["train_loss"]))
        assert 0.0 <= hist["test_acc"][-1] <= 1.0

    @requires_reference
    def test_reference_runs(self, mini_dataset):
        root, meta = mini_dataset
        hist = parity.train_reference(
            root, epochs=1, batch_size=16, num_points=128,
            grasp_amount_train=meta["n_train"],
            grasp_amount_test=meta["n_test"], seed=0, num_workers=0)
        assert len(hist["test_acc"]) == 1
        assert np.isfinite(hist["train_loss"][0])


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-v", "-m", ""]))
