"""Database tests, modeled on the reference suite
(dex-net/test/database_test.py: illegal create, full CRUD round-trip of
graspables with mesh+SDF+stable poses, grasps and metrics), plus the
mesh->SDF voxelizer against analytic solids."""

import numpy as np
import pytest

from pointnetgpd_tpu.database import (
    READ_ONLY_ACCESS,
    READ_WRITE_ACCESS,
    Hdf5Database,
    MeshProcessor,
)
from pointnetgpd_tpu.geometry.mesh import Mesh3D
from pointnetgpd_tpu.geometry.sdf import make_sdf

from test_mesh import unit_cube


@pytest.fixture()
def sphere_sdf():
    DIM, RES, R = 24, 0.01, 0.08
    origin = -RES * (DIM - 1) / 2 * np.ones(3)
    ii, jj, kk = np.meshgrid(*(np.arange(DIM),) * 3, indexing="ij")
    pts = origin + RES * np.stack([ii, jj, kk], axis=-1)
    return make_sdf(np.linalg.norm(pts, axis=-1) - R, origin, RES)


class TestHdf5Database:
    def test_illegal_create_fails(self, tmp_path):
        """(database_test.py:61)."""
        with pytest.raises(ValueError):
            Hdf5Database(str(tmp_path / "db.h5"), READ_WRITE_ACCESS)  # bad ext
        with pytest.raises(ValueError):
            Hdf5Database(str(tmp_path / "missing.hdf5"), READ_ONLY_ACCESS)

    def test_full_crud_roundtrip(self, tmp_path, sphere_sdf):
        """(database_test.py:70+): create db/dataset, graspable with
        mesh+sdf+stable poses, grasps with metrics; reload and verify."""
        path = str(tmp_path / "test.hdf5")
        db = Hdf5Database(path, READ_WRITE_ACCESS)
        ds = db.create_dataset("ycb")
        mesh = unit_cube()
        poses = mesh.stable_poses()
        ds.create_graspable("cube", mesh=mesh, sdf=sphere_sdf,
                            stable_poses=poses, mass=0.5, category="box")
        assert "cube" in ds and ds.num_objects == 1

        rng = np.random.RandomState(0)
        configs = rng.rand(10, 10)
        metrics = {"robust_ferrari_canny": rng.rand(10),
                   "force_closure": rng.randint(0, 2, 10).astype(float)}
        ds.store_grasps("cube", configs, gripper="robotiq_85",
                        metrics=metrics)
        ds.create_metric("robust_ferrari_canny",
                         {"quality_method": "ferrari_canny_L1_force_only",
                          "num_cone_faces": 8,
                          "grasp_uncertainty": {"sigma_grasp_trans_x": 0.005}})
        db.flush()
        db.close()

        db2 = Hdf5Database(path, READ_ONLY_ACCESS)
        ds2 = db2.dataset("ycb")
        assert ds2.object_keys == ["cube"]
        m2 = ds2.mesh("cube")
        np.testing.assert_allclose(m2.vertices, mesh.vertices)
        np.testing.assert_array_equal(m2.triangles, mesh.triangles)
        s2 = ds2.sdf("cube")
        np.testing.assert_allclose(np.asarray(s2.data),
                                   np.asarray(sphere_sdf.data), atol=1e-6)
        assert ds2.mass("cube") == 0.5
        assert ds2.category("cube") == "box"
        p2 = ds2.stable_poses("cube")
        assert len(p2) == len(poses)
        np.testing.assert_allclose(p2[0]["r"], poses[0]["r"])
        np.testing.assert_allclose(ds2.grasps("cube", "robotiq_85"), configs)
        got = ds2.grasp_metrics("cube", "robotiq_85")
        np.testing.assert_allclose(got["robust_ferrari_canny"],
                                   metrics["robust_ferrari_canny"])
        metric = ds2.metric("robust_ferrari_canny")
        assert metric["quality_method"] == "ferrari_canny_L1_force_only"
        assert metric["grasp_uncertainty"]["sigma_grasp_trans_x"] == 0.005
        db2.close()

    def test_grasp_overwrite_protection(self, tmp_path):
        db = Hdf5Database(str(tmp_path / "t.hdf5"), READ_WRITE_ACCESS)
        ds = db.create_dataset("d")
        ds.create_graspable("o")
        ds.store_grasps("o", np.zeros((2, 10)))
        with pytest.raises(ValueError):
            ds.store_grasps("o", np.zeros((2, 10)))
        ds.store_grasps("o", np.ones((3, 10)), force_overwrite=True)
        assert len(ds.grasps("o")) == 3
        db.close()


class TestMeshToSdf:
    def test_cube_sdf_signs_and_values(self):
        from pointnetgpd_tpu.geometry.sdf import signed_distance, world_to_grid
        from pointnetgpd_tpu.ops.mesh_to_sdf import mesh_to_sdf
        import jax.numpy as jnp

        mesh = unit_cube()
        sdf = mesh_to_sdf(mesh, dim=40, padding=4)
        # center is inside with distance ~0.5 to the nearest face
        center = world_to_grid(sdf, jnp.asarray([[0.5, 0.5, 0.5]]))
        v_center = float(signed_distance(sdf, center)[0])
        assert v_center < 0
        np.testing.assert_allclose(-v_center, 0.5, atol=2 * float(sdf.resolution))
        # outside point: positive, correct distance to the surface
        outside = world_to_grid(sdf, jnp.asarray([[1.3, 0.5, 0.5]]))
        v_out = float(signed_distance(sdf, outside)[0])
        np.testing.assert_allclose(v_out, 0.3, atol=2 * float(sdf.resolution))
        # surface points found
        assert sdf.surface_points.shape[0] > 100

    def test_sphere_mesh_sdf_matches_analytic(self):
        from pointnetgpd_tpu.ops.mesh_to_sdf import mesh_to_sdf

        # icosphere from subdivided octahedron
        v = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                      [0, 0, 1], [0, 0, -1]], float)
        f = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                      [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int32)
        m = Mesh3D(v, f).subdivide().subdivide().subdivide()
        R = 0.06
        m = Mesh3D(R * m.vertices / np.linalg.norm(m.vertices, axis=1,
                                                   keepdims=True),
                   m.triangles)
        sdf = mesh_to_sdf(m, dim=32, padding=3)
        data = np.asarray(sdf.data)
        origin = np.asarray(sdf.origin)
        res = float(sdf.resolution)
        ii, jj, kk = np.meshgrid(*(np.arange(32),) * 3, indexing="ij")
        pts = origin + res * np.stack([ii, jj, kk], axis=-1)
        analytic = np.linalg.norm(pts, axis=-1) - R
        # mesh is a polyhedral approximation: tolerance ~ facet sag + res
        assert np.abs(data - analytic).max() < 3 * res


class TestMeshProcessor:
    def test_pipeline(self, tmp_path):
        from pointnetgpd_tpu.geometry.io import write_obj

        mesh = unit_cube().rescale(0.08)
        src = str(tmp_path / "cube.obj")
        write_obj(src, mesh.vertices, mesh.triangles)
        proc = MeshProcessor(src, cache_dir=str(tmp_path / "cache"))
        m, sdf, poses = proc.generate_graspable(
            {"sdf_dim": 32, "sdf_padding": 3, "obj_target_scale": 0.1,
             "obj_rescaling_type": "max"})
        assert m.max_dim() == pytest.approx(0.1)
        assert sdf.data.shape == (32, 32, 32)
        assert len(poses) == 6
        # cached files written
        import os

        assert os.path.exists(proc.obj_filename)
        assert os.path.exists(proc.sdf_filename)


class TestExtendedStorage:
    def test_convex_pieces_and_rendered_images(self, tmp_path):
        db = Hdf5Database(str(tmp_path / "x.hdf5"), READ_WRITE_ACCESS)
        ds = db.create_dataset("d")
        ds.create_graspable("o")
        cube = unit_cube()
        ds.store_convex_pieces("o", [cube, cube.rescale(0.5)])
        pieces = ds.convex_pieces("o")
        assert len(pieces) == 2
        assert pieces[1].volume() == pytest.approx(0.125)

        ims = [np.random.RandomState(i).rand(16, 16).astype(np.float32)
               for i in range(3)]
        ds.store_rendered_images("o", ims, stable_pose_id="pose_0")
        got, itype = ds.rendered_images("o", "pose_0")
        assert got.shape == (3, 16, 16) and itype == "depth"
        np.testing.assert_allclose(got[1], ims[1])

        ds.create_metadata("scale", {"type": "float"})
        assert ds.metadata_names == ["scale"]
        ds.set_object_metadata("o", "scale", 1.5)
        assert ds.object_metadata("o")["scale"] == 1.5
        db.close()
