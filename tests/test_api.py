"""API facade + interactive CLI tests: the full add-object -> compute-grasps
-> query/export lifecycle on a synthetic object."""

import os

import numpy as np
import pytest

from pointnetgpd_tpu.api import DexNet
from pointnetgpd_tpu.geometry.io import write_obj
from pointnetgpd_tpu.geometry.mesh import Mesh3D

from test_mesh import unit_cube


@pytest.fixture()
def sphere_obj(tmp_path):
    v = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                  [0, 0, 1], [0, 0, -1]], float)
    f = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                  [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int32)
    m = Mesh3D(v, f).subdivide().subdivide()
    m = Mesh3D(0.05 * m.vertices / np.linalg.norm(m.vertices, axis=1,
                                                  keepdims=True), m.triangles)
    path = str(tmp_path / "sphere.obj")
    write_obj(path, m.vertices, m.triangles)
    return path


class TestDexNetApi:
    def test_lifecycle(self, tmp_path, sphere_obj):
        api = DexNet({"sdf_dim": 32, "sdf_padding": 3, "grasps_per_class": 2,
                      "cache_dir": str(tmp_path / "cache"),
                      "obj_rescaling_type": "relative"})
        api.open_database(str(tmp_path / "db.hdf5"))
        api.open_dataset("test")
        key = api.add_object(sphere_obj)
        assert key == "sphere"
        assert api.list_objects() == ["sphere"]

        rows, counts = api.compute_simulation_data(key, seed=0)
        assert len(rows) > 0
        configs, metrics = api.get_grasps(key)
        assert len(configs) == len(rows)
        assert "robust_ferrari_canny" in metrics
        assert (metrics["robust_ferrari_canny"] >= 0).all()

        paths = api.export_objects(str(tmp_path / "out"))
        assert os.path.exists(paths[0])

        fig = api.display_object(key)
        fig.savefig(str(tmp_path / "obj.png"))
        assert os.path.getsize(str(tmp_path / "obj.png")) > 1000
        fig2 = api.display_grasps(key)
        assert fig2 is not None
        fig3 = api.display_stable_poses(key)
        assert fig3 is not None
        api.close_database()

        # reopen and verify persistence
        api2 = DexNet()
        api2.open_database(str(tmp_path / "db.hdf5"))
        api2.open_dataset("test", create_ds=False)
        configs2, _ = api2.get_grasps(key)
        np.testing.assert_allclose(configs2, configs)
        api2.close_database()

    def test_errors(self, tmp_path):
        api = DexNet()
        with pytest.raises(RuntimeError):
            api.open_dataset("x")
        with pytest.raises(ValueError):
            api.open_database(str(tmp_path / "bad.txt"))


class TestCli:
    def test_scripted_session(self, tmp_path, sphere_obj):
        from pointnetgpd_tpu.cli.dexnet_cli import DexNetCli

        cli = DexNetCli()
        cli.api.config.update({"sdf_dim": 32, "sdf_padding": 3,
                               "grasps_per_class": 1,
                               "cache_dir": str(tmp_path / "cache")})
        db = str(tmp_path / "cli.hdf5")
        png = str(tmp_path / "sphere.png")
        cli.run(script=[
            f"open_database {db}",
            "open_dataset main",
            f"add_object {sphere_obj}",
            "list_objects",
            "compute_grasps sphere",
            "show_grasps sphere",
            f"display_object sphere {png}",
            "unknown_command",     # must not crash
            "quit",
        ])
        assert os.path.exists(db)
        assert os.path.exists(png)
