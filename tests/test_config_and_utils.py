"""Config system, quality config/function factories, graspable container,
camera RVs, profiling utilities."""

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, requires_reference


class TestYamlConfig:
    def test_parse_dict_and_attrs(self, tmp_path):
        from pointnetgpd_tpu.utils.config import YamlConfig

        cfg = YamlConfig({"a": 1, "nested": {"b": 2.5}})
        assert cfg.a == 1 and cfg["nested"]["b"] == 2.5

    @requires_reference
    def test_parse_reference_config(self):
        """The reference's own sampler/metric config must parse."""
        from pointnetgpd_tpu.utils.config import YamlConfig

        cfg = YamlConfig(f"{REFERENCE_ROOT}/dex-net/test/config.yaml")
        assert cfg["sampling_friction_coef"] == 2.0
        assert cfg["num_cone_faces"] == 8
        m = cfg["metrics"]["robust_ferrari_canny"]
        assert m["quality_method"] == "ferrari_canny_L1_force_only"
        assert m["grasp_uncertainty"]["sigma_grasp_trans_x"] == 0.005

    def test_mini_yaml_fallback(self, tmp_path):
        from pointnetgpd_tpu.utils.config import _mini_yaml

        p = tmp_path / "c.yaml"
        p.write_text("a: 1\nb: 2.5  # comment\nnest:\n  x: true\n  y: [1, 2]\n")
        cfg = _mini_yaml(str(p))
        assert cfg == {"a": 1, "b": 2.5, "nest": {"x": True, "y": [1, 2]}}


class TestQualityConfigs:
    def _quasi(self):
        return {"quality_method": "force_closure", "friction_coef": 0.5,
                "num_cone_faces": 8, "soft_fingers": 0,
                "quality_type": "quasi_static", "check_approach": False,
                "all_contacts_required": 1}

    def test_factory_and_validation(self):
        from pointnetgpd_tpu.grasping.quality_config import (
            GraspQualityConfigFactory,
            QuasiStaticGraspQualityConfig,
        )

        cfg = GraspQualityConfigFactory.create_config(self._quasi())
        assert isinstance(cfg, QuasiStaticGraspQualityConfig)
        assert cfg.friction_coef == 0.5
        with pytest.raises(ValueError):
            GraspQualityConfigFactory.create_config({"quality_method": "x"})

    def test_quality_function_matches_raw_metric(self):
        """Wrapper == raw metric (grasping_test.py:235-258 idea)."""
        import jax.numpy as jnp

        from pointnetgpd_tpu.geometry.sdf import make_sdf
        from pointnetgpd_tpu.grasping.evaluation import evaluate_force_closure
        from pointnetgpd_tpu.grasping.quality_config import (
            GraspQualityConfigFactory,
            GraspQualityFunctionFactory,
        )

        DIM, RES, R = 40, 0.005, 0.06
        origin = -RES * (DIM - 1) / 2 * np.ones(3)
        ii, jj, kk = np.meshgrid(*(np.arange(DIM),) * 3, indexing="ij")
        pts = origin + RES * np.stack([ii, jj, kk], axis=-1)
        sphere = make_sdf(np.linalg.norm(pts, axis=-1) - R, origin, RES)

        configs = np.zeros((3, 10), np.float32)
        configs[:, 3:6] = [0, 1, 0]
        configs[:, 6] = 0.18
        configs[1, 0:3] = [0.2, 0.2, 0.2]  # off-object: no contacts

        cfg = GraspQualityConfigFactory.create_config(self._quasi())
        fn = GraspQualityFunctionFactory.create_quality_function(
            sphere, np.zeros(3), cfg)
        results = fn(configs)
        raw, _ = evaluate_force_closure(sphere, jnp.asarray(configs), 0.5)
        for r, v in zip(results, np.asarray(raw)):
            assert r.quality == float(v)

    def test_robust_quality_function(self):
        from pointnetgpd_tpu.geometry.sdf import make_sdf
        from pointnetgpd_tpu.grasping.quality_config import (
            GraspQualityConfigFactory,
            GraspQualityFunctionFactory,
        )

        DIM, RES, R = 32, 0.006, 0.06
        origin = -RES * (DIM - 1) / 2 * np.ones(3)
        ii, jj, kk = np.meshgrid(*(np.arange(DIM),) * 3, indexing="ij")
        pts = origin + RES * np.stack([ii, jj, kk], axis=-1)
        sphere = make_sdf(np.linalg.norm(pts, axis=-1) - R, origin, RES)

        config = {"quality_method": "ferrari_canny_L1_force_only",
                  "friction_coef": 0.5, "num_cone_faces": 8, "soft_fingers": 0,
                  "quality_type": "robust_quasi_static",
                  "check_approach": False, "all_contacts_required": 1,
                  "grasp_uncertainty": {}, "obj_uncertainty": {},
                  "params_uncertainty": {}, "num_quality_samples": 4}
        cfg = GraspQualityConfigFactory.create_config(config)
        fn = GraspQualityFunctionFactory.create_quality_function(
            sphere, np.zeros(3), cfg)
        g = np.zeros(10, np.float32)
        g[3:6] = [0, 1, 0]
        g[6] = 0.18
        res = fn(g)[0]
        assert res.quality >= 0 and np.isfinite(res.uncertainty)


class TestGraspableObject:
    def test_container(self):
        from pointnetgpd_tpu.geometry.mesh import Mesh3D
        from pointnetgpd_tpu.geometry.sdf import make_sdf
        from pointnetgpd_tpu.grasping.graspable_object import GraspableObject3D

        from test_mesh import unit_cube

        mesh = Mesh3D(unit_cube().vertices * 0.1, unit_cube().triangles)
        data = np.ones((8, 8, 8), np.float32)
        sdf = make_sdf(data - 0.5, np.zeros(3), 0.0125)
        obj = GraspableObject3D(sdf, mesh, key="cube", mass=0.3)
        np.testing.assert_allclose(obj.moment_arm([0.1, 0.1, 0.1]),
                                   [0.05, 0.05, 0.05], atol=1e-9)
        big = obj.rescale(2.0)
        assert big.mesh.max_dim() == pytest.approx(0.2)


class TestCameraRVs:
    def test_viewsphere_rv(self):
        from pointnetgpd_tpu.render.random_variables import (
            UniformViewsphereRandomVariable,
        )

        rv = UniformViewsphereRandomVariable(0.5, 1.0)
        poses = rv.sample(10, np.random.RandomState(0))
        assert len(poses) == 10
        for t, center in poses:
            r = np.linalg.norm(center)
            assert 0.5 <= r <= 1.0
            assert t.shape == (4, 4)

    def test_rendered_image_rv(self):
        from pointnetgpd_tpu.geometry.mesh import Mesh3D
        from pointnetgpd_tpu.render import CameraIntrinsics
        from pointnetgpd_tpu.render.random_variables import (
            RenderedImageRandomVariable,
            UniformViewsphereRandomVariable,
        )

        from test_mesh import unit_cube

        mesh = Mesh3D(unit_cube().vertices - 0.5, unit_cube().triangles)
        rv = RenderedImageRandomVariable(
            mesh, CameraIntrinsics(100, 100, 16, 16, 32, 32),
            UniformViewsphereRandomVariable(2.0, 2.5))
        ims = rv.sample(3, np.random.RandomState(1))
        assert len(ims) == 3 and all(im.shape == (32, 32) for im in ims)


class TestProfiling:
    def test_stage_timer(self):
        import time

        from pointnetgpd_tpu.utils.profiling import StageTimer

        t = StageTimer()
        with t.stage("a"):
            time.sleep(0.01)
        with t.stage("a"):
            time.sleep(0.01)
        s = t.summary()
        assert s["a"]["calls"] == 2
        assert s["a"]["mean_ms"] >= 9
        assert "a" in t.report()
