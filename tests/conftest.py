"""Test configuration: force JAX onto a virtual 8-device CPU platform.

Multi-chip TPU hardware is not available in CI; sharding/collective tests run
against ``--xla_force_host_platform_device_count=8`` CPU devices instead.
Must run before the first ``import jax`` anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The TPU environment's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon, so the env vars above can come too late; force the
# config directly (must happen before any backend is initialized).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# fp32 matmuls everywhere: parity tests compare against torch fp32.
jax.config.update("jax_default_matmul_precision", "highest")
# x64 on (CPU tests only): geometry parity tests compare against numpy float64
# oracles. f32 arrays stay f32 under weak typing, so model parity is unaffected.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def has_reference():
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "PointNetGPD"))


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference repo not available as test oracle"
)


@pytest.fixture(scope="session")
def ref_pointnet():
    """Import the reference torch model definitions as a parity oracle."""
    import importlib.util

    path = os.path.join(REFERENCE_ROOT, "PointNetGPD", "model", "pointnet.py")
    spec = importlib.util.spec_from_file_location("_ref_pointnet", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="session")
def ref_gpd():
    import importlib.util

    path = os.path.join(REFERENCE_ROOT, "PointNetGPD", "model", "gpd.py")
    spec = importlib.util.spec_from_file_location("_ref_gpd", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def rng():
    return np.random.RandomState(0)


# ---------------------------------------------------------------------------
# Slow-test policy: the default run (`pytest -q`) must stay under ~3 minutes
# for iteration speed; the full suite runs with `pytest -m ''`. Tests that
# measured >5 s on the CI CPU platform (x64 + 8 virtual devices) are marked
# slow here, in one place, instead of scattering decorators. Names are
# matched as (filename, test-name-prefix) so parametrized ids stay covered.
# ---------------------------------------------------------------------------
_SLOW_TESTS = {
    ("test_imports.py", "test_end_to_end_demo_runs"),
    ("test_api.py", "test_lifecycle"),
    ("test_config_and_utils.py", "test_quality_function_matches_raw_metric"),
    ("test_config_and_utils.py", "test_robust_quality_function"),
    ("test_quality_extras.py", "test_perpendicular_table_points_down"),
    ("test_quality_extras.py", "test_aligned_grasps_perpendicular"),
    ("test_robot.py", "test_detector_accepts_gpd_scorer"),
    ("test_robot.py", "test_process_frame_end_to_end"),
    ("test_samplers.py", "test_sample_until_accumulates"),
    ("test_samplers.py", "test_sampled_grasps_are_force_closure"),
    ("test_samplers.py", "test_close_fingers_on_sphere"),
    ("test_samplers.py", "test_close_fingers_approach_collision"),
    ("test_samplers.py", "test_find_contact_on_sphere"),
    ("test_samplers.py", "test_uniform"),
    ("test_samplers.py", "test_gaussian"),
    ("test_samplers.py", "test_grasp_from_contact_and_axis"),
    ("test_samplers.py", "test_gpg_sdf_curvature_mode_executes"),
    ("test_samplers.py", "test_frames_deterministic"),
    ("test_samplers.py", "test_cylinder_minor_axis_is_rule_direction"),
    ("test_samplers.py", "test_box_scene_candidates"),
    ("test_training.py", "test_checkpoint_resume_round_trip"),
    ("test_training.py", "test_checkpoint_roundtrip"),
    ("test_training.py", "test_dp_matches_single_device"),
    ("test_training.py", "test_learnable_synthetic_accuracy_improves"),
    ("test_training.py", "test_fused_train_step_learns_on_dp_mesh"),
    ("test_training.py", "test_gpd_trainer_with_eval"),
    ("test_training.py", "test_all_masked_batch_keeps_params_finite"),
    ("test_learning.py", "test_expected_quality_on_sphere"),
    ("test_native_loader.py", "test_native_batcher_feeds_train_step"),
    ("test_tp.py", "test_tp_train_step_runs"),
    ("test_extras.py", "test_gpg_sdf"),
    ("test_extras.py", "test_random_box_unions_covered"),
    ("test_extras.py", "test_merge_pass_piece_counts"),
    ("test_golden_checkpoint.py", "test_scorer_runs_golden_checkpoint_end_to_end"),
    ("test_database.py", "test_sphere_mesh_sdf_matches_analytic"),
    ("test_database.py", "test_cube_sdf_signs_and_values"),
    ("test_mesh.py", "test_sdf_transform_dense"),
    ("test_scorer.py", "test_score_candidates_sharded_equals_unsharded"),
    ("test_scorer.py", "test_fused_matches_two_stage"),
    ("test_model_parity.py", "test_init_shapes_and_determinism"),
    ("test_model_parity.py", "test_batchnorm_train_mode_parity"),
    ("test_api.py", "test_scripted_session"),
    ("test_scorer.py", "test_gpd_candidates_scored"),
    ("test_scorer.py", "test_gpd_12_chann_and_empty"),
    ("test_extras.py", "test_point_sampler_biases_height"),
    ("test_extras.py", "test_l_shape_splits"),
    ("test_training.py", "test_pre_cropped_train_step"),
    ("test_samplers.py", "test_find_contact_miss"),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = item.path.name if hasattr(item, "path") else ""
        for f, prefix in _SLOW_TESTS:
            if fname == f and item.name.split("[")[0] == prefix:
                item.add_marker(pytest.mark.slow)
                break
