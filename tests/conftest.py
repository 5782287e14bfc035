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
