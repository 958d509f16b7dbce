"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on CPU via
``xla_force_host_platform_device_count`` (real multi-chip hardware is not
available in CI); Pallas kernels run in interpreter mode on CPU.

NOTE: this environment preimports jax at interpreter startup (TPU tunnel), so
env vars alone are too late — `jax.config.update` is required to force the
platform before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.default_backend() == "cpu", jax.default_backend()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running gates (big-shape memory analysis, campaign fixtures)")
