"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding tests run on CPU via
``xla_force_host_platform_device_count`` (the TPU-world substitute for the
fake-cluster fixtures the reference lacks — SURVEY.md §4).

Must set env vars before jax initializes a backend, hence module level.
"""

import os

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def cpu_mesh():
    import jax

    return jax.make_mesh((8,), ("data",))
