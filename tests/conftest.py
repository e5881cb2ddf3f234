"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding tests run on CPU via
``xla_force_host_platform_device_count`` (the TPU-world substitute for the
fake-cluster fixtures the reference lacks — SURVEY.md §4).

Must set env vars before jax initializes a backend, hence module level.
"""

import os

# NOTE: the axon TPU plugin ignores JAX_PLATFORMS=cpu; jax_platform_name
# is the knob that actually selects the host backend under it. Env vars
# alone are insufficient here because pytest plugins (jaxtyping) import
# jax before this conftest — but the backend is not initialized yet, so
# jax.config.update still takes effect.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ.pop("JAX_PLATFORMS", None)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def cpu_mesh():
    import jax

    return jax.make_mesh((8,), ("data",))
