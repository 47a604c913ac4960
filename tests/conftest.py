"""Test configuration: force an 8-device virtual CPU platform BEFORE jax is
imported, so multi-chip sharding (pjit/shard_map over a Mesh) is testable
without TPU hardware."""
import os

# Force CPU: the shell environment pre-sets JAX_PLATFORMS=axon (the real TPU
# tunnel) and a sitecustomize imports jax at interpreter startup, so the env
# var alone is captured too early — update jax.config directly as well. Tests
# must run on the virtual multi-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.device_count() >= 8, (
    "expected 8 virtual CPU devices; the TPU backend was initialized before "
    "conftest could force the CPU platform"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
