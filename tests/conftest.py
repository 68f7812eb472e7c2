"""Test configuration.

Tests run on a virtual 8-device CPU mesh (no TPU needed in CI): the env vars
must be set before the first jax import, hence this conftest. Sharding /
collective logic is validated here exactly as it will run on a real v5e-8;
the driver's dryrun_multichip does the same via __graft_entry__.py.
"""

import os

# deterministic auth for API tests (must precede tpu_vector_db imports)
os.environ.setdefault("VECTOR_DB_API_KEY", "tvdb_test_api_key_0123456789abc")
os.environ.setdefault("VECTOR_DB_ADMIN_KEY", "tvdb_admin_test_key_0123456789")

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The host env pins a TPU platform plugin (JAX_PLATFORMS=axon) that ignores
# the env override, so force the CPU backend through the config API.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def tmp_store_path(tmp_path):
    return tmp_path / "store"
