"""Test configuration: CPU backend, float64, 8 virtual devices for sharding tests."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests always run on (virtual-8) CPU
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# Something may import jax before this conftest (pytest plugins), in which
# case the env vars above are too late — force via config as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
