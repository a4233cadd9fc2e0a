"""Test harness: force an 8-virtual-device CPU backend before JAX loads.

Multi-chip sharding logic is validated on a host-platform device mesh
(the idiomatic JAX replacement for the reference's absent distributed tests —
SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU default
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# jax may already be imported by the environment's sitecustomize, in which
# case JAX_PLATFORMS was latched at interpreter startup — override via config
# (the backend itself is initialised lazily, so this still takes effect).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(233)  # the reference's default seed
