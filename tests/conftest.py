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
# Partitionable threefry: identical random values (verified), but the
# sampling kernels lower shape-polymorphically — flax ``Module.init``
# stops paying a fresh XLA:CPU compile per distinct param shape.  This
# alone cut the worst init-bound tests several-fold (the core lane is
# compile-bound, not logic-bound, on this 1-core host).
jax.config.update("jax_threefry_partitionable", True)

# The core lane's cost is thousands of sub-second XLA:CPU kernel compiles
# (flax init dispatches hundreds of tiny eager ops per model); the package
# default persistent cache only keeps >=1s compiles (cat_tpu/__init__.py).
# For tests, cache EVERYTHING so re-runs on this host pay compile once.
import cat_tpu  # noqa: E402,F401  (wires the persistent cache first)

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

# Key the CPU-backend cache by a host fingerprint (see
# cat_tpu._host_keyed_cache_dir) — cross-host XLA:CPU AOT entries fail to
# load and silently recompile, slowing the whole lane several-fold.  The
# package init keys it when JAX_PLATFORMS=cpu (set above); this re-key is
# the belt-and-suspenders for any import-order variation (idempotent).
cat_tpu._rekey_cache_for_cpu()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(233)  # the reference's default seed


def fast_init(module, *args, seed: int = 0, **kwargs):
    """Zero-XLA flax init for compile-bound tests: exact variable tree
    (shapes/dtypes/structure) via eval_shape, numpy-filled with the same
    distribution family as the real init (train/common.init_like).  Use in
    tests that need *valid* parameters, not the exact threefry stream —
    slow-marked twins keep the real ``Module.init`` where stream identity
    is the assertion."""
    from cat_tpu.train.common import init_like

    return init_like(
        lambda: module.init(jax.random.PRNGKey(seed), *args, **kwargs),
        seed=seed,
    )
