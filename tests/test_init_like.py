"""init_like: the zero-XLA numpy initialiser used by bench.py's cold-start
path (CAT_TPU_HOST_INIT=1) must be a drop-in for the real init — identical
pytree structure, shapes and dtypes — with the documented fill rules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cat_tpu.core.config import InceptionGeneratorConfig, NormConfig
from cat_tpu.models.generator import InceptionGenerator
from cat_tpu.train.common import init_like


@pytest.fixture(scope="module")
def small_cfg():
    return InceptionGeneratorConfig.make(
        ngf=8,
        channels=None,
        channels_reduction_factor=6,
        kernel_sizes=(1, 3),
        n_blocks=2,
        norm=NormConfig(kind="instance", affine=True, track_running_stats=False),
    )


def test_structure_shapes_dtypes_match_real_init(small_cfg):
    net = InceptionGenerator(small_cfg)
    x = jnp.zeros((1, 32, 32, 3))
    rng = np.array([0, 7], dtype=np.uint32)
    real = net.init(rng, x)
    fast = init_like(lambda: net.init(rng, x))
    real_flat = jax.tree_util.tree_flatten_with_path(real)[0]
    fast_flat = jax.tree_util.tree_flatten_with_path(fast)[0]
    assert jax.tree_util.tree_structure(real) == jax.tree_util.tree_structure(fast)
    for (pr, lr), (pf, lf) in zip(real_flat, fast_flat):
        assert pr == pf
        assert tuple(lr.shape) == tuple(lf.shape), pr
        assert jnp.asarray(lr).dtype == np.asarray(lf).dtype, pr


def test_fill_rules(small_cfg):
    net = InceptionGenerator(small_cfg)
    x = jnp.zeros((1, 32, 32, 3))
    rng = np.array([0, 7], dtype=np.uint32)
    fast = init_like(lambda: net.init(rng, x))
    kernels, scales, biases = [], [], []
    for path, leaf in jax.tree_util.tree_flatten_with_path(fast)[0]:
        name = str(getattr(path[-1], "name", getattr(path[-1], "key", ""))).lower()
        if name == "kernel":
            kernels.append(np.asarray(leaf))
        elif name == "scale":
            scales.append(np.asarray(leaf))
        elif name == "bias":
            biases.append(np.asarray(leaf))
    assert kernels and scales and biases
    # norm scales start at one, biases at zero (reference init_weights)
    assert all((s == 1.0).all() for s in scales)
    assert all((b == 0.0).all() for b in biases)
    # kernels ~ N(0, 0.02²): check the pooled std within 15%
    pooled = np.concatenate([k.ravel() for k in kernels])
    assert abs(pooled.std() - 0.02) < 0.003
    assert abs(pooled.mean()) < 0.002


def test_optimizer_moments_zero(small_cfg):
    import optax

    net = InceptionGenerator(small_cfg)
    x = jnp.zeros((1, 32, 32, 3))
    rng = np.array([0, 7], dtype=np.uint32)
    tx = optax.adam(2e-4, b1=0.5)

    def build():
        params = net.init(rng, x)["params"]
        return params, tx.init(params)

    params, opt = init_like(build)
    moments = [
        np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(opt)[0]
        if any(str(getattr(p, "name", "")) in ("mu", "nu") for p in path)
    ]
    assert moments
    assert all((m == 0.0).all() for m in moments)
    # while params kernels are NOT zero
    assert np.asarray(params["model"]["conv_in"]["conv"]["kernel"]).std() > 0 \
        if "model" in params else True


def test_env_gate_routes_init_on_cpu(small_cfg, monkeypatch):
    from cat_tpu.train.common import init_on_cpu

    net = InceptionGenerator(small_cfg)
    x = jnp.zeros((1, 16, 16, 3))
    rng = np.array([0, 7], dtype=np.uint32)
    monkeypatch.setenv("CAT_TPU_HOST_INIT", "1")
    fast = init_on_cpu(lambda: net.init(rng, x))
    # numpy leaves, not jax arrays: proof no XLA program ran
    leaves = jax.tree_util.tree_leaves(fast)
    assert all(isinstance(l, np.ndarray) for l in leaves)


def test_init_on_cpu_jit_path_with_static_shape_args(small_cfg, monkeypatch):
    """On a non-CPU default backend init_on_cpu traces the init into ONE
    program.  Shape args (Python ints) must be closed over as static —
    traced, jnp.zeros((1, h, w, c)) would raise and the code would silently
    fall back to the eager per-op dispatch storm the path exists to avoid.
    Force the jit branch on the CPU backend and require it to produce the
    exact eager result, with the fallback disabled."""
    from cat_tpu.train import common

    net = InceptionGenerator(small_cfg)
    saw_tracer = []

    def build(rng, height, width):
        # height/width must arrive static (Python ints), rng as a tracer —
        # proof the jit branch ran instead of the eager fallback
        assert isinstance(height, int) and isinstance(width, int)
        saw_tracer.append(isinstance(rng, jax.core.Tracer))
        return net.init(rng, jnp.zeros((1, height, width, 3)))

    rng = jax.random.PRNGKey(3)
    eager = build(rng, 32, 32)

    monkeypatch.setattr(common.jax, "default_backend", lambda: "tpu")
    jitted = common.init_on_cpu(build, rng, 32, 32)
    assert any(saw_tracer), "init_on_cpu fell back to eager dispatch"
    # same math up to jit fusion reassociation (~1e-9)
    for a, b in zip(jax.tree.leaves(eager), jax.tree.leaves(jitted)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
