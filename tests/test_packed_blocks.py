"""Branch-packed inception blocks: identical math, identical param tree.

The packed path (blocks.py InceptionBlock.packed) evaluates every branch's
"in" conv as one wide conv (kernels zero-padded to the largest k), the dw
stage as one grouped conv, and every "out" conv as one conv emitting the
branch sum.  These tests pin the contract that lets checkpoints and pruning
move freely between the two paths.
"""

import jax
import jax.numpy as jnp
import pytest

from cat_tpu.core.config import InceptionGeneratorConfig, NormConfig
from cat_tpu.models.blocks import InceptionBlock
from cat_tpu.models.generator import InceptionGenerator


def _cfg(**kw):
    kw.setdefault("ngf", 16)
    kw.setdefault("channels", None)
    kw.setdefault("channels_reduction_factor", 6)
    kw.setdefault("kernel_sizes", (1, 3, 5))
    kw.setdefault("n_blocks", 2)
    kw.setdefault(
        "norm", NormConfig(kind="instance", affine=True, track_running_stats=False)
    )
    return InceptionGeneratorConfig.make(**kw)


def _block(cfg, packed):
    return InceptionBlock(
        cfg.blocks[0],
        norm=cfg.norm,
        padding_type=cfg.padding_type,
        active_fn=cfg.active_fn,
        use_bias=True,
        packed=packed,
    )


def test_block_same_param_tree_and_init_values():
    cfg = _cfg()
    x = jnp.zeros((1, 8, 8, cfg.blocks[0].dim))
    v_plain = _block(cfg, False).init(jax.random.PRNGKey(7), x)
    v_packed = _block(cfg, True).init(jax.random.PRNGKey(7), x)
    flat_a = jax.tree_util.tree_leaves_with_path(v_plain)
    flat_b = jax.tree_util.tree_leaves_with_path(v_packed)
    assert [jax.tree_util.keystr(p) for p, _ in flat_a] == [
        jax.tree_util.keystr(p) for p, _ in flat_b
    ]
    for (_, a), (_, b) in zip(flat_a, flat_b):
        assert a.shape == b.shape
        assert jnp.allclose(a, b), "same rng must give identical init values"


@pytest.mark.parametrize("affine", [True, False])
def test_block_forward_parity(affine):
    cfg = _cfg(norm=NormConfig(kind="instance", affine=affine, track_running_stats=False))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, cfg.blocks[0].dim))
    v = _block(cfg, False).init(jax.random.PRNGKey(0), x)
    ref = _block(cfg, False).apply(v, x)
    got = _block(cfg, True).apply(v, x)
    assert jnp.max(jnp.abs(ref - got)) < 2e-4


def test_block_gradient_parity():
    cfg = _cfg()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, cfg.blocks[0].dim))
    v = _block(cfg, False).init(jax.random.PRNGKey(0), x)

    def loss(params, packed):
        y = _block(cfg, packed).apply({"params": params}, x)
        return jnp.sum(jnp.square(y))

    from jax.flatten_util import ravel_pytree

    g_plain = jax.grad(loss)(v["params"], False)
    g_packed = jax.grad(loss)(v["params"], True)
    flat_a, _ = ravel_pytree(g_plain)
    flat_b, _ = ravel_pytree(g_packed)
    assert jnp.max(jnp.abs(flat_a - flat_b)) < 5e-3 * (1 + jnp.max(jnp.abs(flat_a)))


def test_generator_forward_parity_with_taps():
    cfg = _cfg()
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    plain = InceptionGenerator(cfg)
    packed = InceptionGenerator(cfg, packed_blocks=True)
    v = plain.init(jax.random.PRNGKey(0), x)
    y0, acts0 = plain.apply(v, x, taps=("encode", "block1"))
    y1, acts1 = packed.apply(v, x, taps=("encode", "block1"))
    assert jnp.max(jnp.abs(y0 - y1)) < 2e-4
    for k in acts0:
        assert jnp.max(jnp.abs(acts0[k] - acts1[k])) < 2e-4


def test_pruned_heterogeneous_block_parity():
    """Packed path must survive pruned widths incl. dropped branches."""
    import dataclasses

    cfg = _cfg()
    b0 = cfg.blocks[0]
    pruned = dataclasses.replace(
        b0,
        res_channels=(7, 0, 13),  # middle branch pruned away entirely
        dw_channels=(0, 5, 0),
    )
    norm = cfg.norm
    kw = dict(norm=norm, padding_type=cfg.padding_type, active_fn=cfg.active_fn,
              use_bias=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, b0.dim))
    v = InceptionBlock(pruned, packed=False, **kw).init(jax.random.PRNGKey(0), x)
    ref = InceptionBlock(pruned, packed=False, **kw).apply(v, x)
    got = InceptionBlock(pruned, packed=True, **kw).apply(v, x)
    assert jnp.max(jnp.abs(ref - got)) < 2e-4


def test_subpixel_conv_transpose_parity():
    """subpixel ConvTranspose2d == dilated (identical math, k3 s2 p1 op1)."""
    from cat_tpu.ops.nn import ConvTranspose2d

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 9, 7, 12))
    a = ConvTranspose2d(features=10, impl="dilated")
    b = ConvTranspose2d(features=10, impl="subpixel")
    v = a.init(jax.random.PRNGKey(0), x)
    ya = a.apply(v, x)
    yb = b.apply(v, x)
    assert ya.shape == (2, 18, 14, 10)
    assert jnp.max(jnp.abs(ya - yb)) < 1e-5
