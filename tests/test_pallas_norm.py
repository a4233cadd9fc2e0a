"""Fused instance-norm(+act) Pallas kernel: parity with the XLA path."""

import jax.numpy as jnp
import numpy as np
import pytest

from cat_tpu.ops.pallas_norm import instance_norm_act, instance_norm_act_xla


@pytest.mark.parametrize("act", ["relu", "leaky_relu", "none"])
def test_pallas_instance_norm_parity(rng, act):
    x = jnp.asarray(rng.randn(3, 8, 8, 16), jnp.float32)
    scale = jnp.asarray(rng.rand(16) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(16), jnp.float32)
    ref = instance_norm_act_xla(x, scale, bias, act=act)
    got = instance_norm_act(x, scale, bias, act=act, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_vjp_matches_autodiff(rng):
    """Custom-VJP gradients equal autodiff of the XLA formulation."""
    import jax

    from cat_tpu.ops.pallas_norm import fused_instance_norm_act

    x = jnp.asarray(rng.randn(2, 6, 6, 8), jnp.float32)
    scale = jnp.asarray(rng.rand(8) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(8), jnp.float32)

    def loss_fused(x, s, b):
        return jnp.sum(fused_instance_norm_act(x, s, b) ** 2)

    def loss_ref(x, s, b):
        return jnp.sum(instance_norm_act_xla(x, s, b) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4,
                                   atol=1e-5)


def test_generator_fused_norms_parity(rng):
    """fused_norms=True produces the same outputs/params as the plain path
    (on CPU the fused op falls back to the XLA formulation)."""
    import jax

    from cat_tpu.core.config import InceptionGeneratorConfig, NormConfig
    from cat_tpu.models.generator import InceptionGenerator

    cfg = InceptionGeneratorConfig.make(
        ngf=4, channels=None, channels_reduction_factor=2, kernel_sizes=(1, 3),
        n_blocks=2, norm=NormConfig(kind="instance", affine=True),
    )
    x = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)
    plain = InceptionGenerator(cfg)
    fused = InceptionGenerator(cfg, fused_norms=True)
    v = plain.init(jax.random.PRNGKey(0), x)
    v2 = fused.init(jax.random.PRNGKey(0), x)
    # identical parameter trees (the fused path reuses the 'norm' scope)
    assert jax.tree.map(lambda a: a.shape, v) == jax.tree.map(lambda a: a.shape, v2)
    y1 = plain.apply(v, x)
    y2 = fused.apply(v, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5, atol=1e-5)


def test_pallas_norm_matches_norm2d(rng):
    """The fused kernel reproduces Norm2d(instance, affine) + relu."""
    import jax

    from cat_tpu.core.config import NormConfig
    from cat_tpu.ops.nn import Norm2d

    x = jnp.asarray(rng.randn(2, 6, 6, 8), jnp.float32)
    scale = jnp.asarray(rng.rand(8) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(8), jnp.float32)
    norm = Norm2d(NormConfig(kind="instance", affine=True))
    ref = jax.nn.relu(
        norm.apply({"params": {"scale": scale, "bias": bias}}, x)
    )
    got = instance_norm_act(x, scale, bias, act="relu", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_channel_tiled_with_masked_edge(rng, monkeypatch):
    """Force ctile < C with a non-divisible edge tile: statistics are
    per-(sample, channel), so tiling (incl. the masked padding lanes of the
    ceil-grid edge block) must be exact.  Partial tiles come only in
    128-channel units (Mosaic block constraint)."""
    import cat_tpu.ops.pallas_norm as pn

    # 2x2 plane -> 32 B/channel x2; budget 130 channels -> ctile 128 < C=140
    monkeypatch.setattr(pn, "_VMEM_BUDGET", 2 * 2 * 4 * 2 * 130)
    x = jnp.asarray(rng.randn(2, 2, 2, 140), jnp.float32)
    scale = jnp.asarray(rng.rand(140) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(140), jnp.float32)
    assert pn._channel_tile(2, 2, 140) == 128
    ref = instance_norm_act_xla(x, scale, bias)
    got = pn.instance_norm_act_pallas(x, scale, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_channel_tile_sizing():
    from cat_tpu.ops.pallas_norm import _VMEM_BUDGET, _channel_tile

    # 256px stem: 16 lanes pad to 128 -> 64 MiB slab -> XLA fallback
    assert _channel_tile(256, 256, 16) == 0
    # 256px encoder at 64ch: same lane padding -> XLA fallback
    assert _channel_tile(256, 256, 64) == 0
    # wide bottleneck at 64px fits whole (256 lanes, 8 MiB)
    assert _channel_tile(64, 64, 256) == 256
    # skinny branch mids at 64px: 42 lanes pad to 128 -> 4 MiB, fits
    assert _channel_tile(64, 64, 42) == 42
    # small spatial, huge C: tiles in 128 units
    assert _channel_tile(32, 32, 1024) == 1024  # fits whole
    assert _channel_tile(64, 64, 2048) == 256  # 2 x 128
    # 2048px: one 128-lane slab exceeds the budget -> XLA fallback
    assert _channel_tile(2048, 2048, 3) == 0
