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
