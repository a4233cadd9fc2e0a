"""KA loss: formula parity, custom-VJP gradient parity, Pallas kernel parity."""

import jax
import jax.numpy as jnp
import numpy as np

from cat_tpu.distill.ka import gram_pair, ka


def ka_reference(x, y):
    """Direct transcription of the formula (utils/common.py:38-46)."""
    xf = x.reshape(x.shape[0], -1)
    yf = y.reshape(y.shape[0], -1)
    gx = xf @ xf.T
    gy = yf @ yf.T
    return (gx * gy).sum() / jnp.sqrt((gx**2).sum() * (gy**2).sum())


def test_ka_value_matches_formula(rng):
    x = jnp.asarray(rng.randn(5, 4, 6, 3), jnp.float32)
    y = jnp.asarray(rng.randn(5, 4, 6, 2), jnp.float32)
    np.testing.assert_allclose(ka(x, y), ka_reference(x, y), rtol=1e-5)


def test_ka_self_is_one(rng):
    x = jnp.asarray(rng.randn(4, 7), jnp.float32)
    np.testing.assert_allclose(ka(x, x), 1.0, rtol=1e-6)


def test_ka_custom_vjp_matches_autodiff(rng):
    x = jnp.asarray(rng.randn(4, 50), jnp.float32)
    y = jnp.asarray(rng.randn(4, 30), jnp.float32)
    gx_custom = jax.grad(lambda a, b: -ka(a, b), argnums=(0, 1))(x, y)
    gx_auto = jax.grad(lambda a, b: -ka_reference(a, b), argnums=(0, 1))(x, y)
    np.testing.assert_allclose(gx_custom[0], gx_auto[0], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(gx_custom[1], gx_auto[1], rtol=1e-4, atol=1e-6)


def test_gram_pair_pallas_interpret_parity(rng):
    # batch not a multiple of 8, features not a multiple of the tile:
    # exercises the zero-padding path
    x = jnp.asarray(rng.randn(5, 300), jnp.float32)
    y = jnp.asarray(rng.randn(5, 300), jnp.float32)
    gx_i, gy_i = gram_pair(x, y, interpret=True)
    gx, gy = gram_pair(x, y, use_pallas="no")
    np.testing.assert_allclose(gx_i, gx, rtol=1e-5)
    np.testing.assert_allclose(gy_i, gy, rtol=1e-5)
