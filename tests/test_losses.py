"""Unit tests for GAN objectives, incl. the WGAN-GP gradient penalty
(reference models/modules/loss.py:8-147)."""

import jax
import jax.numpy as jnp
import numpy as np

from cat_tpu.models.losses import gan_loss, gradient_penalty, recon_loss


def test_gan_loss_modes(rng):
    logits = jnp.asarray(rng.randn(4, 1, 8, 8).astype(np.float32))
    # lsgan: MSE against the 0/1 target
    np.testing.assert_allclose(
        gan_loss(logits, True, "lsgan"), np.mean((np.asarray(logits) - 1.0) ** 2),
        rtol=1e-6,
    )
    # wgangp: signed mean
    np.testing.assert_allclose(
        gan_loss(logits, True, "wgangp"), -np.mean(np.asarray(logits)), rtol=1e-6
    )
    np.testing.assert_allclose(
        gan_loss(logits, False, "wgangp"), np.mean(np.asarray(logits)), rtol=1e-6
    )
    # hinge D: -mean(min(±x - 1, 0)); hinge G: -mean(x)
    x = np.asarray(logits)
    np.testing.assert_allclose(
        gan_loss(logits, True, "hinge"), -np.mean(np.minimum(x - 1.0, 0.0)), rtol=1e-6
    )
    np.testing.assert_allclose(
        gan_loss(logits, True, "hinge", for_discriminator=False), -np.mean(x),
        rtol=1e-6,
    )


def test_gradient_penalty_linear_d(rng):
    """For a linear D(x)=<w,x>, dD/dx == w everywhere, so the penalty is the
    closed form (||w|| - constant)^2 * lambda_gp regardless of the inputs."""
    w = jnp.asarray(rng.randn(3, 8, 8).astype(np.float32))
    real = jnp.asarray(rng.randn(4, 3, 8, 8).astype(np.float32))
    fake = jnp.asarray(rng.randn(4, 3, 8, 8).astype(np.float32))

    def d_apply(x):
        return jnp.sum(x * w[None], axis=(1, 2, 3))

    pen, grads = gradient_penalty(
        d_apply, real, fake, rng=jax.random.PRNGKey(0), lambda_gp=10.0
    )
    expected = (np.linalg.norm(np.asarray(w).ravel()) - 1.0) ** 2 * 10.0
    np.testing.assert_allclose(pen, expected, rtol=1e-4)
    assert grads.shape == real.shape


def test_gradient_penalty_quadratic_d_matches_numpy(rng):
    """Quadratic D: grad = 2x at the interpolate; recompute the reference
    formula (view(B,-1), +1e-16 shift, L2 norm) in numpy on the same alpha."""
    real = jnp.asarray(rng.randn(5, 2, 4, 4).astype(np.float32))
    fake = jnp.asarray(rng.randn(5, 2, 4, 4).astype(np.float32))
    key = jax.random.PRNGKey(7)

    def d_apply(x):
        return jnp.sum(jnp.square(x), axis=(1, 2, 3))

    pen, grads = gradient_penalty(d_apply, real, fake, rng=key, lambda_gp=10.0)

    alpha = np.asarray(
        jax.random.uniform(key, (real.shape[0], 1, 1, 1), dtype=real.dtype)
    )
    interp = alpha * np.asarray(real) + (1 - alpha) * np.asarray(fake)
    g = (2.0 * interp + 1e-16).reshape(real.shape[0], -1)
    expected = np.mean((np.linalg.norm(g, axis=1) - 1.0) ** 2) * 10.0
    np.testing.assert_allclose(pen, expected, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grads), 2.0 * interp, rtol=1e-5)


def test_gradient_penalty_multiscale_and_off(rng):
    real = jnp.asarray(rng.randn(2, 1, 4, 4).astype(np.float32))
    fake = jnp.asarray(rng.randn(2, 1, 4, 4).astype(np.float32))

    # multiscale pyramid output: leaves are summed, like torch.autograd.grad
    def d_multi(x):
        return [jnp.sum(x, axis=(1, 2, 3)), [x * 0.5, jnp.square(x)]]

    pen, grads = gradient_penalty(
        d_multi, real, fake, gp_type="real", lambda_gp=1.0
    )
    np.testing.assert_allclose(
        np.asarray(grads), 1.0 + 0.5 + 2.0 * np.asarray(real), rtol=1e-5
    )

    pen0, g0 = gradient_penalty(d_multi, real, fake, gp_type="real", lambda_gp=0.0)
    assert float(pen0) == 0.0 and g0 is None


def test_recon_smooth_l1(rng):
    x = jnp.asarray(rng.randn(3, 5).astype(np.float32)) * 2
    y = jnp.zeros_like(x)
    d = np.asarray(x)
    ad = np.abs(d)
    expected = np.mean(np.where(ad < 1.0, 0.5 * d * d, ad - 0.5))
    np.testing.assert_allclose(recon_loss(x, y, "smooth_l1"), expected, rtol=1e-6)
