"""GAN and reconstruction objectives.

Reference: models/modules/loss.py:8-99 (GANLoss: lsgan | vanilla | wgangp |
hinge, incl. multiscale-list handling) and the recon-loss selection in
distillers/base_inception_distiller.py:171-181.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp

Pred = Union[jnp.ndarray, Sequence]


def _bce_with_logits(logits: jnp.ndarray, target: float) -> jnp.ndarray:
    # mean BCE-with-logits against a constant target
    t = jnp.full_like(logits, target)
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def gan_loss(
    prediction: Pred,
    target_is_real: bool,
    mode: str = "lsgan",
    for_discriminator: bool = True,
) -> jnp.ndarray:
    """GAN objective on discriminator logits.

    For multiscale discriminators ``prediction`` may be a list (of lists —
    feature pyramids, where the last entry is the logit map); hinge averages
    the per-scale means, matching the reference.
    """
    if isinstance(prediction, (list, tuple)):
        losses = []
        for pred_i in prediction:
            if isinstance(pred_i, (list, tuple)):
                pred_i = pred_i[-1]
            losses.append(gan_loss(pred_i, target_is_real, mode, for_discriminator))
        return sum(losses) / len(losses)

    if mode == "lsgan":
        target = 1.0 if target_is_real else 0.0
        return jnp.mean(jnp.square(prediction - target))
    if mode == "vanilla":
        return _bce_with_logits(prediction, 1.0 if target_is_real else 0.0)
    if mode == "wgangp":
        return -jnp.mean(prediction) if target_is_real else jnp.mean(prediction)
    if mode == "hinge":
        if for_discriminator:
            if target_is_real:
                return -jnp.mean(jnp.minimum(prediction - 1.0, 0.0))
            return -jnp.mean(jnp.minimum(-prediction - 1.0, 0.0))
        assert target_is_real, "hinge generator loss is only defined for real targets"
        return -jnp.mean(prediction)
    raise NotImplementedError(f"gan mode {mode} not implemented")


def gradient_penalty(
    d_apply,
    real: jnp.ndarray,
    fake: jnp.ndarray,
    rng=None,
    gp_type: str = "mixed",
    constant: float = 1.0,
    lambda_gp: float = 10.0,
):
    """WGAN-GP gradient penalty (reference models/modules/loss.py:100-147).

    ``d_apply`` maps an image batch to discriminator logits (an array, or a
    multiscale pyramid — any pytree of arrays; all leaves are summed, which
    is what ``torch.autograd.grad`` with ones-grad_outputs does for lists).
    The penalty is ``mean((||dD/dx||_2 - constant)^2) * lambda_gp`` with the
    per-sample norm taken over flattened non-batch dims; the reference's
    ``+ 1e-16`` shift before the norm is kept for bit-comparability.
    Returns ``(penalty, gradients)``; ``(0.0, None)`` when ``lambda_gp <= 0``.
    """
    if lambda_gp <= 0.0:
        return jnp.asarray(0.0), None
    if gp_type == "real":
        x = real
    elif gp_type == "fake":
        x = fake
    elif gp_type == "mixed":
        if rng is None:
            raise ValueError("gp_type='mixed' requires an rng key")
        alpha = jax.random.uniform(
            rng, (real.shape[0],) + (1,) * (real.ndim - 1), dtype=real.dtype
        )
        x = alpha * real + (1.0 - alpha) * fake
    else:
        raise NotImplementedError(f"gradient penalty type {gp_type!r}")

    def _total(inp):
        out = d_apply(inp)
        return sum(jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(out))

    grads = jax.grad(_total)(x)
    # norm in f32: under bf16 compute the +1e-16 shift (which keeps the
    # norm's backward finite at zero gradients) would underflow to 0
    flat = (grads.astype(jnp.float32) + 1e-16).reshape(real.shape[0], -1)
    norm = jnp.sqrt(jnp.sum(jnp.square(flat), axis=1))
    return jnp.mean(jnp.square(norm - constant)) * lambda_gp, grads


def recon_loss(x: jnp.ndarray, y: jnp.ndarray, kind: str = "l1") -> jnp.ndarray:
    """Reconstruction objective (l1 | l2 | smooth_l1)."""
    if kind == "l1":
        return jnp.mean(jnp.abs(x - y))
    if kind == "l2":
        return jnp.mean(jnp.square(x - y))
    if kind == "smooth_l1":
        d = x - y
        ad = jnp.abs(d)
        return jnp.mean(jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5))
    raise NotImplementedError(f"recon loss {kind!r} not implemented")
