"""Spectral normalisation for conv kernels.

Reference uses torch.nn.utils.spectral_norm on discriminator convs
(models/modules/spade_architecture/normalization.py:17-50, 'spectral*'
norm_D prefixes) and optionally on SPADE-block convs.

Implementation: one power-iteration step per training forward on the
(out, in*kh*kw) kernel matrix; the left singular vector estimate ``u`` lives
in a mutable 'spectral' collection (the functional analogue of torch's
buffer update hook).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

_EPS = 1e-12


def _l2norm(v):
    return v / (jnp.linalg.norm(v) + _EPS)


class SpectralConv(nn.Module):
    """Conv2d with spectral weight normalisation (power iteration)."""

    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    groups: int = 1
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = self.kernel
        cin = x.shape[-1] // self.groups
        kernel = self.param(
            "kernel", self.kernel_init, (k, k, cin, self.features), jnp.float32
        )
        # matrix view: rows = out channels (torch reshapes (out, -1))
        w = kernel.transpose(3, 0, 1, 2).reshape(self.features, -1)
        u_var = self.variable(
            "spectral", "u",
            lambda: _l2norm(jax.random.normal(self.make_rng("params")
                                              if self.has_rng("params")
                                              else jax.random.PRNGKey(0),
                                              (self.features,))),
        )
        u = u_var.value
        v = _l2norm(w.T @ u)
        u_new = _l2norm(w @ v)
        sigma = u_new @ (w @ v)
        if (
            train
            and not self.is_initializing()
            and self.scope.is_mutable_collection("spectral")
        ):
            u_var.value = jax.lax.stop_gradient(u_new)
        w_sn = kernel / jax.lax.stop_gradient(sigma)

        y = jax.lax.conv_general_dilated(
            x,
            w_sn.astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y
