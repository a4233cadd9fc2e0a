"""PatchGAN discriminators.

Reference: models/modules/discriminators.py:14-126 (NLayerDiscriminator,
PixelDiscriminator).  The SPADE multiscale discriminator lives in
cat_tpu/models/spade.py.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from cat_tpu.core.config import NLayerDiscriminatorConfig, PixelDiscriminatorConfig
from cat_tpu.ops.nn import Norm2d, activation, conv_kernel_init, norm_scale_init


class NLayerDiscriminator(nn.Module):
    """70x70 PatchGAN: 4x4 convs, stride 2 (then 1), LeakyReLU(0.2)."""

    cfg: NLayerDiscriminatorConfig
    init_type: str = "normal"
    init_gain: float = 0.02
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        use_bias = cfg.norm.kind in ("instance", "none")
        act = activation(cfg.active_fn, slope=0.2)
        conv_init = conv_kernel_init(self.init_type, self.init_gain)

        def conv(h, features, stride, use_b, name):
            return nn.Conv(
                features=features,
                kernel_size=(4, 4),
                strides=(stride, stride),
                padding=((1, 1), (1, 1)),
                use_bias=use_b,
                kernel_init=conv_init,
                name=name,
            )(h)

        h = act(conv(x, cfg.ndf, 2, True, "conv0"))
        nf_mult = 1
        for n in range(1, cfg.n_layers):
            nf_mult = min(2 ** n, 8)
            h = conv(h, cfg.ndf * nf_mult, 2, use_bias, f"conv{n}")
            h = Norm2d(
                cfg.norm,
                scale_init=norm_scale_init(cfg.norm, self.init_gain),
                axis_name=self.axis_name,
                name=f"norm{n}",
            )(h, train=train)
            h = act(h)
        nf_mult = min(2 ** cfg.n_layers, 8)
        h = conv(h, cfg.ndf * nf_mult, 1, use_bias, f"conv{cfg.n_layers}")
        h = Norm2d(
            cfg.norm,
            scale_init=norm_scale_init(cfg.norm, self.init_gain),
            axis_name=self.axis_name,
            name=f"norm{cfg.n_layers}",
        )(h, train=train)
        h = act(h)
        return conv(h, 1, 1, True, "conv_out")


class PixelDiscriminator(nn.Module):
    """1x1 PixelGAN discriminator."""

    cfg: PixelDiscriminatorConfig
    init_type: str = "normal"
    init_gain: float = 0.02
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        use_bias = cfg.norm.kind in ("instance", "none")
        act = activation(cfg.active_fn, slope=0.2)
        conv_init = conv_kernel_init(self.init_type, self.init_gain)

        h = nn.Conv(cfg.ndf, (1, 1), use_bias=True, kernel_init=conv_init, name="conv0")(x)
        h = act(h)
        h = nn.Conv(
            cfg.ndf * 2, (1, 1), use_bias=use_bias, kernel_init=conv_init, name="conv1"
        )(h)
        h = Norm2d(
            cfg.norm,
            scale_init=norm_scale_init(cfg.norm, self.init_gain),
            axis_name=self.axis_name,
            name="norm1",
        )(h, train=train)
        h = act(h)
        return nn.Conv(1, (1, 1), use_bias=use_bias, kernel_init=conv_init, name="conv_out")(h)
