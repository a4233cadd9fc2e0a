"""Conditional UNet for img2img diffusion-style models (stretch family).

Not part of the reference (BASELINE.json configs list "distill a diffusion
UNet img2img model" as the stretch goal): proves the KA-distillation harness
generalises beyond the inception GANs.  Standard diffusion UNet shape:
stem conv -> [res blocks + downsample] levels -> middle -> mirrored ups with
skip concatenation -> group-norm/silu head; optional sinusoidal timestep
embedding added per res block.

Functional taps (like the other generators) expose per-level features for
distillation: 'down{i}', 'mid', 'up{i}'.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cat_tpu.core.config import register_config


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 3
    out_channels: int = 3
    base: int = 64
    mults: Tuple[int, ...] = (1, 2, 4)
    res_blocks: int = 2
    time_dim: int = 0  # 0 disables timestep conditioning
    groups: int = 8

    @property
    def tap_widths(self) -> Dict[str, int]:
        widths = {}
        for i, m in enumerate(self.mults):
            widths[f"down{i}"] = self.base * m
            widths[f"up{i}"] = self.base * m
        widths["mid"] = self.base * self.mults[-1]
        return widths


register_config(UNetConfig)


def timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half) / max(half - 1, 1))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class ResBlock(nn.Module):
    features: int
    groups: int = 8

    @nn.compact
    def __call__(self, x, temb: Optional[jnp.ndarray] = None):
        h = nn.GroupNorm(num_groups=min(self.groups, x.shape[-1]), name="norm1")(x)
        h = jax.nn.silu(h)
        h = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)), name="conv1")(h)
        if temb is not None:
            h = h + nn.Dense(self.features, name="temb_proj")(jax.nn.silu(temb))[
                :, None, None, :
            ]
        h = nn.GroupNorm(num_groups=min(self.groups, self.features), name="norm2")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)), name="conv2")(h)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), name="skip")(x)
        return x + h


class UNet(nn.Module):
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, t: Optional[jnp.ndarray] = None,
                 taps: Sequence[str] = ()):
        cfg = self.cfg
        acts: Dict[str, jnp.ndarray] = {}
        temb = None
        if cfg.time_dim > 0 and t is not None:
            temb = timestep_embedding(t, cfg.time_dim)
            temb = nn.Dense(cfg.time_dim * 4, name="temb_dense1")(temb)
            temb = nn.Dense(cfg.time_dim * 4, name="temb_dense2")(jax.nn.silu(temb))

        h = nn.Conv(cfg.base, (3, 3), padding=((1, 1), (1, 1)), name="stem")(x)
        skips = [h]
        for i, m in enumerate(cfg.mults):
            for j in range(cfg.res_blocks):
                h = ResBlock(cfg.base * m, cfg.groups, name=f"down{i}_res{j}")(h, temb)
                skips.append(h)
            if f"down{i}" in taps:
                acts[f"down{i}"] = h
            if i != len(cfg.mults) - 1:
                h = nn.Conv(cfg.base * m, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), name=f"down{i}_pool")(h)
                skips.append(h)

        h = ResBlock(cfg.base * cfg.mults[-1], cfg.groups, name="mid_res0")(h, temb)
        h = ResBlock(cfg.base * cfg.mults[-1], cfg.groups, name="mid_res1")(h, temb)
        if "mid" in taps:
            acts["mid"] = h

        for i in reversed(range(len(cfg.mults))):
            m = cfg.mults[i]
            for j in range(cfg.res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ResBlock(cfg.base * m, cfg.groups, name=f"up{i}_res{j}")(h, temb)
            if f"up{i}" in taps:
                acts[f"up{i}"] = h
            if i != 0:
                h = jax.image.resize(
                    h, (h.shape[0], h.shape[1] * 2, h.shape[2] * 2, h.shape[3]),
                    method="nearest",
                )
                h = nn.Conv(cfg.base * m, (3, 3), padding=((1, 1), (1, 1)),
                            name=f"up{i}_conv")(h)

        h = nn.GroupNorm(num_groups=min(cfg.groups, h.shape[-1]), name="head_norm")(h)
        h = jax.nn.silu(h)
        y = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)), name="head")(h)
        if taps:
            return y, acts
        return y
