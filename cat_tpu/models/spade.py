"""SPADE (GauGAN) generator stack.

Reference: models/modules/inception_modules.py:280-769 (ConvSyncBNReLU,
SPADEInvertedResidualChannels, InceptionSPADE),
inception_architecture/inception_spade_generator.py, and
models/modules/discriminators.py:129-226 (SPADE multiscale D).

Structure notes carried over exactly:
  * block branch first norms are affine (prunable); the depthwise middle
    norm is affine-FREE (inception_modules.py:472-474),
  * the γ/β-producing SPADE branches always use affine sync-batch-norm +
    ReLU regardless of the block norm (inception_modules.py:598-600),
  * segmaps are nearest-resized to the feature resolution at every SPADE
    layer; upsampling between blocks is 2x nearest,
  * conv_img applies LeakyReLU(0.2) then a 3x3 conv and tanh.

All norms are ``syncbatch`` by config: under GSPMD jit over a sharded batch
they are cross-replica automatically (the reference needs its hand-rolled
SynchronizedBatchNorm for the same effect).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cat_tpu.core.config import NormConfig
from cat_tpu.core.spade_config import (
    MultiscaleDiscriminatorConfig,
    SPADEBlockConfig,
    SPADEGeneratorConfig,
    SPADELayerConfig,
)
from cat_tpu.ops.nn import Norm2d, activation, conv_kernel_init, norm_scale_init
from cat_tpu.ops.spectral import SpectralConv

# SPADE distillation taps (reference base_spade_distiller_modules.py:72)
DEFAULT_SPADE_MAPPING_LAYERS = ("head_0", "G_middle_1", "up_1")


def nearest_resize(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Nearest-neighbour resize with torch's indexing convention
    (src = floor(dst * in/out)); the reference resizes segmaps with
    F.interpolate(mode='nearest') everywhere, and jax.image.resize's
    half-pixel convention picks different pixels on downscale."""
    in_h, in_w = x.shape[1], x.shape[2]
    if (in_h, in_w) == (h, w):
        return x
    rows = (jnp.arange(h) * in_h // h).astype(jnp.int32)
    cols = (jnp.arange(w) * in_w // w).astype(jnp.int32)
    return x[:, rows][:, :, cols]


def _norm_cfg(kind: str, affine: bool, momentum=0.1, eps=1e-5) -> NormConfig:
    track = kind in ("batch", "syncbatch")
    return NormConfig(kind=kind, affine=affine, track_running_stats=track,
                      momentum=momentum, eps=eps)


class ConvNormActZ(nn.Module):
    """Zero-padded conv -> norm -> act (reference ConvSyncBNReLU)."""

    features: int
    kernel: int
    groups: int = 1
    norm: NormConfig = NormConfig(kind="syncbatch", track_running_stats=True)
    act: str = "leaky_relu"
    spectral: bool = False
    init_type: str = "normal"
    init_gain: float = 0.02
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        if self.spectral:
            x = SpectralConv(
                self.features, self.kernel, padding=pad, groups=self.groups,
                kernel_init=conv_kernel_init(self.init_type, self.init_gain),
                name="conv",
            )(x, train=train)
        else:
            x = nn.Conv(
                self.features, (self.kernel, self.kernel),
                padding=((pad, pad), (pad, pad)),
                feature_group_count=self.groups,
                kernel_init=conv_kernel_init(self.init_type, self.init_gain),
                name="conv",
            )(x)
        x = Norm2d(self.norm, scale_init=norm_scale_init(self.norm, self.init_gain),
                   axis_name=self.axis_name, name="norm")(x, train=train)
        return activation(self.act)(x)


class PlainConv(nn.Module):
    """Zero-padded conv, optional spectral norm (reference Conv)."""

    features: int
    kernel: int
    use_bias: bool = True
    spectral: bool = False
    init_type: str = "normal"
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        if self.spectral:
            return SpectralConv(
                self.features, self.kernel, padding=pad, use_bias=self.use_bias,
                kernel_init=conv_kernel_init(self.init_type, self.init_gain),
                name="conv",
            )(x, train=train)
        return nn.Conv(
            self.features, (self.kernel, self.kernel),
            padding=((pad, pad), (pad, pad)), use_bias=self.use_bias,
            kernel_init=conv_kernel_init(self.init_type, self.init_gain),
            name="conv",
        )(x)


class InceptionSPADENorm(nn.Module):
    """out = param_free_norm(x) * (1 + γ(seg)) + β(seg), γ/β from a
    multi-branch inception net over the nearest-resized segmap."""

    cfg: SPADELayerConfig
    init_type: str = "normal"
    init_gain: float = 0.02
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, seg, train: bool = False):
        cfg = self.cfg
        pf_norm = _norm_cfg(cfg.param_free_norm, affine=False)
        normalized = Norm2d(pf_norm, axis_name=self.axis_name, name="param_free_norm")(
            x, train=train
        )
        if cfg.is_empty:
            return normalized

        seg = nearest_resize(seg, x.shape[1], x.shape[2])
        # SPADE branches: sync-batch-norm affine + ReLU, hardcoded in the
        # reference (inception_modules.py:598-600)
        branch_norm = _norm_cfg("syncbatch", affine=True)
        out2 = 2 * cfg.norm_nc
        conv_init = conv_kernel_init(self.init_type, self.init_gain)

        total = None
        for i, mid, k in cfg.active_res:
            h = ConvNormActZ(mid, k, norm=branch_norm, act="relu",
                             init_type=self.init_type, init_gain=self.init_gain,
                             axis_name=self.axis_name, name=f"res{i}_in")(seg, train=train)
            h = nn.Conv(out2, (k, k), padding=(((k - 1) // 2,) * 2,) * 2,
                        kernel_init=conv_init, name=f"res{i}_out")(h)
            total = h if total is None else total + h
        for i, mid, k in cfg.active_dw:
            h = ConvNormActZ(mid, 1, norm=branch_norm, act="relu",
                             init_type=self.init_type, init_gain=self.init_gain,
                             axis_name=self.axis_name, name=f"dw{i}_in")(seg, train=train)
            h = ConvNormActZ(mid, k, groups=mid, norm=branch_norm, act="relu",
                             init_type=self.init_type, init_gain=self.init_gain,
                             axis_name=self.axis_name, name=f"dw{i}_mid")(h, train=train)
            h = nn.Conv(out2, (1, 1), kernel_init=conv_init, name=f"dw{i}_out")(h)
            total = h if total is None else total + h

        gamma = total[..., : cfg.norm_nc]
        beta = total[..., cfg.norm_nc :]
        return normalized * (1.0 + gamma) + beta


class SPADEBlock(nn.Module):
    """SPADEInvertedResidualChannels: spade -> act -> multi-branch conv sum
    (+ learned shortcut when fin != fout)."""

    cfg: SPADEBlockConfig
    active_fn: str = "leaky_relu"
    norm_kind: str = "syncbatch"
    init_type: str = "normal"
    init_gain: float = 0.02
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, seg, train: bool = False):
        cfg = self.cfg
        if cfg.is_empty:
            if cfg.learned_shortcut:
                h = Norm2d(_norm_cfg(self.norm_kind, affine=True),
                           axis_name=self.axis_name, name="shortcut_norm")(x, train=train)
                return PlainConv(cfg.fout, 1, use_bias=False, spectral=cfg.spectral,
                                 init_type=self.init_type, init_gain=self.init_gain,
                                 name="shortcut_conv")(h, train=train)
            return x

        tmp = InceptionSPADENorm(cfg.spade, self.init_type, self.init_gain,
                                 self.axis_name, name="spade")(x, seg, train=train)
        tmp = activation(self.active_fn)(tmp)

        affine_norm = _norm_cfg(self.norm_kind, affine=True)
        free_norm = _norm_cfg(self.norm_kind, affine=False)

        total = None
        for i, mid, k in cfg.active_res:
            h = ConvNormActZ(mid, k, norm=affine_norm, act=self.active_fn,
                             spectral=cfg.spectral, init_type=self.init_type,
                             init_gain=self.init_gain, axis_name=self.axis_name,
                             name=f"res{i}_in")(tmp, train=train)
            h = PlainConv(cfg.fout, k, spectral=cfg.spectral,
                          init_type=self.init_type, init_gain=self.init_gain,
                          name=f"res{i}_out")(h, train=train)
            total = h if total is None else total + h
        for i, mid, k in cfg.active_dw:
            h = ConvNormActZ(mid, 1, norm=affine_norm, act=self.active_fn,
                             spectral=cfg.spectral, init_type=self.init_type,
                             init_gain=self.init_gain, axis_name=self.axis_name,
                             name=f"dw{i}_in")(tmp, train=train)
            # depthwise middle norm is affine-free (inception_modules.py:472-474)
            h = ConvNormActZ(mid, k, groups=mid, norm=free_norm, act=self.active_fn,
                             spectral=cfg.spectral, init_type=self.init_type,
                             init_gain=self.init_gain, axis_name=self.axis_name,
                             name=f"dw{i}_mid")(h, train=train)
            h = PlainConv(cfg.fout, 1, spectral=cfg.spectral,
                          init_type=self.init_type, init_gain=self.init_gain,
                          name=f"dw{i}_out")(h, train=train)
            total = h if total is None else total + h

        if cfg.learned_shortcut:
            s = Norm2d(_norm_cfg(self.norm_kind, affine=True),
                       axis_name=self.axis_name, name="shortcut_norm")(x, train=train)
            s = PlainConv(cfg.fout, 1, use_bias=False, spectral=cfg.spectral,
                          init_type=self.init_type, init_gain=self.init_gain,
                          name="shortcut_conv")(s, train=train)
            return total + s
        return total + x


class SPADEGenerator(nn.Module):
    """``inception_spade`` generator; taps are returned functionally
    (the reference already models this via the ``mapping_layers`` kwarg,
    inception_spade_generator.py:63-124)."""

    cfg: SPADEGeneratorConfig
    init_type: str = "xavier"
    init_gain: float = 0.02
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, seg, train: bool = False, taps: Sequence[str] = ()):
        cfg = self.cfg
        acts: Dict[str, jnp.ndarray] = {}
        sh, sw = cfg.latent_size()

        x = nearest_resize(seg, sh, sw)
        x = nn.Conv(cfg.fc_channels, (3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=conv_kernel_init(self.init_type, self.init_gain),
                    name="fc")(x)
        x = Norm2d(_norm_cfg(cfg.param_free_norm, affine=True,
                             momentum=cfg.norm_momentum, eps=cfg.norm_epsilon),
                   axis_name=self.axis_name, name="fc_norm")(x, train=train)
        if "fc" in taps:
            acts["fc"] = x

        up_between = {  # 2x nearest upsample BEFORE these blocks
            "G_middle_0",
            "up_0", "up_1", "up_2", "up_3", "up_4",
        }
        if cfg.num_upsampling_layers in ("more", "most"):
            up_between.add("G_middle_1")

        for name, bcfg in zip(cfg.block_names, cfg.blocks):
            if name in up_between:
                x = nearest_resize(x, x.shape[1] * 2, x.shape[2] * 2)
            x = SPADEBlock(bcfg, cfg.active_fn, cfg.param_free_norm,
                           self.init_type, self.init_gain, self.axis_name,
                           name=name)(x, seg, train=train)
            if name in taps:
                acts[name] = x

        x = activation("leaky_relu", 0.2)(x)
        x = nn.Conv(cfg.output_nc, (3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=conv_kernel_init(self.init_type, self.init_gain),
                    name="conv_img")(x)
        y = jnp.tanh(x)
        if taps:
            return y, acts
        return y


# ---------------------------------------------------------------------------
# discriminators
# ---------------------------------------------------------------------------


class SPADENLayerDiscriminator(nn.Module):
    """PatchGAN returning every intermediate feature map (for the
    feature-matching loss) — reference discriminators.py:129-179."""

    cfg: MultiscaleDiscriminatorConfig
    init_type: str = "xavier"
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        spectral = cfg.norm_D.startswith("spectral")
        subnorm = cfg.norm_D.replace("spectral", "") or "instance"
        results = []
        nf = cfg.ndf
        kw, padw = 4, 2  # int(ceil((4-1)/2)) == 2, reference :139

        def conv(h, features, stride, name, normed):
            if spectral and normed:
                h = SpectralConv(features, kw, stride=stride, padding=padw,
                                 kernel_init=conv_kernel_init(self.init_type, self.init_gain),
                                 name=f"{name}_conv")(h, train=train)
            else:
                h = nn.Conv(features, (kw, kw), strides=(stride, stride),
                            padding=((padw, padw), (padw, padw)),
                            kernel_init=conv_kernel_init(self.init_type, self.init_gain),
                            name=f"{name}_conv")(h)
            if normed and subnorm != "none":
                h = Norm2d(NormConfig(kind=subnorm, affine=False,
                                      track_running_stats=False),
                           name=f"{name}_norm")(h, train=train)
            return h

        h = conv(x, nf, 2, "layer0", normed=False)
        h = activation("leaky_relu", 0.2)(h)
        results.append(h)
        for n in range(1, cfg.n_layers):
            nf = min(nf * 2, 512)
            stride = 1 if n == cfg.n_layers - 1 else 2
            h = conv(h, nf, stride, f"layer{n}", normed=True)
            h = activation("leaky_relu", 0.2)(h)
            results.append(h)
        h = conv(h, 1, 1, "layer_out", normed=False)
        results.append(h)
        return results


class MultiscaleDiscriminator(nn.Module):
    """num_D SPADE PatchGANs on an avg-pooled image pyramid."""

    cfg: MultiscaleDiscriminatorConfig
    init_type: str = "xavier"
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, x, train: bool = False):
        from cat_tpu.metrics.inception import avg_pool_excl_pad

        outs = []
        for i in range(self.cfg.num_D):
            outs.append(
                SPADENLayerDiscriminator(
                    self.cfg, self.init_type, self.init_gain,
                    name=f"discriminator_{i}",
                )(x, train=train)
            )
            if i != self.cfg.num_D - 1:
                x = avg_pool_excl_pad(x, window=3, stride=2, pad=1)
        return outs
