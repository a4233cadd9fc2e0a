"""Building blocks: fused Conv+Norm+Act unit and the multi-branch
inverted-residual "inception" block.

TPU notes: each branch is a dense conv / depthwise conv pair that XLA maps
onto the MXU; the branch sum + residual + pw-norm epilogue fuses into the
last conv's epilogue.  All convs run in NHWC with HWIO kernels.

Reference behaviour being reproduced (not translated):
  models/modules/inception_modules.py:22-243 (ConvBNReLU,
  InvertedResidualChannels).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from cat_tpu.core.config import InceptionBlockConfig, NormConfig
from cat_tpu.ops.nn import Norm2d, activation, conv_kernel_init, norm_scale_init, spatial_pad


class _AffineParams(nn.Module):
    """scale/bias params matching Norm2d's naming (for the fused kernel)."""

    scale_init: any = nn.initializers.ones

    @nn.compact
    def __call__(self, c: int):
        scale = self.param("scale", self.scale_init, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return scale, bias


class ConvNormAct(nn.Module):
    """conv -> norm -> activation (reference ConvBNReLU).

    The conv is always VALID; callers pad explicitly (the reference alternates
    reflect / zero padding per call-site).  ``pad`` > 0 applies spatial
    padding of mode ``pad_mode`` before the conv.

    ``fused=True`` routes affine instance-norm + relu/leaky-relu through the
    single-pass Pallas kernel (cat_tpu/ops/pallas_norm.py) — identical math
    and parameter tree, one HBM pass fewer.
    """

    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    use_bias: bool = True
    norm: NormConfig = NormConfig()
    act: str = "relu"
    act_slope: float = 0.01
    pad: int = 0
    pad_mode: str = "reflect"
    init_type: str = "normal"
    init_gain: float = 0.02
    axis_name: Optional[str] = None
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.pad:
            x = spatial_pad(x, self.pad, self.pad_mode)
        x = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="VALID",
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=conv_kernel_init(self.init_type, self.init_gain),
            name="conv",
        )(x)
        fusable = (
            self.fused
            and self.norm.kind == "instance"
            and self.norm.affine
            and self.act in ("relu", "nn.ReLU")
        )
        if fusable:
            from cat_tpu.ops.pallas_norm import fused_instance_norm_act

            scale, bias = _AffineParams(
                scale_init=norm_scale_init(self.norm, self.init_gain), name="norm"
            )(x.shape[-1])
            return fused_instance_norm_act(x, scale, bias, self.norm.eps, "relu")
        x = Norm2d(
            self.norm,
            scale_init=norm_scale_init(self.norm, self.init_gain),
            axis_name=self.axis_name,
            name="norm",
        )(x, train=train)
        return activation(self.act, self.act_slope)(x)


class InceptionBlock(nn.Module):
    """Multi-branch inverted-residual block.

    out = x + pw_norm( sum_i res_i(x) + sum_j dw_j(x) )

    Residual branch i (kernel k, mid width m):
      pad(k//2) -> conv(k, m) -> norm -> act -> dropout -> pad(k//2) -> conv(k, dim)
    Depthwise branch j:
      conv(1x1, m) -> norm -> act -> pad(k//2) -> depthwise conv(k) -> norm
      -> act -> dropout -> conv(1x1, dim)

    Branch submodules are named ``res{i}`` / ``dw{i}`` by their position in
    the *config* tuple so that kernel-size correspondence survives pruning
    (a zero-width branch simply has no params).  The first norm of every
    branch (``res{i}/conv_in/norm``, ``dw{i}/conv_in/norm``) carries the
    scaling factors that drive channel pruning (reference:
    inception_modules.py:194-228, utils/prune.py:5-61).
    """

    cfg: InceptionBlockConfig
    norm: NormConfig = NormConfig()
    padding_type: str = "reflect"
    active_fn: str = "relu"
    dropout_rate: float = 0.0
    use_bias: bool = True
    init_type: str = "normal"
    init_gain: float = 0.02
    axis_name: Optional[str] = None
    fused_norms: bool = False

    def _cna(self, features, kernel, groups=1, pad=0, name=None):
        return ConvNormAct(
            features=features,
            kernel=kernel,
            groups=groups,
            use_bias=self.use_bias,
            norm=self.norm,
            act=self.active_fn,
            pad=pad,
            pad_mode=self.padding_type,
            init_type=self.init_type,
            init_gain=self.init_gain,
            axis_name=self.axis_name,
            fused=self.fused_norms,
            name=name,
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        if cfg.is_empty:
            return x

        conv_init = conv_kernel_init(self.init_type, self.init_gain)
        dropout = nn.Dropout(rate=self.dropout_rate, deterministic=not train)

        total = None

        def accumulate(t, branch_out):
            return branch_out if t is None else t + branch_out

        for i, mid, k in cfg.active_res:
            h = self._cna(mid, k, pad=(k - 1) // 2, name=f"res{i}_in")(x, train=train)
            h = dropout(h)
            h = spatial_pad(h, (k - 1) // 2, self.padding_type)
            h = nn.Conv(
                features=cfg.dim,
                kernel_size=(k, k),
                padding="VALID",
                use_bias=self.use_bias,
                kernel_init=conv_init,
                name=f"res{i}_out",
            )(h)
            total = accumulate(total, h)

        for i, mid, k in cfg.active_dw:
            h = self._cna(mid, 1, name=f"dw{i}_in")(x, train=train)
            h = self._cna(mid, k, groups=mid, pad=(k - 1) // 2, name=f"dw{i}_mid")(
                h, train=train
            )
            h = dropout(h)
            h = nn.Conv(
                features=cfg.dim,
                kernel_size=(1, 1),
                padding="VALID",
                use_bias=self.use_bias,
                kernel_init=conv_init,
                name=f"dw{i}_out",
            )(h)
            total = accumulate(total, h)

        total = Norm2d(
            self.norm,
            scale_init=norm_scale_init(self.norm, self.init_gain),
            axis_name=self.axis_name,
            name="pw_norm",
        )(total, train=train)
        return x + total
