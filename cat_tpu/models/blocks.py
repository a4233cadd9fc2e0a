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

import jax
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


class _PConv(nn.Module):
    """Parameter-only mirror of an ``nn.Conv`` (same names/shapes/inits)."""

    shape: Tuple[int, int, int, int]
    use_bias: bool = True
    kernel_init: any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init, self.shape, jnp.float32)
        b = (
            self.param("bias", nn.initializers.zeros, (self.shape[-1],), jnp.float32)
            if self.use_bias
            else None
        )
        return k, b


class _PNorm(nn.Module):
    """Parameter-only mirror of an affine ``Norm2d`` (scale/bias)."""

    features: int
    scale_init: any = nn.initializers.ones

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", self.scale_init, (self.features,), jnp.float32),
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32),
        )


class _PConvNorm(nn.Module):
    """Parameter tree mirror of ``ConvNormAct`` (conv + optional norm)."""

    shape: Tuple[int, int, int, int]
    use_bias: bool
    affine: bool
    kernel_init: any
    scale_init: any

    @nn.compact
    def __call__(self):
        k, b = _PConv(self.shape, self.use_bias, self.kernel_init, name="conv")()
        if self.affine:
            s, nb = _PNorm(self.shape[-1], self.scale_init, name="norm")()
        else:
            s = nb = None
        return k, b, s, nb


def center_pad_kernel(w: jnp.ndarray, k: int) -> jnp.ndarray:
    """Zero-pad an (kh,kw,ci,co) HWIO kernel to (k,k,ci,co), centred.

    A centred zero-padded kernel applied VALID over ``spatial_pad(x, (k-1)//2)``
    computes exactly the original smaller conv, for any padding mode: the
    interior of a reflect/edge/zero pad of width p is the same pad of width
    p-d.
    """
    kh = w.shape[0]
    d = (k - kh) // 2
    if d == 0:
        return w
    return jnp.pad(w, ((d, d), (d, d), (0, 0), (0, 0)))


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

    ``packed=True`` (instance/none norm only) evaluates the block with
    branch convolutions packed into kernel-size-homogeneous groups (see
    ``_packed_call``): FLOP-exact, fewer and wider convs.  Identical math
    and identical parameter tree — checkpoints and pruning move freely
    between paths.  (With ``dropout_rate > 0`` the two paths draw dropout
    masks in a different RNG order — one mask per concatenated group vs one
    per branch — so they are distribution-identical but not
    sample-identical; exact equality holds at the default rate 0, which is
    what every shipped recipe trains with.)  This is the "fused multi-branch block" SURVEY §7 calls
    for, done with packed XLA convs instead of a kernel.  (A variant that
    zero-pads every kernel to the largest k and runs ONE conv per stage was
    measured 40% slower on-chip: the k-padding inflates block FLOPs ~3.9x,
    which swamps the utilization win — see tools/perf_probe.py.)
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
    packed: bool = False

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
        if self.packed and self.norm.kind in ("instance", "none"):
            return self._packed_call(x, train)

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

    # ------------------------------------------------------------- packed

    def _inorm_act(self, y, scale, bias, act=True):
        """Norm2d's instance-norm numerics on a packed tensor (+activation)."""
        yf = y.astype(jnp.float32)
        if self.norm.kind == "instance":
            m = jnp.mean(yf, axis=(1, 2), keepdims=True)
            v = jnp.mean(jnp.square(yf), axis=(1, 2), keepdims=True) - jnp.square(m)
            yf = (yf - m) * jax.lax.rsqrt(v + self.norm.eps)
        if scale is not None:
            yf = yf * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        if act:
            yf = activation(self.active_fn)(yf)
        return yf.astype(y.dtype)

    def _packed_call(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        """Grouped branch packing: FLOP-exact, kernel-size-homogeneous groups.

        Branch convs sharing a kernel size pack into one wide conv (the
        k=1 group carries the res k=1 branch AND every dw 1x1); k=3/k=5
        branches stay at their own size, so no zero-pad FLOP inflation.
        The depthwise stage packs per-channel kernels (padding there is
        negligible).  "Out" convs group the same way, each group conv
        emitting a partial branch sum.  ~11 tensor ops per block instead of
        ~21, with every 1x1 conv at 4x the lane width.
        """
        cfg = self.cfg
        cin, dim = x.shape[-1], cfg.dim
        conv_init = conv_kernel_init(self.init_type, self.init_gain)
        scale_init = norm_scale_init(self.norm, self.init_gain)
        affine = self.norm.kind == "instance" and self.norm.affine
        res, dw = list(cfg.active_res), list(cfg.active_dw)
        cdt = x.dtype
        dims = ("NHWC", "HWIO", "NHWC")
        dropout = nn.Dropout(rate=self.dropout_rate, deterministic=not train)

        def dn(t):
            return t.astype(cdt)

        # ---- declare params (identical tree to the unpacked path) ----
        rin, rout, din, dmid, dout = {}, {}, {}, {}, {}
        for i, mid, k in res:
            rin[i] = _PConvNorm((k, k, cin, mid), self.use_bias, affine, conv_init,
                                scale_init, name=f"res{i}_in")()
            rout[i] = _PConv((k, k, mid, dim), self.use_bias, conv_init,
                             name=f"res{i}_out")()
        for i, mid, k in dw:
            din[i] = _PConvNorm((1, 1, cin, mid), self.use_bias, affine, conv_init,
                                scale_init, name=f"dw{i}_in")()
            dmid[i] = _PConvNorm((k, k, 1, mid), self.use_bias, affine, conv_init,
                                 scale_init, name=f"dw{i}_mid")()
            dout[i] = _PConv((1, 1, mid, dim), self.use_bias, conv_init,
                             name=f"dw{i}_out")()

        # ---- IN: one conv per kernel-size group (res first, dw last in k=1) ----
        groups: dict = {}
        for i, mid, k in res:
            groups.setdefault(k, []).append(("res", i, mid))
        for i, mid, k in dw:
            groups.setdefault(1, []).append(("dw", i, mid))

        def group_conv(entries, k, params_of):
            ws = jnp.concatenate(
                [dn(params_of(kind, i)[0]) for kind, i, _ in entries], axis=-1
            )
            y = jax.lax.conv_general_dilated(
                spatial_pad(x, (k - 1) // 2, self.padding_type) if k > 1 else x,
                ws, (1, 1), "VALID", dimension_numbers=dims,
            )
            if self.use_bias:
                y = y + jnp.concatenate(
                    [dn(params_of(kind, i)[1]) for kind, i, _ in entries]
                )
            if affine:
                sc = jnp.concatenate([params_of(kind, i)[2] for kind, i, _ in entries])
                bi = jnp.concatenate([params_of(kind, i)[3] for kind, i, _ in entries])
            else:
                sc = bi = None
            return self._inorm_act(y, sc, bi)

        def in_params(kind, i):
            return rin[i] if kind == "res" else din[i]

        gout = {}  # k -> activated group tensor
        for k in sorted(groups):
            gout[k] = group_conv(groups[k], k, in_params)

        # per-branch mid views (res after dropout; dw feeds the dw stage)
        h_res, g_parts = {}, []
        for k in sorted(groups):
            off = 0
            for kind, i, mid in groups[k]:
                sl = gout[k][..., off:off + mid]
                if kind == "res":
                    h_res[i] = dropout(sl)
                else:
                    g_parts.append(sl)
                off += mid

        # ---- dw depthwise stage: one grouped conv over all dw channels ----
        gm_parts = {}
        if dw:
            g_all = g_parts[0] if len(g_parts) == 1 else jnp.concatenate(g_parts, -1)
            kmax_dw = max(k for _, _, k in dw)
            w_dw = jnp.concatenate(
                [center_pad_kernel(dn(dmid[i][0]), kmax_dw) for i, _, _ in dw], -1
            )
            gm = jax.lax.conv_general_dilated(
                spatial_pad(g_all, (kmax_dw - 1) // 2, self.padding_type)
                if kmax_dw > 1 else g_all,
                w_dw, (1, 1), "VALID", dimension_numbers=dims,
                feature_group_count=g_all.shape[-1],
            )
            if self.use_bias:
                gm = gm + jnp.concatenate([dn(dmid[i][1]) for i, _, _ in dw])
            gm = self._inorm_act(
                gm,
                jnp.concatenate([dmid[i][2] for i, _, _ in dw]) if affine else None,
                jnp.concatenate([dmid[i][3] for i, _, _ in dw]) if affine else None,
            )
            gm = dropout(gm)
            off = 0
            for i, mid, _ in dw:
                gm_parts[i] = gm[..., off:off + mid]
                off += mid

        # ---- OUT: one conv per kernel-size group, emitting partial sums ----
        og: dict = {}
        for i, mid, k in res:
            og.setdefault(k, []).append((h_res[i], rout[i]))
        for i, mid, k in dw:
            og.setdefault(1, []).append((gm_parts[i], dout[i]))

        total = None
        for k in sorted(og):
            ts = [t for t, _ in og[k]]
            xin = ts[0] if len(ts) == 1 else jnp.concatenate(ts, -1)
            ws = jnp.concatenate([dn(p[0]) for _, p in og[k]], axis=-2)
            y = jax.lax.conv_general_dilated(
                spatial_pad(xin, (k - 1) // 2, self.padding_type) if k > 1 else xin,
                ws, (1, 1), "VALID", dimension_numbers=dims,
            )
            total = y if total is None else total + y
        if self.use_bias:
            total = total + sum(dn(p[1]) for group in og.values() for _, p in group)

        total = Norm2d(
            self.norm,
            scale_init=scale_init,
            axis_name=self.axis_name,
            name="pw_norm",
        )(total, train=train)
        return x + total
