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


# ---------------------------------------------------------------------------
# parameter/state mirrors for the packed execution path
#
# Packed evaluation (see SPADEBlock docstring) needs the raw kernels and
# norm parameters of every branch to build kernel-size-homogeneous group
# convolutions, while keeping the parameter tree IDENTICAL to the unpacked
# modules so checkpoints, pruning and the torch importer are path-agnostic.
# These mirrors declare exactly the params/variables their unpacked
# counterparts (ConvNormActZ / PlainConv / Norm2d / SpectralConv) declare,
# and hand the values (plus stats-update callbacks) to the packer.
# ---------------------------------------------------------------------------


class _PSpecConv(nn.Module):
    """Mirror of the 'conv' submodule (nn.Conv or SpectralConv): returns the
    (spectrally normalised, per-branch sigma) HWIO kernel and bias."""

    shape: Tuple[int, int, int, int]
    use_bias: bool
    spectral: bool
    kernel_init: any

    @nn.compact
    def __call__(self, train: bool = False):
        from cat_tpu.ops.spectral import _l2norm

        k = self.param("kernel", self.kernel_init, self.shape, jnp.float32)
        if not self.spectral:
            b = (
                self.param("bias", nn.initializers.zeros, (self.shape[-1],),
                           jnp.float32)
                if self.use_bias else None
            )
            return k, b
        # declaration order matches SpectralConv (kernel, u, THEN bias):
        # make_rng's per-scope counter must line up for u-init parity
        feats = self.shape[-1]
        w = k.transpose(3, 0, 1, 2).reshape(feats, -1)
        u_var = self.variable(
            "spectral", "u",
            lambda: _l2norm(jax.random.normal(
                self.make_rng("params") if self.has_rng("params")
                else jax.random.PRNGKey(0), (feats,))),
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
        b = (
            self.param("bias", nn.initializers.zeros, (self.shape[-1],),
                       jnp.float32)
            if self.use_bias else None
        )
        return k / jax.lax.stop_gradient(sigma), b


class _PNormZ(nn.Module):
    """Mirror of an (affine) batch/syncbatch ``Norm2d``: params + running
    stats.  The *caller* computes the batch statistics over the packed
    tensor (identical per-channel math) and calls :meth:`update` with this
    norm's slice."""

    features: int
    affine: bool
    track: bool
    scale_init: any

    def setup(self):
        if self.track:
            self.ra_mean = self.variable(
                "batch_stats", "mean", nn.initializers.zeros, None,
                (self.features,), jnp.float32)
            self.ra_var = self.variable(
                "batch_stats", "var", nn.initializers.ones, None,
                (self.features,), jnp.float32)
        if self.affine:
            self.scale = self.param(
                "scale", self.scale_init, (self.features,), jnp.float32)
            self.bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32)

    def get(self):
        return (
            self.scale if self.affine else None,
            self.bias if self.affine else None,
            self.ra_mean.value if self.track else None,
            self.ra_var.value if self.track else None,
        )

    def update(self, mean, unbiased_var, momentum):
        if not self.track or self.is_initializing():
            return
        if not self.scope.is_mutable_collection("batch_stats"):
            return
        m = momentum
        self.ra_mean.value = (1.0 - m) * self.ra_mean.value + m * mean
        self.ra_var.value = (1.0 - m) * self.ra_var.value + m * unbiased_var


class _PBranchConvNorm(nn.Module):
    """Mirror of ``ConvNormActZ``: 'conv' (+spectral) and 'norm' (+stats)."""

    shape: Tuple[int, int, int, int]
    spectral: bool
    norm: NormConfig
    kernel_init: any
    scale_init: any

    def setup(self):
        self.conv = _PSpecConv(self.shape, True, self.spectral,
                               self.kernel_init, name="conv")
        self.norm_m = _PNormZ(self.shape[-1], self.norm.affine,
                              self.norm.track_running_stats, self.scale_init,
                              name="norm")

    def __call__(self, train: bool = False):
        return self.conv(train)

    def norm_params(self):
        return self.norm_m.get()

    def norm_update(self, mean, unbiased_var):
        self.norm_m.update(mean, unbiased_var, self.norm.momentum)


class _Packer:
    """Shared packed-stage machinery for SPADE multi-branch stages.

    A "stage" is a set of branch convs consuming ONE shared input, grouped
    by kernel size (zero SAME padding throughout in the SPADE stack, so
    same-k kernels concatenate along the output-channel axis with no
    padding inflation), followed by a packed batch-norm + activation whose
    per-channel statistics are computed once over the concatenated tensor
    and written back to each branch's running-stat mirror.
    """

    def __init__(self, axis_name: Optional[str], eps: float = 1e-5):
        self.axis_name = axis_name
        self.eps = eps

    def conv_group(self, x, mirrors, train, groups: int = 1):
        """One packed conv over same-k branch mirrors; returns (y, widths)."""
        ks, bs = zip(*[m(train) for m in mirrors])
        w = jnp.concatenate([k.astype(x.dtype) for k in ks], axis=-1)
        k = w.shape[0]
        pad = ((k - 1) // 2,) * 2
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), (pad, pad),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        )
        if bs[0] is not None:
            y = y + jnp.concatenate(bs).astype(y.dtype)
        return y, [k.shape[-1] for k in ks]

    def norm_act(self, y, mirrors, widths, train, act: str):
        """Packed batch/syncbatch norm + act over concatenated branches.

        Numerics identical to Norm2d: f32 stats over (N, H, W) (pmean over
        ``axis_name`` if set), biased variance normalises, unbiased feeds
        the running estimate; eval uses the concatenated running stats."""
        yf = y.astype(jnp.float32)
        params = [m.norm_params() for m in mirrors]
        track = params[0][2] is not None
        if train or not track:
            mean = jnp.mean(yf, axis=(0, 1, 2))
            mean2 = jnp.mean(jnp.square(yf), axis=(0, 1, 2))
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = mean2 - jnp.square(mean)
            if train and track:
                n = y.shape[0] * y.shape[1] * y.shape[2]
                if self.axis_name is not None:
                    n = n * jax.lax.psum(1, self.axis_name)
                unbiased = var * (n / max(n - 1, 1))
                off = 0
                for m, wdt in zip(mirrors, widths):
                    m.norm_update(mean[off:off + wdt],
                                  unbiased[off:off + wdt])
                    off += wdt
        else:
            mean = jnp.concatenate([p[2] for p in params])
            var = jnp.concatenate([p[3] for p in params])
        yf = (yf - mean) * jax.lax.rsqrt(var + self.eps)
        if params[0][0] is not None:
            yf = yf * jnp.concatenate([p[0] for p in params]) + jnp.concatenate(
                [p[1] for p in params])
        yf = activation(act)(yf)
        return yf.astype(y.dtype)

    @staticmethod
    def split(y, widths):
        out, off = [], 0
        for wdt in widths:
            out.append(y[..., off:off + wdt])
            off += wdt
        return out


class _PWrap(nn.Module):
    """Mirror of ``PlainConv``: the conv params nest under 'conv'."""

    shape: Tuple[int, int, int, int]
    use_bias: bool
    spectral: bool
    kernel_init: any

    @nn.compact
    def __call__(self, train: bool = False):
        return _PSpecConv(self.shape, self.use_bias, self.spectral,
                          self.kernel_init, name="conv")(train)


def _packed_branches(
    x, train, *, res, dw, cin, fout, in_norm, mid_norm, act,
    spectral, out_bias, out_nested, conv_init, in_scale_init, mid_scale_init,
    axis_name,
):
    """Packed evaluation of a SPADE multi-branch stage set.

    Declares parameter mirrors named exactly like the unpacked branch
    modules (``res{i}_in`` … ``dw{i}_out``) — construction happens inside
    the calling module's compact context, so the parameter tree is
    identical — then runs:

      IN:  one conv per kernel-size group over the shared input (dw 1x1
           branches join the k=1 group), one packed norm+act per group;
      MID: one depthwise conv over all dw channels (kernels centre-padded
           to the largest dw k — per-channel padding cost is negligible),
           one packed norm+act;
      OUT: one conv per kernel-size group; concatenated inputs x kernels
           concatenated along the *input* axis directly produce each
           group's branch sum.

    Returns the summed branch output (N, H, W, fout).
    """
    from cat_tpu.models.blocks import center_pad_kernel

    packer = _Packer(axis_name, eps=in_norm.eps)

    rin = {
        i: _PBranchConvNorm((k, k, cin, mid), spectral, in_norm, conv_init,
                            in_scale_init, name=f"res{i}_in")
        for i, mid, k in res
    }
    din = {
        i: _PBranchConvNorm((1, 1, cin, mid), spectral, in_norm, conv_init,
                            in_scale_init, name=f"dw{i}_in")
        for i, mid, k in dw
    }
    dmid = {
        i: _PBranchConvNorm((k, k, 1, mid), spectral, mid_norm, conv_init,
                            mid_scale_init, name=f"dw{i}_mid")
        for i, mid, k in dw
    }
    mk_out = (
        (lambda shape, name: _PWrap(shape, out_bias, spectral, conv_init,
                                    name=name))
        if out_nested else
        (lambda shape, name: _PSpecConv(shape, out_bias, False, conv_init,
                                        name=name))
    )
    rout = {i: mk_out((k, k, mid, fout), f"res{i}_out") for i, mid, k in res}
    dout = {i: mk_out((1, 1, mid, fout), f"dw{i}_out") for i, mid, k in dw}

    # ---- IN: kernel-size groups over the shared input ----
    groups: Dict[int, list] = {}
    for i, mid, k in res:
        groups.setdefault(k, []).append(("res", i, mid))
    for i, mid, k in dw:
        groups.setdefault(1, []).append(("dw", i, mid))

    h_res: Dict[int, jnp.ndarray] = {}
    g_parts = []
    for k in sorted(groups):
        mirrors = [rin[i] if kind == "res" else din[i]
                   for kind, i, _ in groups[k]]
        y, widths = packer.conv_group(x, mirrors, train)
        y = packer.norm_act(y, mirrors, widths, train, act)
        for (kind, i, _), part in zip(groups[k], packer.split(y, widths)):
            if kind == "res":
                h_res[i] = part
            else:
                g_parts.append(part)

    # ---- MID: packed depthwise over all dw channels ----
    gm_parts: Dict[int, jnp.ndarray] = {}
    if dw:
        g_all = g_parts[0] if len(g_parts) == 1 else jnp.concatenate(g_parts, -1)
        kmax = max(k for _, _, k in dw)
        ks, bs = zip(*[dmid[i](train) for i, _, _ in dw])
        w_dw = jnp.concatenate(
            [center_pad_kernel(kk.astype(g_all.dtype), kmax) for kk in ks], -1)
        pad = ((kmax - 1) // 2,) * 2
        gm = jax.lax.conv_general_dilated(
            g_all, w_dw, (1, 1), (pad, pad),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=g_all.shape[-1],
        )
        if bs[0] is not None:
            gm = gm + jnp.concatenate(bs).astype(gm.dtype)
        widths = [mid for _, mid, _ in dw]
        mirrors = [dmid[i] for i, _, _ in dw]
        gm = packer.norm_act(gm, mirrors, widths, train, act)
        for (i, _, _), part in zip(dw, packer.split(gm, widths)):
            gm_parts[i] = part

    # ---- OUT: kernel-size groups emitting partial branch sums ----
    og: Dict[int, list] = {}
    for i, mid, k in res:
        og.setdefault(k, []).append((h_res[i], rout[i]))
    for i, mid, k in dw:
        og.setdefault(1, []).append((gm_parts[i], dout[i]))

    total = None
    bias_total = None
    for k in sorted(og):
        ts = [t for t, _ in og[k]]
        xin = ts[0] if len(ts) == 1 else jnp.concatenate(ts, -1)
        kb = [m(train) for _, m in og[k]]
        ws = jnp.concatenate([kk.astype(xin.dtype) for kk, _ in kb], axis=-2)
        pad = ((k - 1) // 2,) * 2
        y = jax.lax.conv_general_dilated(
            xin, ws, (1, 1), (pad, pad),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        total = y if total is None else total + y
        if out_bias:
            for _, b in kb:
                bias_total = b if bias_total is None else bias_total + b
    if bias_total is not None:
        total = total + bias_total.astype(total.dtype)
    return total


def nearest_resize(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Nearest-neighbour resize with torch's indexing convention
    (src = floor(dst * in/out)); the reference resizes segmaps with
    F.interpolate(mode='nearest') everywhere, and jax.image.resize's
    half-pixel convention picks different pixels on downscale."""
    in_h, in_w = x.shape[1], x.shape[2]
    if (in_h, in_w) == (h, w):
        return x
    b, c = x.shape[0], x.shape[3]
    # Integer-factor fast paths: the segmap pyramid is resampled at EVERY
    # SPADE norm (the generator's resolutions are all power-of-two related),
    # and the general row/col gather was ~8% of the b32 512x256 train step
    # on-chip.  An exact-factor downscale under the floor convention picks
    # src = dst*s, i.e. a strided slice; an exact-factor upscale repeats each
    # src pixel s times, i.e. a broadcast+reshape — both lower to cheap
    # layout ops on TPU instead of gathers.
    if in_h % h == 0 and in_w % w == 0:
        sh, sw = in_h // h, in_w // w
        return x[:, ::sh, ::sw]
    if h % in_h == 0 and w % in_w == 0:
        sh, sw = h // in_h, w // in_w
        y = jnp.broadcast_to(x[:, :, None, :, None, :],
                             (b, in_h, sh, in_w, sw, c))
        return y.reshape(b, h, w, c)
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
    multi-branch inception net over the nearest-resized segmap.

    ``packed=True`` evaluates the γ/β branches with kernel-size-homogeneous
    packed group convolutions (identical math and parameter tree; see
    SPADEBlock docstring)."""

    cfg: SPADELayerConfig
    init_type: str = "normal"
    init_gain: float = 0.02
    axis_name: Optional[str] = None
    packed: bool = False

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

        if self.packed:
            sinit = norm_scale_init(branch_norm, self.init_gain)
            total = _packed_branches(
                seg, train,
                res=list(cfg.active_res), dw=list(cfg.active_dw),
                cin=seg.shape[-1], fout=out2,
                in_norm=branch_norm, mid_norm=branch_norm,
                act="relu", spectral=False, out_bias=True, out_nested=False,
                conv_init=conv_init, in_scale_init=sinit,
                mid_scale_init=sinit, axis_name=self.axis_name,
            )
            gamma = total[..., : cfg.norm_nc]
            beta = total[..., cfg.norm_nc :]
            return normalized * (1.0 + gamma) + beta

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
    (+ learned shortcut when fin != fout).

    ``packed=True`` evaluates the branch convolutions (and the SPADE γ/β
    net's) as kernel-size-homogeneous packed group convs — the SPADE-side
    counterpart of ``InceptionBlock(packed=True)``: FLOP-exact, identical
    math and parameter tree (sync-batch statistics are per-channel, so
    concatenated branches produce the same stats and running-stat updates;
    spectral normalisation stays per-branch via its mirror), fewer and
    wider MXU convs."""

    cfg: SPADEBlockConfig
    active_fn: str = "leaky_relu"
    norm_kind: str = "syncbatch"
    init_type: str = "normal"
    init_gain: float = 0.02
    axis_name: Optional[str] = None
    packed: bool = False

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
                                 self.axis_name, packed=self.packed,
                                 name="spade")(x, seg, train=train)
        tmp = activation(self.active_fn)(tmp)

        affine_norm = _norm_cfg(self.norm_kind, affine=True)
        free_norm = _norm_cfg(self.norm_kind, affine=False)

        if self.packed and self.norm_kind in ("batch", "syncbatch"):
            total = _packed_branches(
                tmp, train,
                res=list(cfg.active_res), dw=list(cfg.active_dw),
                cin=tmp.shape[-1], fout=cfg.fout,
                in_norm=affine_norm, mid_norm=free_norm,
                act=self.active_fn, spectral=cfg.spectral,
                out_bias=True, out_nested=True,
                conv_init=conv_kernel_init(self.init_type, self.init_gain),
                in_scale_init=norm_scale_init(affine_norm, self.init_gain),
                mid_scale_init=norm_scale_init(free_norm, self.init_gain),
                axis_name=self.axis_name,
            )
            if cfg.learned_shortcut:
                s = Norm2d(_norm_cfg(self.norm_kind, affine=True),
                           axis_name=self.axis_name, name="shortcut_norm")(x, train=train)
                s = PlainConv(cfg.fout, 1, use_bias=False, spectral=cfg.spectral,
                              init_type=self.init_type, init_gain=self.init_gain,
                              name="shortcut_conv")(s, train=train)
                return total + s
            return total + x

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
    packed_blocks: bool = False

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
                           packed=self.packed_blocks,
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
