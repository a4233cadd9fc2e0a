"""Fused instance-norm (+affine, +activation) Pallas kernel.

Instance norm is the hottest non-conv op in the inception generators (every
ConvBNReLU unit at 256px feature maps).  XLA computes it as two passes over
the feature map (statistics, then normalise) plus separate elementwise
epilogues; this kernel computes per-(sample, channel) statistics and applies
scale/bias/ReLU in a single VMEM-resident pass per (sample, channel-tile)
— one HBM read + one HBM write.

Layout: NHWC with the grid over (batch, channel tiles).  Instance-norm
statistics are independent per (sample, channel), so tiling the channel
axis is exact: each program holds an (H, W, ctile) slab in VMEM, reduces
it over space, and writes the normalised slab.  The tile width adapts so
the slab fits the VMEM budget at any batch size / resolution (the
batch-only grid of the first version needed the whole (H, W, C) sample
resident and could not run the 256px stem at batch 128).  Only when a
single channel's (H, W) plane alone exceeds the budget (>= 1M-pixel
feature maps) does `instance_norm_act` fall back to the XLA path.

Forward-only fusion: the backward pass uses the jnp reference via
jax.custom_vjp of the fallback (the kernel is used for inference/eval
paths and as an opt-in for the forward in training).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_VMEM_BUDGET = 8 * 1024 * 1024  # conservative half of VMEM


def _kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float, act: str):
    import jax.experimental.pallas as pl  # noqa: F401

    x = x_ref[:].astype(jnp.float32)  # (1, H, W, ctile) block
    mean = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x), axis=(0, 1, 2), keepdims=True) - jnp.square(mean)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[:] + bias_ref[:]
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    elif act == "leaky_relu":
        y = jnp.where(y >= 0, y, 0.01 * y)
    o_ref[:] = y.astype(o_ref.dtype)


def _channel_tile(h: int, w: int, c: int) -> int:
    """Widest channel tile whose (H, W, ctile) slab (x2: in + out) fits
    the VMEM budget, accounting for Mosaic's layout:

    * the lane (last) dim of a VMEM slab is padded to a multiple of 128,
      so a 16-channel 256px stem block really occupies 256*256*128 lanes
      (64 MiB) — such shapes must go to XLA;
    * a partial tile (< C) must itself be a multiple of 128 (Mosaic block
      constraint).

    In practice this selects the bottleneck-resolution feature maps (the
    bulk of the generator's norm count) and leaves the few large-spatial
    encoder/decoder norms to XLA.  Returns 0 for the XLA fallback."""
    plane = h * w * 4 * 2  # f32 in + out, per lane-channel

    def padded(ct: int) -> int:
        return -(-ct // 128) * 128

    if plane * padded(c) <= _VMEM_BUDGET:
        return c
    max_tile = (_VMEM_BUDGET // plane // 128) * 128
    return max_tile if 0 < max_tile < c else 0


def instance_norm_act_pallas(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-5,
    act: str = "relu",
    interpret: bool = False,
) -> jnp.ndarray:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, c = x.shape
    ct = _channel_tile(h, w, c)
    if ct <= 0:
        raise ValueError(
            f"feature map {(h, w)} too large for the Pallas norm kernel "
            f"(single-channel plane exceeds the {_VMEM_BUDGET >> 20} MiB budget)"
        )
    grid = (n, -(-c // ct))  # ceil: edge tiles are masked by Pallas, and
    # per-channel statistics mean padding lanes cannot pollute real channels
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, act=act),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, w, ct), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ct,), lambda i, j: (j,), memory_space=pltpu.VMEM),
            pl.BlockSpec((ct,), lambda i, j: (j,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, ct), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, scale, bias)


def instance_norm_act_xla(x, scale, bias, eps=1e-5, act="relu"):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True) - jnp.square(mean)
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    elif act == "leaky_relu":
        y = jnp.where(y >= 0, y, 0.01 * y)
    return y.astype(x.dtype)


def instance_norm_act(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-5,
    act: str = "relu",
    use_pallas: str = "auto",
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused instance norm + affine + activation; dispatches to the Pallas
    kernel when a single-channel spatial plane fits the VMEM budget on TPU."""
    if use_pallas == "auto":
        fits = _channel_tile(x.shape[1], x.shape[2], x.shape[3]) > 0
        use_pallas = "yes" if (_effective_backend() == "tpu" and fits) else "no"
    if use_pallas == "yes" or interpret:
        return instance_norm_act_pallas(x, scale, bias, eps, act, interpret)
    return instance_norm_act_xla(x, scale, bias, eps, act)


def _effective_backend() -> str:
    """The platform computations will actually lower for.  Unlike
    jax.default_backend(), this respects a jax.default_device(...) context —
    model init runs on the host CPU backend (train/common.init_on_cpu),
    where Pallas cannot lower."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform
    return jax.default_backend()


# ---------------------------------------------------------------------------
# trainable wrapper: Pallas forward, XLA-recompute backward
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_instance_norm_act(x, scale, bias, eps: float = 1e-5, act: str = "relu"):
    """Trainable fused instance-norm+affine+act: single-pass Pallas forward;
    the backward differentiates the (bit-equivalent) XLA formulation with
    rematerialised statistics — no residual feature maps besides x."""
    return instance_norm_act(x, scale, bias, eps, act)


def _fused_fwd(x, scale, bias, eps, act):
    return instance_norm_act(x, scale, bias, eps, act), (x, scale, bias)


def _fused_bwd(eps, act, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda a, s, b: instance_norm_act_xla(a, s, b, eps, act),
                     x, scale, bias)
    return vjp(g)


fused_instance_norm_act.defvjp(_fused_fwd, _fused_bwd)
