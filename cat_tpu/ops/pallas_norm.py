"""Fused instance-norm (+affine, +activation) Pallas kernel.

Instance norm is the hottest non-conv op in the inception generators (every
ConvBNReLU unit at 256px feature maps).  XLA computes it as two passes over
the feature map (statistics, then normalise) plus separate elementwise
epilogues; this kernel computes per-(sample, channel) statistics and applies
scale/bias/ReLU in a single VMEM-resident pass per (sample, spatial-block)
— one HBM read + one HBM write.

Layout: NHWC with the grid over the batch; each program normalises one
sample (H*W x C resident in VMEM — at generator bottleneck sizes,
64x64x256 fp32 = 4 MB, well within the 16 MB VMEM budget).  For larger
feature maps fall back to the XLA path (`instance_norm_act` dispatches on a
VMEM estimate).

Forward-only fusion: the backward pass uses the jnp reference via
jax.custom_vjp-free autodiff of the fallback (the kernel is used for
inference/eval paths and as an opt-in for the forward in training).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_VMEM_BUDGET = 8 * 1024 * 1024  # conservative half of VMEM


def _kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float, act: str):
    import jax.experimental.pallas as pl  # noqa: F401

    x = x_ref[:].astype(jnp.float32)  # (1, H, W, C) block
    mean = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x), axis=(0, 1, 2), keepdims=True) - jnp.square(mean)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[:] + bias_ref[:]
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    elif act == "leaky_relu":
        y = jnp.where(y >= 0, y, 0.01 * y)
    o_ref[:] = y.astype(o_ref.dtype)


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
    grid = (n,)
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, act=act),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
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
    kernel when the per-sample feature map fits the VMEM budget on TPU."""
    if use_pallas == "auto":
        fits = x.shape[1] * x.shape[2] * x.shape[3] * 4 * 2 <= _VMEM_BUDGET
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
