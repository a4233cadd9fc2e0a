"""Low-level neural-net ops: padding, activations, normalisation, init.

All tensors are NHWC (TPU-native layout: channels on the 128-lane minor
dimension).  The reference framework is NCHW PyTorch; layout is one of the
deliberate departures — see SURVEY.md §2.1.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from cat_tpu.core.config import NormConfig

# ---------------------------------------------------------------------------
# Padding
# ---------------------------------------------------------------------------

_PAD_MODES = {"reflect": "reflect", "replicate": "edge", "zero": "constant"}


def spatial_pad(x: jnp.ndarray, pad: int, mode: str = "reflect") -> jnp.ndarray:
    """Pad H and W of an NHWC tensor (reference: nn.ReflectionPad2d et al.)."""
    if pad == 0:
        return x
    if mode not in _PAD_MODES:
        raise NotImplementedError(f"padding [{mode}] is not implemented")
    widths = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    return jnp.pad(x, widths, mode=_PAD_MODES[mode])


# ---------------------------------------------------------------------------
# Activations (reference: inception_modules.get_active_fn)
# ---------------------------------------------------------------------------


def activation(name: str, slope: float = 0.01) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if name in ("relu", "nn.ReLU"):
        return jax.nn.relu
    if name in ("relu6", "nn.ReLU6"):
        return jax.nn.relu6
    if name in ("leaky_relu", "nn.LeakyReLU"):
        return lambda x: jax.nn.leaky_relu(x, negative_slope=slope)
    if name == "tanh":
        return jnp.tanh
    if name in ("none", "identity"):
        return lambda x: x
    raise ValueError(f"unknown activation {name!r}")


# ---------------------------------------------------------------------------
# Initialisers (reference: models/networks.py:108-144 init_weights)
# ---------------------------------------------------------------------------


def conv_kernel_init(init_type: str = "normal", init_gain: float = 0.02):
    """Kernel initialiser matching the reference's ``init_weights``."""
    if init_type == "normal":
        return nn.initializers.normal(stddev=init_gain)
    if init_type == "xavier":
        # torch xavier_normal_ with gain => variance gain^2 * 2/(fan_in+fan_out)
        return nn.initializers.variance_scaling(
            scale=init_gain * init_gain * 2.0, mode="fan_avg", distribution="normal"
        )
    if init_type == "kaiming":
        return nn.initializers.variance_scaling(
            scale=2.0, mode="fan_in", distribution="normal"
        )
    if init_type == "orthogonal":
        return nn.initializers.orthogonal(scale=init_gain)
    raise NotImplementedError(f"initialization method [{init_type}] is not implemented")


def norm_scale_init(norm: NormConfig, init_gain: float = 0.02):
    """Batch-like norm scales start at N(1, gain); instance norms at 1.

    (The reference's init_weights only re-draws ``BatchNorm2d`` weights;
    instance-norm affine weights keep torch's default of exactly 1 —
    networks.py:137-141.)
    """
    if norm.is_batch_like:

        def init(key, shape, dtype=jnp.float32):
            return 1.0 + init_gain * jax.random.normal(key, shape, dtype)

        return init
    return nn.initializers.ones


# ---------------------------------------------------------------------------
# Transposed convolution (torch geometry)
# ---------------------------------------------------------------------------


class ConvTranspose2d(nn.Module):
    """Stride-s transposed conv with torch's output geometry
    (kernel k, padding p, output_padding op => out = in*s for k=3,p=1,op=1,s=2).

    Implemented as an input-dilated conv:
      conv_general_dilated(x, kernel, padding=((k-1-p, k-1-p+op),)*2,
                           lhs_dilation=(s, s))
    Kernel layout is HWIO (kh, kw, in, out).  A torch ConvTranspose2d weight
    (in, out, kh, kw) maps to this kernel as flip(w, spatial).transpose(2,3,0,1)
    — verified numerically against torch (see cat_tpu/utils/torch_import.py).
    """

    features: int
    kernel: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    # 'dilated': one conv over a zero-dilated input (XLA computes k*k taps
    #   per output, 3/4 of which hit inserted zeros at s=2);
    # 'subpixel': 4 parity-class convs + depth-to-space interleave —
    #   identical math, only the 9 real taps computed.
    impl: str = "dilated"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, p, op = self.kernel, self.padding, self.output_padding
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (k, k, x.shape[-1], self.features),
            jnp.float32,
        )
        if self.impl == "subpixel" and (k, self.stride, p, op) == (3, 2, 1, 1):
            y = self._subpixel(x, kernel.astype(x.dtype))
        else:
            pad = (k - 1 - p, k - 1 - p + op)
            y = jax.lax.conv_general_dilated(
                x,
                kernel.astype(x.dtype),
                window_strides=(1, 1),
                padding=(pad, pad),
                lhs_dilation=(self.stride, self.stride),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y

    def _subpixel(self, x: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
        """k=3,s=2,p=1,op=1 transposed conv as 4 parity-class convs.

        With zpad = pad(dilate2(x), (1,2)) the dilated formulation gives
          y[2i]   = K[1] @ x[i]                    (per spatial dim)
          y[2i+1] = K[0] @ x[i] + K[2] @ x[i+1]
        i.e. the even parity uses the kernel's centre tap and the odd parity
        the two outer taps — 9 real MACs per input pixel instead of the 36
        the naive dilated lowering performs.  Outputs interleave back via
        depth-to-space.  Exact same math as the dilated path (parity test in
        tests/test_ops.py).
        """
        B, H, W, Ci = x.shape
        Co = K.shape[-1]
        dims = ("NHWC", "HWIO", "NHWC")

        def conv(inp, ker, ph, pw):
            return jax.lax.conv_general_dilated(
                inp, ker, (1, 1), (ph, pw), dimension_numbers=dims
            )

        # sub-kernels: rows/cols of K by output parity (see docstring)
        even_h, odd_h = K[1:2], K[::2]  # (1,3,..) and (2,3,..)
        y00 = conv(x, even_h[:, 1:2], (0, 0), (0, 0))          # (1,1) taps
        y01 = conv(x, even_h[:, ::2], (0, 0), (0, 1))          # (1,2) taps
        y10 = conv(x, odd_h[:, 1:2], (0, 1), (0, 0))           # (2,1) taps
        y11 = conv(x, odd_h[:, ::2], (0, 1), (0, 1))           # (2,2) taps
        y = jnp.stack([y00, y01, y10, y11], axis=-2)           # (B,H,W,4,Co)
        y = y.reshape(B, H, W, 2, 2, Co).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(B, 2 * H, 2 * W, Co)


# ---------------------------------------------------------------------------
# Normalisation
# ---------------------------------------------------------------------------


class Norm2d(nn.Module):
    """Instance / batch / sync-batch / no normalisation over NHWC.

    Replaces the reference's ``get_norm_layer`` zoo *and* its hand-rolled
    ``SynchronizedBatchNorm2d`` (models/modules/sync_batchnorm/batchnorm.py):
    under GSPMD jit the batch mean/var below are global-batch reductions, so
    ``batch`` over a sharded batch axis already *is* synchronized batch norm.
    ``axis_name`` is only needed under ``shard_map``/``pmap``, where the
    per-shard statistics are explicitly ``pmean``-ed.

    Running-stat semantics match torch: ``running = (1-m)*running + m*batch``
    with the *unbiased* batch variance feeding the running estimate and the
    *biased* one used for normalisation.
    """

    cfg: NormConfig
    scale_init: Callable = nn.initializers.ones
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        if cfg.kind == "none":
            return x
        c = x.shape[-1]
        xf = x.astype(jnp.float32)

        if cfg.kind == "instance":
            mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
            var = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True) - jnp.square(mean)
            y = (xf - mean) * jax.lax.rsqrt(var + cfg.eps)
        else:  # batch / syncbatch
            use_running = cfg.track_running_stats
            if use_running:
                ra_mean = self.variable(
                    "batch_stats", "mean", nn.initializers.zeros, None, (c,), jnp.float32
                )
                ra_var = self.variable(
                    "batch_stats", "var", nn.initializers.ones, None, (c,), jnp.float32
                )
            if train or not cfg.track_running_stats:
                mean = jnp.mean(xf, axis=(0, 1, 2))
                mean2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
                if self.axis_name is not None:
                    mean = jax.lax.pmean(mean, self.axis_name)
                    mean2 = jax.lax.pmean(mean2, self.axis_name)
                var = mean2 - jnp.square(mean)
                if use_running and train and not self.is_initializing():
                    n = x.shape[0] * x.shape[1] * x.shape[2]
                    if self.axis_name is not None:
                        n = n * jax.lax.psum(1, self.axis_name)
                    unbiased = var * (n / max(n - 1, 1))
                    m = cfg.momentum
                    ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                    ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
            else:
                mean, var = ra_mean.value, ra_var.value
            y = (xf - mean) * jax.lax.rsqrt(var + cfg.eps)

        if cfg.affine:
            scale = self.param("scale", self.scale_init, (c,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            y = y * scale + bias
        return y.astype(x.dtype)
