"""DeepLab v2 (dilated ResNet + ASPP) and the MSC multi-scale wrapper.

Reference: metric/deeplabv2.py — imported by the reference's metric package
(metric/__init__.py:4) but unused by any shipped config (vestigial, from the
gan-compression lineage).  Ported for inventory completeness so a user
relying on the reference's public `DeepLabV2`/`MSC` symbols finds working
TPU-native counterparts.

Architecture (reference metric/deeplabv2.py:170-187): output stride 8;
ch = [64*2**p for p in range(6)]; layer1 = 7x7/2 stem + ceil-mode 3x3/2
max-pool; layer2..5 = bottleneck res-layers (expansion 4) at strides
(1,2,1,1) and dilations (1,1,2,4); head = ASPP (parallel 3x3 atrous convs,
summed — :109-134).  MSC (:137-167) runs the base at scales
{1, 0.5, 0.75}, bilinearly resizes the pyramid logits to the full-scale
logit grid, and takes the element-wise max (training mode additionally
returns the per-scale logits).

Inference-judge conventions follow cat_tpu.metrics.drn: NHWC, frozen batch
norms holding their running statistics as plain params, and a
``convert_torch_deeplabv2`` state-dict converter.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

from cat_tpu.metrics.drn import FrozenBN

BOTTLENECK_EXPANSION = 4  # reference metric/deeplabv2.py:5


class CBR(nn.Module):
    """Conv(bias-free) + frozen BN + optional ReLU (reference :74-104)."""

    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        p = self.padding
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False, name="conv",
        )(x)
        x = FrozenBN(self.features, name="bn")(x)
        return jax.nn.relu(x) if self.relu else x


class Bottleneck(nn.Module):
    """MSRA-ResNet bottleneck (reference :9-28)."""

    features: int  # out_ch
    stride: int = 1
    dilation: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        mid = self.features // BOTTLENECK_EXPANSION
        h = CBR(mid, 1, stride=self.stride, name="reduce")(x)
        h = CBR(mid, 3, padding=self.dilation, dilation=self.dilation,
                name="conv3x3")(h)
        h = CBR(self.features, 1, relu=False, name="increase")(h)
        if self.downsample:
            sc = CBR(self.features, 1, stride=self.stride, relu=False,
                     name="shortcut")(x)
        else:
            sc = x
        return jax.nn.relu(h + sc)


def _ceil_maxpool(x, kernel: int = 3, stride: int = 2, padding: int = 1):
    """MaxPool2d(k, s, p, ceil_mode=True) on NHWC (reference stem :38)."""
    n, h, w, c = x.shape

    def hi_pad(size: int) -> int:
        out = -(-(size + 2 * padding - kernel) // stride) + 1  # ceil div
        return max(0, (out - 1) * stride + kernel - size - padding)

    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, hi_pad(h)), (padding, hi_pad(w)), (0, 0)),
    )


class Stem(nn.Module):
    """7x7/2 conv + ceil-mode max pool (reference _Stem :31-38)."""

    features: int

    @nn.compact
    def __call__(self, x):
        x = CBR(self.features, 7, stride=2, padding=3, name="conv1")(x)
        return _ceil_maxpool(x)


class ResLayer(nn.Module):
    """n bottlenecks; stride/downsample on the first, multi-grid dilations
    (reference _ResLayer :41-71)."""

    n_layers: int
    features: int
    stride: int = 1
    dilation: int = 1
    multi_grids: Tuple[int, ...] = ()

    @nn.compact
    def __call__(self, x):
        grids = self.multi_grids or (1,) * self.n_layers
        assert len(grids) == self.n_layers
        for i in range(self.n_layers):
            x = Bottleneck(
                self.features,
                stride=self.stride if i == 0 else 1,
                dilation=self.dilation * grids[i],
                downsample=(i == 0),
                name=f"block{i + 1}",
            )(x)
        return x


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling: summed parallel 3x3 atrous convs
    (reference _ASPP :107-134)."""

    n_classes: int
    rates: Tuple[int, ...]

    @nn.compact
    def __call__(self, x):
        out = 0.0
        for i, rate in enumerate(self.rates):
            out = out + nn.Conv(
                self.n_classes, (3, 3),
                padding=((rate, rate), (rate, rate)),
                kernel_dilation=(rate, rate),
                use_bias=True,
                kernel_init=nn.initializers.normal(0.01),
                name=f"c{i}",
            )(x)
        return out


class DeepLabV2(nn.Module):
    """Dilated ResNet + ASPP, output stride 8 (reference :170-187)."""

    n_classes: int
    n_blocks: Tuple[int, ...]
    atrous_rates: Tuple[int, ...]

    @nn.compact
    def __call__(self, x):
        ch = [64 * 2 ** p for p in range(6)]
        x = Stem(ch[0], name="layer1")(x)
        x = ResLayer(self.n_blocks[0], ch[2], 1, 1, name="layer2")(x)
        x = ResLayer(self.n_blocks[1], ch[3], 2, 1, name="layer3")(x)
        x = ResLayer(self.n_blocks[2], ch[4], 1, 2, name="layer4")(x)
        x = ResLayer(self.n_blocks[3], ch[5], 1, 4, name="layer5")(x)
        return ASPP(self.n_classes, self.atrous_rates, name="aspp")(x)


def _interp_axis(x, axis: int, out_size: int, scale: float):
    src = jnp.maximum((jnp.arange(out_size) + 0.5) * scale - 0.5, 0.0)
    lo = jnp.floor(src).astype(jnp.int32)
    lo = jnp.minimum(lo, x.shape[axis] - 1)
    hi = jnp.minimum(lo + 1, x.shape[axis] - 1)
    w = (src - lo).reshape([out_size if a == axis else 1
                            for a in range(x.ndim)])
    return jnp.take(x, lo, axis=axis) * (1 - w) + jnp.take(x, hi, axis=axis) * w


def interpolate_bilinear(x, out_hw: Tuple[int, int],
                         scale_factor: float | None = None):
    """torch ``F.interpolate(bilinear, align_corners=False)`` on NHWC.

    Matches torch's coordinate math exactly: with ``scale_factor`` given
    (and torch's default ``recompute_scale_factor=False``) the source
    coordinate uses the *given* factor, ``(dst+0.5)/sf - 0.5``; with an
    explicit size it uses the in/out size ratio.  ``jax.image.resize``
    always uses the size ratio, which diverges on odd sizes (e.g. 33 -> 16
    at sf 0.5: ratio 2.0625 vs torch's 2.0).
    """
    sh = scale_factor and 1.0 / scale_factor
    x = _interp_axis(x, 1, out_hw[0], sh or x.shape[1] / out_hw[0])
    x = _interp_axis(x, 2, out_hw[1], sh or x.shape[2] / out_hw[1])
    return x


class MSC(nn.Module):
    """Multi-scale inputs wrapper (reference MSC :137-167): max-fuse the
    base logits with pyramid logits resized to the full-scale logit grid.

    ``train=True`` returns ``[logits, *logits_pyramid, logits_max]``
    exactly like the reference's training mode; eval returns the max.
    """

    base: nn.Module
    scales: Tuple[float, ...] = (0.5, 0.75)

    @nn.compact
    def __call__(self, x, train: bool = False):
        logits = self.base(x)
        n, lh, lw, c = logits.shape

        pyramid = []
        for p in self.scales:
            # torch scale_factor sizing: floor(in * scale)
            sh, sw = int(x.shape[1] * p), int(x.shape[2] * p)
            h = interpolate_bilinear(x, (sh, sw), scale_factor=p)
            pyramid.append(self.base(h))

        logits_all = [logits] + [interpolate_bilinear(t, (lh, lw))
                                 for t in pyramid]
        logits_max = jnp.max(jnp.stack(logits_all), axis=0)
        if train:
            return [logits] + pyramid + [logits_max]
        return logits_max


# ---------------------------------------------------------------------------
# torch state-dict conversion
# ---------------------------------------------------------------------------

_BN_LEAF = {
    "weight": "bn_scale",
    "bias": "bn_bias",
    "running_mean": "bn_mean",
    "running_var": "bn_var",
}


def convert_torch_deeplabv2(state_dict: Dict[str, Any]) -> Dict:
    """Map a reference DeepLabV2 state_dict onto the Flax param tree.

    Key layouts (reference metric/deeplabv2.py):
      layer1.conv1.{conv.weight, bn.*}
      layerN.blockM.{reduce,conv3x3,increase,shortcut}.{conv.weight, bn.*}
      aspp.cI.{weight, bias}
    A leading ``base.`` prefix (MSC-wrapped checkpoints) is stripped.
    """
    params: Dict[str, Any] = {}

    def put(path, val):
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jnp.asarray(val)

    for key, v in state_dict.items():
        v = np.asarray(getattr(v, "numpy", lambda: v)())
        parts = key.split(".")
        if parts[0] == "base":
            parts = parts[1:]
        if parts[-1] == "num_batches_tracked":
            continue
        if parts[0] == "aspp":
            # aspp.cI.weight / .bias
            leaf = "kernel" if parts[-1] == "weight" else "bias"
            val = v.transpose(2, 3, 1, 0) if leaf == "kernel" else v
            put(["aspp", parts[1], leaf], val)
        elif parts[-2] == "conv":
            put(parts[:-2] + ["conv", "kernel"], v.transpose(2, 3, 1, 0))
        elif parts[-2] == "bn":
            put(parts[:-2] + ["bn", _BN_LEAF[parts[-1]]], v)
        else:  # pragma: no cover - unknown key layout
            raise ValueError(f"unexpected DeepLabV2 key: {key}")
    return {"params": params}
