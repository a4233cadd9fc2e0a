"""DRN-D-105 segmentation judge for Cityscapes mIoU (Flax, NHWC).

Reference: metric/drn.py (dilated residual network, arch 'D', Bottleneck
[1,1,3,4,23,3,1,1], channels (16,32,64,128,256,512,512,512)) and
metric/mIoU_score.py:127-171 (DRNSeg = backbone + 1x1 seg head + frozen
bilinear x8 transposed-conv upsampling).

Inference-only: batch norms fold their running statistics as plain params.
Weights convert from the reference's drn-d-105_ms_cityscapes.pth via
``convert_torch_drnseg``.

Evaluation-harness deviation (documented): the reference resizes the logit
maps to 2048x1024 with per-channel PIL bilinear on host threads
(mIoU_score.py:180-206); we resize on device with jax.image.resize bilinear
(same half-pixel convention) — differences are sub-ULP relative to logit
magnitudes and do not move the argmax except at exact ties.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

DRN_D_105_LAYERS = (1, 1, 3, 4, 23, 3, 1, 1)
DRN_CHANNELS = (16, 32, 64, 128, 256, 512, 512, 512)


class FrozenBN(nn.Module):
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = self.features
        mean = self.param("bn_mean", nn.initializers.zeros, (c,))
        var = self.param("bn_var", nn.initializers.ones, (c,))
        scale = self.param("bn_scale", nn.initializers.ones, (c,))
        bias = self.param("bn_bias", nn.initializers.zeros, (c,))
        return (x - mean) * lax.rsqrt(var + self.eps) * scale + bias


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        pad = self.dilation if self.kernel == 3 else 0
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False, name="conv",
        )(x)
        x = FrozenBN(self.features, name="bn")(x)
        return jax.nn.relu(x) if self.relu else x


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        out = ConvBN(self.planes, 1, name="c1")(x)
        out = ConvBN(self.planes, 3, stride=self.stride,
                     dilation=self.dilation, name="c2")(out)
        out = ConvBN(self.planes * 4, 1, relu=False, name="c3")(out)
        if self.has_downsample:
            res = ConvBN(self.planes * 4, 1, stride=self.stride,
                         relu=False, name="down")(x)
        else:
            res = x
        return jax.nn.relu(out + res)


class DRND(nn.Module):
    """Arch-'D' dilated residual backbone; output stride 8.

    Default spec is DRN-D-105; smaller variants (for tests) only change
    ``layers``/``channels``.
    """

    layers: Tuple[int, ...] = DRN_D_105_LAYERS
    channels: Tuple[int, ...] = DRN_CHANNELS

    @nn.compact
    def __call__(self, x):
        ch = self.channels
        # layer0: 7x7 conv stride 1
        x = nn.Conv(ch[0], (7, 7), padding=((3, 3), (3, 3)), use_bias=False,
                    name="layer0_conv")(x)
        x = FrozenBN(ch[0], name="layer0_bn")(x)
        x = jax.nn.relu(x)
        # layer1/2: plain conv stages (the reference allows >1 conv here,
        # D-105 uses 1 each)
        for i in range(self.layers[0]):
            x = ConvBN(ch[0], 3, name=f"layer1_conv{i}")(x)
        for i in range(self.layers[1]):
            x = ConvBN(ch[1], 3, stride=2 if i == 0 else 1,
                       name=f"layer2_conv{i}")(x)
        # layer3..6: bottleneck stages
        specs = [  # (planes, blocks, stride, dilation)
            (ch[2], self.layers[2], 2, 1),
            (ch[3], self.layers[3], 2, 1),
            (ch[4], self.layers[4], 1, 2),
            (ch[5], self.layers[5], 1, 4),
        ]
        inplanes = ch[1]
        for li, (planes, blocks, stride, dil) in enumerate(specs, start=3):
            for b in range(blocks):
                if b == 0:
                    x = Bottleneck(
                        planes, stride=stride, dilation=dil,
                        has_downsample=(stride != 1 or inplanes != planes * 4),
                        name=f"layer{li}_block{b}",
                    )(x)
                    inplanes = planes * 4
                else:
                    x = Bottleneck(planes, dilation=dil,
                                   name=f"layer{li}_block{b}")(x)
        # layer7/8: plain dilated conv stages
        for i in range(self.layers[6]):
            x = ConvBN(ch[6], 3, dilation=2, name=f"layer7_conv{i}")(x)
        for i in range(self.layers[7]):
            x = ConvBN(ch[7], 3, dilation=1, name=f"layer8_conv{i}")(x)
        return x


DRND105 = DRND  # default spec is D-105


def bilinear_up_kernel(k: int = 16) -> np.ndarray:
    """The reference's fixed bilinear filler (mIoU_score.py:114-123)."""
    f = math.ceil(k / 2)
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    w = np.zeros((k, k), np.float32)
    for i in range(k):
        for j in range(k):
            w[i, j] = (1 - abs(i / f - c)) * (1 - abs(j / f - c))
    return w


class DRNSeg(nn.Module):
    """Backbone + 1x1 seg head + frozen bilinear x8 upsample."""

    classes: int = 19
    layers: Tuple[int, ...] = DRN_D_105_LAYERS
    channels: Tuple[int, ...] = DRN_CHANNELS

    @nn.compact
    def __call__(self, x, upsample: bool = True):
        feats = DRND(self.layers, self.channels, name="base")(x)
        logits = nn.Conv(self.classes, (1, 1), use_bias=True, name="seg")(feats)
        if not upsample:
            return logits
        # depthwise transposed conv, torch geometry (k16 s8 p4), fixed kernel
        k = bilinear_up_kernel(16)
        kernel = jnp.asarray(k)[:, :, None, None] * jnp.ones((1, 1, 1, self.classes))
        up = lax.conv_general_dilated(
            logits, kernel,
            window_strides=(1, 1),
            padding=((11, 11), (11, 11)),
            lhs_dilation=(8, 8),
            feature_group_count=self.classes,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return up


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------


def _put(tree, path, val):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = val


def convert_torch_drnseg(
    state_dict: Dict[str, Any],
    classes: int = 19,
    layers: Tuple[int, ...] = DRN_D_105_LAYERS,
) -> Dict:
    """drn-d-105_ms_cityscapes.pth (DRNSeg state_dict) -> flax variables."""
    params: Dict[str, Any] = {}
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in state_dict.items()}

    def np_(v):
        return v.numpy() if hasattr(v, "numpy") else np.asarray(v)

    def conv_k(v):
        return np_(v).transpose(2, 3, 1, 0)

    def put_bn(scope, prefix):
        _put(params, scope + ("bn_scale",), np_(sd[f"{prefix}.weight"]))
        _put(params, scope + ("bn_bias",), np_(sd[f"{prefix}.bias"]))
        _put(params, scope + ("bn_mean",), np_(sd[f"{prefix}.running_mean"]))
        _put(params, scope + ("bn_var",), np_(sd[f"{prefix}.running_var"]))

    # base.0 = layer0 (conv,bn); base.1/2 = conv stages; base.3..6 bottleneck
    # stages; base.7/8 conv stages (children order of the reference DRN)
    _put(params, ("base", "layer0_conv", "kernel"), conv_k(sd["base.0.0.weight"]))
    put_bn(("base", "layer0_bn"), "base.0.1")
    for li in (1, 2):
        for i in range(layers[li - 1]):
            # (conv, bn, relu) triples within the stage Sequential
            _put(params, ("base", f"layer{li}_conv{i}", "conv", "kernel"),
                 conv_k(sd[f"base.{li}.{3 * i}.weight"]))
            put_bn(("base", f"layer{li}_conv{i}", "bn"), f"base.{li}.{3 * i + 1}")
    n_blocks = {3: layers[2], 4: layers[3], 5: layers[4], 6: layers[5]}
    for li, blocks in n_blocks.items():
        for b in range(blocks):
            scope = ("base", f"layer{li}_block{b}")
            for ci in (1, 2, 3):
                _put(params, scope + (f"c{ci}", "conv", "kernel"),
                     conv_k(sd[f"base.{li}.{b}.conv{ci}.weight"]))
                put_bn(scope + (f"c{ci}", "bn"), f"base.{li}.{b}.bn{ci}")
            if f"base.{li}.{b}.downsample.0.weight" in sd:
                _put(params, scope + ("down", "conv", "kernel"),
                     conv_k(sd[f"base.{li}.{b}.downsample.0.weight"]))
                put_bn(scope + ("down", "bn"), f"base.{li}.{b}.downsample.1")
    for li in (7, 8):
        for i in range(layers[li - 1]):
            _put(params, ("base", f"layer{li}_conv{i}", "conv", "kernel"),
                 conv_k(sd[f"base.{li}.{3 * i}.weight"]))
            put_bn(("base", f"layer{li}_conv{i}", "bn"), f"base.{li}.{3 * i + 1}")
    _put(params, ("seg", "kernel"), conv_k(sd["seg.weight"]))
    _put(params, ("seg", "bias"), np_(sd["seg.bias"]))
    return {"params": params}


def save_drnseg(path: str, model: DRNSeg, variables: Dict) -> str:
    """Persist a (possibly reduced-spec) DRNSeg judge natively: .msgpack
    weights + .json spec sidecar (classes/layers/channels) — the same
    config-is-explicit contract as every other checkpoint in this repo
    (utils/checkpoint.save_net).  Used by tools/train_synth_drn.py to ship
    a synthetic-cityscapes-trained judge that make_miou_evaluator can load
    where no egress for drn-d-105_ms_cityscapes.pth exists."""
    import json

    from cat_tpu.utils.checkpoint import save_pytree

    if not path.endswith(".msgpack"):
        path += ".msgpack"
    save_pytree(path, variables)
    with open(path[: -len(".msgpack")] + ".json", "w") as f:
        json.dump({"classes": model.classes,
                   "layers": list(model.layers),
                   "channels": list(model.channels)}, f)
    return path


def load_drnseg(path: str, classes: int = 19) -> Tuple[DRNSeg, Dict]:
    """Load a segmentation judge: the reference's
    drn-d-105_ms_cityscapes.pth (torch state_dict, shape conversion) or a
    native .msgpack + .json spec pair written by ``save_drnseg``."""
    if path.endswith(".msgpack"):
        import json

        from cat_tpu.utils.checkpoint import load_pytree

        with open(path[: -len(".msgpack")] + ".json") as f:
            meta = json.load(f)
        model = DRNSeg(classes=int(meta["classes"]),
                       layers=tuple(meta["layers"]),
                       channels=tuple(meta["channels"]))
        return model, load_pytree(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    model = DRNSeg(classes=classes)
    return model, convert_torch_drnseg(sd, classes)


# ---------------------------------------------------------------------------
# mIoU evaluation harness (reference mIoU_score.test:209-247)
# ---------------------------------------------------------------------------


def get_miou(
    fakes_m11: np.ndarray,
    labels: Sequence[np.ndarray],
    model: DRNSeg,
    variables: Dict,
    batch_size: int = 2,
    target_hw: Tuple[int, int] = (1024, 2048),
    num_classes: Optional[int] = None,
    mesh=None,
    hist_reduce=None,
) -> float:
    """mIoU of generated street photos against trainId GT maps.

    fakes: [-1,1] NHWC generated images; labels: uint8 trainId maps at
    (1024, 2048).  Images are normalised with the cityscapes statistics,
    segmented, logits bilinearly resized to the label resolution, argmaxed,
    histogrammed.  ``mesh`` shards the DRN judge forward over the data axis
    (fast_hist stays host-side — SURVEY §5.8).
    """
    from cat_tpu.metrics.miou import (
        CITYSCAPES_MEAN,
        CITYSCAPES_STD,
        fast_hist,
        mean_iou,
    )

    if num_classes is None:
        # follow the judge: 19 for the reference DRN-D-105, smaller for
        # synthetic-trained reduced judges (tools/train_synth_drn.py)
        num_classes = model.classes

    @jax.jit
    def run(x01):
        # fakes are bilinearly upscaled to the label resolution BEFORE the
        # judge (reference SegList FromArray([2048,1024]), mIoU_score.py:72-75)
        x01 = jax.image.resize(
            x01, (x01.shape[0], target_hw[0], target_hw[1], x01.shape[-1]),
            method="bilinear",
        )
        x = (x01 - CITYSCAPES_MEAN) / CITYSCAPES_STD
        logits = model.apply(variables, x.astype(jnp.float32))
        logits = jax.image.resize(
            logits,
            (logits.shape[0], target_hw[0], target_hw[1], logits.shape[-1]),
            method="bilinear",
        )
        return jnp.argmax(logits, axis=-1)

    hist = np.zeros((num_classes, num_classes), np.int64)
    n = fakes_m11.shape[0]
    for i in range(0, n, batch_size):
        chunk = np.asarray(fakes_m11[i : i + batch_size])
        x01 = (chunk + 1.0) / 2.0
        if mesh is not None:
            from cat_tpu.parallel.mesh import shard_eval_array

            x, real = shard_eval_array(np.asarray(x01, np.float32), mesh)
            pred = np.asarray(run(x))[:real]
        else:
            pred = np.asarray(run(jnp.asarray(x01, jnp.float32)))
        for j in range(pred.shape[0]):
            hist += fast_hist(pred[j].ravel(), np.asarray(labels[i + j]).ravel(),
                              num_classes)
    if hist_reduce is not None:
        # multi-host eval sharding: merge per-process confusion matrices
        # (parallel.multihost.reduce_hist) before the IoU
        hist = hist_reduce(hist)
    return round(mean_iou(hist), 2)
