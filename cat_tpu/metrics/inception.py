"""FID-variant InceptionV3 feature extractor in Flax (NHWC).

Reproduces the architecture of the TensorFlow-FID Inception network (the
"pt_inception-2015-12-05" port used by the reference — metric/inception.py):
standard torchvision InceptionV3 topology with the FID quirks:

  * InceptionA/C and Mixed_7b's InceptionE use average pooling that EXCLUDES
    padding from the divisor,
  * Mixed_7c's InceptionE uses max pooling in its pool branch.

Weights load from the reference's .pth checkpoint via
``convert_torch_inception`` (OIHW -> HWIO transposition, BN stats folded as
plain arrays).  The module is inference-only: batch-norm always uses the
stored running statistics (eps = 1e-3, the torchvision value).

Input contract matches the reference (metric/inception.py:113-147): NHWC in
[0, 1]; optional bilinear resize to 299 (half-pixel centers == torch
align_corners=False) and [0,1] -> [-1,1] scaling; features are the 2048-dim
final average pool (block 3).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

BLOCK_INDEX_BY_DIM = {64: 0, 192: 1, 768: 2, 2048: 3}


# ---------------------------------------------------------------------------
# pooling helpers
# ---------------------------------------------------------------------------


def max_pool(x, window=3, stride=2, pad=0):
    padding = ((pad, pad), (pad, pad))
    return nn.max_pool(x, (window, window), (stride, stride), padding)


def avg_pool_excl_pad(x, window=3, stride=1, pad=1):
    """Average pool with count_include_pad=False (divide by true window)."""
    padding = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    sums = lax.reduce_window(
        x, 0.0, lax.add, (1, window, window, 1), (1, stride, stride, 1), padding
    )
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    counts = lax.reduce_window(
        ones, 0.0, lax.add, (1, window, window, 1), (1, stride, stride, 1), padding
    )
    return sums / counts


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------


class BasicConv2d(nn.Module):
    """conv(bias=False) + frozen BN(eps=1e-3) + relu."""

    features: int
    kernel: Tuple[int, int]
    stride: int = 1
    pad: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=(self.stride, self.stride),
            padding=(
                (self.pad[0], self.pad[0]),
                (self.pad[1], self.pad[1]),
            ),
            use_bias=False,
            name="conv",
        )(x)
        c = self.features
        mean = self.param("bn_mean", nn.initializers.zeros, (c,))
        var = self.param("bn_var", nn.initializers.ones, (c,))
        scale = self.param("bn_scale", nn.initializers.ones, (c,))
        bias = self.param("bn_bias", nn.initializers.zeros, (c,))
        x = (x - mean) * lax.rsqrt(var + 1e-3) * scale + bias
        return jax.nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), pad=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), pad=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), pad=(1, 1), name="branch3x3dbl_3")(b3)
        bp = avg_pool_excl_pad(x)  # FID variant: exclude padding
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), pad=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), pad=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), pad=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), pad=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), pad=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), pad=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), pad=(0, 3), name="branch7x7dbl_5")(bd)
        bp = avg_pool_excl_pad(x)  # FID variant
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), pad=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), pad=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_kind: str = "avg"  # 'avg' (Mixed_7b, FID excl-pad) | 'max' (Mixed_7c)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), pad=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), pad=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), pad=(1, 1), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), pad=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), pad=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_kind == "max":
            bp = max_pool(x, 3, 1, 1)
        else:
            bp = avg_pool_excl_pad(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """Feature extractor; returns features of the requested blocks."""

    output_blocks: Tuple[int, ...] = (3,)
    resize_input: bool = True
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x):
        last = max(self.output_blocks)
        outputs = {}
        if self.resize_input:
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[3]), method="bilinear"
            )
        if self.normalize_input:
            x = 2.0 * x - 1.0

        # block 0
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), pad=(1, 1), name="Conv2d_2b_3x3")(x)
        x = max_pool(x)
        outputs[0] = x
        if last >= 1:
            x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
            x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
            x = max_pool(x)
            outputs[1] = x
        if last >= 2:
            x = InceptionA(32, name="Mixed_5b")(x)
            x = InceptionA(64, name="Mixed_5c")(x)
            x = InceptionA(64, name="Mixed_5d")(x)
            x = InceptionB(name="Mixed_6a")(x)
            x = InceptionC(128, name="Mixed_6b")(x)
            x = InceptionC(160, name="Mixed_6c")(x)
            x = InceptionC(160, name="Mixed_6d")(x)
            x = InceptionC(192, name="Mixed_6e")(x)
            outputs[2] = x
        if last >= 3:
            x = InceptionD(name="Mixed_7a")(x)
            x = InceptionE("avg", name="Mixed_7b")(x)
            x = InceptionE("max", name="Mixed_7c")(x)
            x = jnp.mean(x, axis=(1, 2), keepdims=False)  # global average pool
            outputs[3] = x
        return [outputs[i] for i in sorted(self.output_blocks)]


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------


def convert_torch_inception(state_dict: Dict[str, Any]) -> Dict:
    """Convert the pt_inception-2015-12-05 torch state_dict to flax params.

    Torch module names map 1:1 to flax submodule names; conv kernels
    transpose OIHW -> HWIO; BN stats/affine become the bn_* params.
    """
    params: Dict[str, Any] = {}

    def put(path: Sequence[str], value):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    for key, value in state_dict.items():
        v = value.numpy() if hasattr(value, "numpy") else np.asarray(value)
        parts = key.split(".")
        if parts[0] == "fc" or "AuxLogits" in parts[0]:
            continue  # classifier heads unused for features
        layer, kind = parts[-2], parts[-1]
        # torch: <Block>.<branch>.conv.weight / .bn.{weight,bias,running_mean,running_var}
        flax_scope = list(parts[:-2])
        if layer == "conv" and kind == "weight":
            put(flax_scope + ["conv", "kernel"], v.transpose(2, 3, 1, 0))
        elif layer == "bn":
            name = {
                "weight": "bn_scale",
                "bias": "bn_bias",
                "running_mean": "bn_mean",
                "running_var": "bn_var",
            }.get(kind)
            if name is not None:
                put(flax_scope + [name], v)
    return {"params": params}


def validate_params(model: nn.Module, variables: Dict, sample_shape=(1, 64, 64, 3)):
    """Assert converted params exactly match the module's expected tree."""
    expected = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros(sample_shape))
    )["params"]
    exp_shapes = jax.tree.map(lambda x: tuple(x.shape), expected)
    got_shapes = jax.tree.map(lambda x: tuple(np.asarray(x).shape), variables["params"])
    if exp_shapes != got_shapes:
        raise ValueError(
            "converted parameter tree does not match the model; "
            f"expected top-level keys {sorted(expected)} vs got "
            f"{sorted(variables['params'])}"
        )


def load_inception(path: str, output_blocks: Tuple[int, ...] = (3,)) -> Tuple[InceptionV3FID, Dict]:
    """Load the FID InceptionV3 from a torch .pth checkpoint."""
    import torch

    state_dict = torch.load(path, map_location="cpu", weights_only=True)
    model = InceptionV3FID(output_blocks=output_blocks)
    variables = convert_torch_inception(state_dict)
    validate_params(model, variables)
    return model, variables
