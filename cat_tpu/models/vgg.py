"""VGG19 perceptual loss (SPADE training).

Reference: models/modules/loss.py:151-203 — five relu_x_1 slices of
torchvision VGG19, L1-weighted [1/32, 1/16, 1/8, 1/4, 1].  The reference
feeds [-1,1] images straight in (no ImageNet normalisation); kept as-is.

Weights load from a torchvision VGG19 state_dict via
``convert_torch_vgg19`` (the judge network itself trains nothing).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# torchvision vgg19.features conv layer indices and widths
_VGG19_CONVS = [
    (0, 64), (2, 64),
    (5, 128), (7, 128),
    (10, 256), (12, 256), (14, 256), (16, 256),
    (19, 512), (21, 512), (23, 512), (25, 512),
    (28, 512), (30, 512), (32, 512), (34, 512),
]
# slice boundaries (reference loss.py:161-170): features [0:2) [2:7) [7:12)
# [12:21) [21:30) => taps after conv indices 0, 5, 10, 19, 28 (their relus)
_SLICE_END_CONVS = (0, 5, 10, 19, 28)
_POOL_AFTER = {2, 7, 16, 25}  # maxpool follows these conv indices (within slices)

VGG_LOSS_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)


class VGG19Features(nn.Module):
    """Returns [relu1_1, relu2_1, relu3_1, relu4_1, relu5_1]."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        outs = []
        for idx, width in _VGG19_CONVS:
            x = nn.Conv(width, (3, 3), padding=((1, 1), (1, 1)), name=f"conv{idx}")(x)
            x = jax.nn.relu(x)
            if idx in _SLICE_END_CONVS:
                outs.append(x)
            if len(outs) == 5:
                break
            if idx in _POOL_AFTER:
                x = nn.max_pool(x, (2, 2), (2, 2))
        return outs


def convert_torch_vgg19(state_dict: Dict[str, Any]) -> Dict:
    """torchvision vgg19 (or vgg19.features) state_dict -> flax params."""
    params: Dict[str, Any] = {}
    for idx, _ in _VGG19_CONVS:
        for prefix in (f"features.{idx}", str(idx)):
            wkey = f"{prefix}.weight"
            if wkey in state_dict:
                w = state_dict[wkey]
                b = state_dict[f"{prefix}.bias"]
                w = w.numpy() if hasattr(w, "numpy") else np.asarray(w)
                b = b.numpy() if hasattr(b, "numpy") else np.asarray(b)
                params[f"conv{idx}"] = {
                    "kernel": w.transpose(2, 3, 1, 0),
                    "bias": b,
                }
                break
        else:
            raise KeyError(f"VGG19 conv features.{idx} missing from state_dict")
    return {"params": params}


def load_vgg19(path: str) -> Tuple[VGG19Features, Dict]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return VGG19Features(), convert_torch_vgg19(sd)


def vgg_loss(
    variables: Dict, x: jnp.ndarray, y: jnp.ndarray, compute_dtype=None
) -> jnp.ndarray:
    """Weighted L1 over the five slices; y is treated as constant
    (reference detaches the target, loss.py:196-202).

    ``compute_dtype`` (e.g. bfloat16) casts the VGG weights and inputs for
    the conv sweep — the TPU MXU accumulates bf16 matmuls/convs in f32, and
    each slice's L1 reduction below is taken in f32 either way, so only the
    stored activations lose mantissa.  The loss is a perceptual JUDGE (its
    gradient direction, not its 8th digit, is what trains G) and the conv
    sweep is the single most expensive term of the SPADE step at 512x256,
    so bf16 here is a pure throughput knob; float32 remains the default."""
    model = VGG19Features()
    if compute_dtype is not None and jnp.dtype(compute_dtype) != jnp.float32:
        cdt = jnp.dtype(compute_dtype)
        variables = jax.tree.map(
            lambda t: t.astype(cdt) if jnp.issubdtype(t.dtype, jnp.floating) else t,
            variables,
        )
        x, y = x.astype(cdt), y.astype(cdt)
    fx = model.apply(variables, x)
    fy = model.apply(variables, jax.lax.stop_gradient(y))
    total = jnp.zeros(())
    for w, a, b in zip(VGG_LOSS_WEIGHTS, fx, fy):
        d = jnp.abs(a.astype(jnp.float32) - jax.lax.stop_gradient(b).astype(jnp.float32))
        total = total + w * jnp.mean(d)
    return total
