"""The ``inception_9blocks`` ResNet-style generator.

Reference: models/modules/inception_architecture/inception_generator.py:12-145.

TPU-native departures:
  * NHWC layout, HWIO kernels; transposed convs use the torch-geometry
    ``ConvTranspose2d`` from cat_tpu.ops.nn (input-dilated conv with
    k=3, s=2, p=1, output_padding=1 — exact 2x upsampling and numerical
    parity with the reference's torch ConvTranspose2d).
  * Intermediate activations for distillation are *returned* via the ``taps``
    argument instead of captured by forward hooks
    (reference: distillers/base_inception_distiller.py:247-269).

Tap names and their reference equivalents:
  ``encode``  == ``down_sampling.9``  (output of the downsampling trunk)
  ``block{i}`` == ``features.{i}``    (output of the i-th inception block)

Canonical parameter tree (drives pruning & weight transfer):
  stem / down{j} / block{i}/(res|dw){b}_(in|mid|out), block{i}/pw_norm /
  up{j} / head
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from cat_tpu.core.config import InceptionGeneratorConfig
from cat_tpu.models.blocks import ConvNormAct, InceptionBlock
from cat_tpu.ops.nn import Norm2d, activation, conv_kernel_init, norm_scale_init, spatial_pad

# Default distillation taps: after the encoder and after features 2/5/8
# (reference: base_inception_distiller.py:183-190).
DEFAULT_MAPPING_LAYERS = ("encode", "block2", "block5", "block8")


class InceptionGenerator(nn.Module):
    cfg: InceptionGeneratorConfig
    init_type: str = "normal"
    init_gain: float = 0.02
    axis_name: Optional[str] = None
    fused_norms: bool = False  # single-pass Pallas instance-norm+relu
    packed_blocks: bool = False  # branch-packed inception blocks (same math)
    upsample_impl: str = "dilated"  # 'dilated' | 'subpixel' (same math)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        taps: Sequence[str] = (),
    ):
        cfg = self.cfg
        # The reference sets conv bias on iff the norm is InstanceNorm
        # (inception_generator.py:30-34).
        use_bias = cfg.norm.kind in ("instance", "none")
        acts: Dict[str, jnp.ndarray] = {}

        def cna(features, kernel, stride=1, pad=0, pad_mode="zero", name=None):
            return ConvNormAct(
                features=features,
                kernel=kernel,
                stride=stride,
                use_bias=use_bias,
                norm=cfg.norm,
                act=cfg.active_fn,
                pad=pad,
                pad_mode=pad_mode,
                init_type=self.init_type,
                init_gain=self.init_gain,
                axis_name=self.axis_name,
                fused=self.fused_norms,
                name=name,
            )

        # --- downsampling trunk -------------------------------------------
        h = cna(cfg.ds_channels[0], 7, pad=3, pad_mode=cfg.padding_type, name="stem")(
            x, train=train
        )
        for j, ch in enumerate(cfg.ds_channels[1:]):
            # zero-padded stride-2 3x3 conv (inception_generator.py:44-56)
            h = cna(ch, 3, stride=2, pad=1, pad_mode="zero", name=f"down{j}")(
                h, train=train
            )
        if "encode" in taps:
            acts["encode"] = h

        # --- inception blocks ----------------------------------------------
        for i, bcfg in enumerate(cfg.blocks):
            h = InceptionBlock(
                bcfg,
                norm=cfg.norm,
                padding_type=cfg.padding_type,
                active_fn=cfg.active_fn,
                dropout_rate=cfg.dropout_rate,
                use_bias=use_bias,
                init_type=self.init_type,
                init_gain=self.init_gain,
                axis_name=self.axis_name,
                fused_norms=self.fused_norms,
                packed=self.packed_blocks,
                name=f"block{i}",
            )(h, train=train)
            name = f"block{i}"
            if name in taps:
                acts[name] = h

        # --- upsampling trunk ----------------------------------------------
        from cat_tpu.ops.nn import ConvTranspose2d

        for j, ch in enumerate(cfg.us_channels):
            h = ConvTranspose2d(
                features=ch,
                kernel=3,
                stride=2,
                padding=1,
                output_padding=1,
                use_bias=use_bias,
                kernel_init=conv_kernel_init(self.init_type, self.init_gain),
                impl=self.upsample_impl,
                name=f"up{j}_conv",
            )(h)
            h = Norm2d(
                cfg.norm,
                scale_init=norm_scale_init(cfg.norm, self.init_gain),
                axis_name=self.axis_name,
                name=f"up{j}_norm",
            )(h, train=train)
            h = activation(cfg.active_fn)(h)

        h = spatial_pad(h, 3, cfg.padding_type)
        h = nn.Conv(
            features=cfg.output_nc,
            kernel_size=(7, 7),
            padding="VALID",
            use_bias=True,
            kernel_init=conv_kernel_init(self.init_type, self.init_gain),
            name="head",
        )(h)
        y = jnp.tanh(h)
        if taps:
            return y, acts
        return y
