"""Student export for deployment.

The reference exports the student to ONNX (onnx_exporter.py:134-163, opset
11, dynamic batch).  The TPU-native equivalents:

  * StableHLO (jax.export): the portable XLA dialect — loadable by any
    PJRT runtime (TPU/GPU/CPU serving) with a symbolic batch dimension,
  * TFLite via jax2tf (optional, for the reference's mobile target) when
    TensorFlow is present.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from cat_tpu.core.config import InceptionGeneratorConfig
from cat_tpu.models.generator import InceptionGenerator


def _forward_fn(cfg, variables: Dict):
    """(fn, per-sample input shape) for any registered generator config.

    Mirrors the reference exporter's generator-agnosticism
    (onnx_exporter.py:134-163 exports whatever netG_student is): inception
    students take an RGB image; SPADE students take the one-hot semantic map
    (+edges) at the latent aspect ratio."""
    from cat_tpu.core.spade_config import SPADEGeneratorConfig

    if isinstance(cfg, SPADEGeneratorConfig):
        from cat_tpu.models.spade import SPADEGenerator

        model = SPADEGenerator(cfg)
        h = int(cfg.crop_size / cfg.aspect_ratio)
        shape = (h, cfg.crop_size, cfg.semantic_nc)
    elif isinstance(cfg, InceptionGeneratorConfig):
        model = InceptionGenerator(cfg)
        shape = (None, None, cfg.input_nc)  # height/width supplied by caller
    else:
        raise NotImplementedError(f"export for config type {type(cfg).__name__}")

    def fn(x):
        return model.apply(variables, x)

    return fn, shape


def export_stablehlo(
    cfg,
    variables: Dict,
    height: int,
    width: int,
    path: str,
    dynamic_batch: bool = True,
) -> str:
    """Serialise the student forward as StableHLO with a symbolic batch."""
    from jax import export as jexport

    fn, shape = _forward_fn(cfg, variables)
    h, w, c = shape[0] or height, shape[1] or width, shape[2]
    if dynamic_batch:
        (batch,) = jexport.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((batch, h, w, c), jnp.float32)
    else:
        spec = jax.ShapeDtypeStruct((1, h, w, c), jnp.float32)
    exported = jexport.export(jax.jit(fn))(spec)
    data = exported.serialize()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    return path


def load_stablehlo(path: str):
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


def export_tflite(
    cfg,
    variables: Dict,
    height: int,
    width: int,
    path: str,
) -> Optional[str]:
    """TFLite export (mobile target parity); returns None if TF is absent."""
    try:
        import tensorflow as tf
        from jax.experimental import jax2tf
    except ImportError:
        return None

    fn, shape = _forward_fn(cfg, variables)
    h, w, c = shape[0] or height, shape[1] or width, shape[2]
    tf_fn = tf.function(
        jax2tf.convert(fn, with_gradient=False),
        input_signature=[tf.TensorSpec([1, h, w, c], tf.float32)],
        autograph=False,
    )
    converter = tf.lite.TFLiteConverter.from_concrete_functions(
        [tf_fn.get_concrete_function()]
    )
    converter.target_spec.supported_ops = [
        tf.lite.OpsSet.TFLITE_BUILTINS,
        tf.lite.OpsSet.SELECT_TF_OPS,
    ]
    blob = converter.convert()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return path
