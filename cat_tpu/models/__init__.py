from cat_tpu.models.blocks import ConvNormAct, InceptionBlock  # noqa: F401
from cat_tpu.models.generator import InceptionGenerator  # noqa: F401
from cat_tpu.models.discriminators import (  # noqa: F401
    NLayerDiscriminator,
    PixelDiscriminator,
)
