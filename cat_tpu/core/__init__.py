from cat_tpu.core.config import (  # noqa: F401
    NormConfig,
    InceptionBlockConfig,
    InceptionGeneratorConfig,
    NLayerDiscriminatorConfig,
    PixelDiscriminatorConfig,
    config_to_json,
    config_from_json,
)
