from cat_tpu.ops.nn import (  # noqa: F401
    spatial_pad,
    activation,
    Norm2d,
    conv_kernel_init,
    norm_scale_init,
)
