from cat_tpu.metrics.fid import (  # noqa: F401
    calculate_frechet_distance,
    compute_statistics,
    get_fid,
)
from cat_tpu.metrics.deeplabv2 import MSC, DeepLabV2  # noqa: F401
from cat_tpu.metrics.kid import kid_score, polynomial_mmd  # noqa: F401
from cat_tpu.metrics.miou import fast_hist, mean_iou, per_class_iou  # noqa: F401

