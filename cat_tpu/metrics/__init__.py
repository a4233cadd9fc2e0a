from cat_tpu.metrics.fid import (  # noqa: F401
    calculate_frechet_distance,
    compute_statistics,
    get_fid,
)
