from cat_tpu.compress.profiling import profile_generator, GeneratorProfile  # noqa: F401
from cat_tpu.compress.shrink import shrink_generator, ShrinkResult  # noqa: F401
from cat_tpu.compress.transfer import transfer_generator_params  # noqa: F401
