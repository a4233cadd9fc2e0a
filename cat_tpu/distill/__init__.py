from cat_tpu.distill.ka import ka, gram_pair  # noqa: F401
