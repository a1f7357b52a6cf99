from kfnet_tpu.parallel import mesh  # noqa: F401
