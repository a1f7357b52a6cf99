from kfnet_tpu.filter import sequence  # noqa: F401
