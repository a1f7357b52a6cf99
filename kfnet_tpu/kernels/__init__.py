from kfnet_tpu.kernels import cost_volume  # noqa: F401
