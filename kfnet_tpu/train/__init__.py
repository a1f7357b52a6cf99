from kfnet_tpu.train import objectives, trainer  # noqa: F401
