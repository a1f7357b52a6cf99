from kfnet_tpu.core import geometry, kalman, warp  # noqa: F401
