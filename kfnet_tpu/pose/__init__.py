from kfnet_tpu.pose import metrics, pnp, ransac  # noqa: F401
