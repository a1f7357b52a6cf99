from kfnet_tpu.eval import eval_sequence  # noqa: F401
