from kfnet_tpu.utils import checkpoint, logging  # noqa: F401

# kfnet_tpu.utils.config imports kfnet_tpu.train (for the optimizer/loop
# dataclasses), which imports the modules above — import it directly
# (``from kfnet_tpu.utils import config``) rather than eagerly here.
