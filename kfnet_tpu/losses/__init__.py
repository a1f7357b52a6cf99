from kfnet_tpu.losses import nll  # noqa: F401
from kfnet_tpu.losses.nll import gaussian_nll, l2_coord_error, masked_mean  # noqa: F401
