from kfnet_tpu.models import kfnet, oflownet, scoordnet  # noqa: F401
