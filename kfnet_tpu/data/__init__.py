from kfnet_tpu.data import (  # noqa: F401
    cambridge, labels, pipeline, seven_scenes, synthetic)
