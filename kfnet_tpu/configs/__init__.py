"""Per-dataset / per-scene experiment presets, mirroring the reference's
flag defaults (SURVEY.md §2.2 #11). ``get(name)`` returns an
ExperimentConfig ready for the train/eval scripts."""

from __future__ import annotations

from kfnet_tpu.data.seven_scenes import SEVEN_SCENES
from kfnet_tpu.data.twelve_scenes import TWELVE_SCENES
from kfnet_tpu.train.trainer import OptimizerConfig, TrainLoopConfig
from kfnet_tpu.utils import config as config_lib


def seven_scenes(scene: str = "chess",
                 input_folder: str = "") -> config_lib.ExperimentConfig:
  assert scene in SEVEN_SCENES, scene
  return config_lib.ExperimentConfig(
      dataset=config_lib.SEVEN_SCENES, scene=scene,
      input_folder=input_folder, batch_size=8,
      optimizer=OptimizerConfig(learning_rate=1e-4, decay_steps=100_000),
      loop=TrainLoopConfig(max_steps=300_000))


def twelve_scenes(scene: str = "apt1/kitchen",
                  input_folder: str = "") -> config_lib.ExperimentConfig:
  assert scene in TWELVE_SCENES, scene
  return config_lib.ExperimentConfig(
      dataset=config_lib.TWELVE_SCENES, scene=scene,
      input_folder=input_folder, batch_size=8,
      optimizer=OptimizerConfig(learning_rate=1e-4, decay_steps=80_000),
      loop=TrainLoopConfig(max_steps=200_000))


def cambridge(scene: str = "KingsCollege",
              input_folder: str = "") -> config_lib.ExperimentConfig:
  return config_lib.ExperimentConfig(
      dataset=config_lib.CAMBRIDGE, scene=scene,
      input_folder=input_folder, batch_size=8,
      optimizer=OptimizerConfig(learning_rate=2e-4, decay_steps=100_000),
      loop=TrainLoopConfig(max_steps=300_000))


_FACTORIES = {
    "7scenes": seven_scenes,
    "12scenes": twelve_scenes,
    "cambridge": cambridge,
}


def get(dataset: str, scene: str,
        input_folder: str = "") -> config_lib.ExperimentConfig:
  return _FACTORIES[dataset](scene, input_folder)
