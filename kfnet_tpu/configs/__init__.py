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
  from kfnet_tpu.data.cambridge import CAMBRIDGE_SCENES
  assert scene in CAMBRIDGE_SCENES, scene  # fail fast like the other two
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


# ---- synthetic-demo / protocol-rehearsal model + solver presets ----------
# Shared by tools/demo.py and tools/protocol.py (which promises to mirror
# demo --full_size): keep the hyperparameters in ONE place.

def small_scoordnet(mean=(0.0, 0.0, 0.0), std=1.0):
  """Reduced-width f32 SCoordNet for quick synthetic runs."""
  from kfnet_tpu.models import scoordnet
  return scoordnet.SCoordNetConfig(
      channels=(16, 16, 32, 32, 64, 64), strides=(1, 2, 1, 2, 1, 2),
      head_channels=64, compute_dtype="float32",
      coord_offset=tuple(float(x) for x in mean), coord_scale=float(std))


def full_scoordnet(mean=(0.0, 0.0, 0.0), std=1.0):
  """Flagship 23.6M-param bf16 SCoordNet (paper-parity width)."""
  import dataclasses

  from kfnet_tpu.models import scoordnet
  return dataclasses.replace(
      scoordnet.SCoordNetConfig(),
      coord_offset=tuple(float(x) for x in mean), coord_scale=float(std))


def small_oflownet():
  """Reduced-width f32 OFlowNet for quick synthetic runs."""
  from kfnet_tpu.models import oflownet
  return oflownet.OFlowNetConfig(
      encoder_channels=(16, 16, 32), encoder_strides=(2, 2, 2),
      search_radius=2, unet_channels=(16, 16, 32),
      compute_dtype="float32")


def tiny_scoordnet(mean=(0.0, 0.0, 0.0), std=1.0):
  """Minimal SCoordNet — CI smoke tests of the real-dataset CLI path
  (tools/acceptance.py fixture run on one CPU core)."""
  from kfnet_tpu.models import scoordnet
  return scoordnet.SCoordNetConfig(
      channels=(8, 8, 16, 16, 16, 16), strides=(1, 2, 1, 2, 1, 2),
      head_channels=16, compute_dtype="float32",
      coord_offset=tuple(float(x) for x in mean), coord_scale=float(std))


def tiny_oflownet():
  """Minimal OFlowNet (see tiny_scoordnet)."""
  from kfnet_tpu.models import oflownet
  return oflownet.OFlowNetConfig(
      encoder_channels=(8, 8, 16), encoder_strides=(2, 2, 2),
      search_radius=2, unet_channels=(8, 8, 16),
      compute_dtype="float32")


def full_oflownet():
  """Flagship OFlowNet (paper-parity width)."""
  from kfnet_tpu.models import oflownet
  return oflownet.OFlowNetConfig()


# --net_scale CLI choices: (scoordnet factory(mean, std), oflownet factory)
NET_SCALES = {
    "full": (full_scoordnet, full_oflownet),
    "small": (small_scoordnet, small_oflownet),
    "tiny": (tiny_scoordnet, tiny_oflownet),
}


def synthetic_ransac(full_size: bool):
  """RANSAC preset matched to the synthetic demo/protocol eval."""
  from kfnet_tpu.pose import ransac
  if full_size:
    return ransac.RansacConfig(num_hypotheses=256, top_k=1024,
                               solver="p3p", inlier_threshold_px=8.0)
  return ransac.RansacConfig(num_hypotheses=256, top_k=512)
