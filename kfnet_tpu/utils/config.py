"""Experiment configs + per-dataset presets.

The reference's flag surface (``tf.app.flags``: input_folder, model_folder,
scene, batch_size, lr, steps — SURVEY.md §2.2 #11) is mirrored here as
dataclasses with a thin argparse bridge, so the CLI of the train/eval
scripts reads like the reference's while everything downstream is typed.
"""

from __future__ import annotations

import argparse
import dataclasses

from kfnet_tpu.core import geometry as geo
from kfnet_tpu.models import kfnet, oflownet, scoordnet
from kfnet_tpu.train.trainer import OptimizerConfig, TrainLoopConfig


@dataclasses.dataclass(frozen=True)
class DatasetPreset:
  name: str
  intrinsics: tuple  # (fx, fy, cx, cy) at working resolution
  image_size: tuple  # (H, W)
  depth_scale: float = 1e-3
  min_depth: float = 0.05
  max_depth: float = 20.0
  stride: int = 8


SEVEN_SCENES = DatasetPreset(
    name="7scenes", intrinsics=geo.SEVEN_SCENES_K, image_size=(480, 640))
TWELVE_SCENES = DatasetPreset(
    name="12scenes", intrinsics=(572.0, 572.0, 320.0, 240.0),
    image_size=(480, 640))
# intrinsics = per-axis scale of the 1670px/1920x1080 SfM calibration to
# the (272, 480) working size (fy/cy absorb the 270->272 stretch),
# DERIVED with the same arithmetic cambridge.load_split uses at runtime
# so preset and loader cannot drift (round-2 advisor finding: a literal
# fy=420.63 here disagreed with the loader's 1670*272/1080=420.593)
CAMBRIDGE = DatasetPreset(
    name="cambridge",
    intrinsics=(1670.0 * 480.0 / 1920.0, 1670.0 * 272.0 / 1080.0,
                240.0, 136.0),
    image_size=(272, 480), max_depth=100.0)

PRESETS = {p.name: p for p in (SEVEN_SCENES, TWELVE_SCENES, CAMBRIDGE)}


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
  dataset: DatasetPreset = SEVEN_SCENES
  scene: str = "chess"
  input_folder: str = ""
  model_folder: str = "/tmp/kfnet_tpu_models"
  batch_size: int = 8
  optimizer: OptimizerConfig = OptimizerConfig()
  loop: TrainLoopConfig = TrainLoopConfig()
  scoordnet: scoordnet.SCoordNetConfig = scoordnet.SCoordNetConfig()
  oflownet: oflownet.OFlowNetConfig = oflownet.OFlowNetConfig()
  seed: int = 0

  def kfnet_config(self, use_pallas: bool = False) -> kfnet.KFNetConfig:
    return kfnet.KFNetConfig(scoordnet=self.scoordnet,
                             oflownet=self.oflownet,
                             use_pallas=use_pallas)


def add_common_flags(parser: argparse.ArgumentParser):
  """The reference scripts' flag surface (SURVEY.md §2.2 #11)."""
  parser.add_argument("--input_folder", required=True,
                      help="dataset root")
  parser.add_argument("--model_folder", default="/tmp/kfnet_tpu_models",
                      help="checkpoint/output dir")
  parser.add_argument("--dataset", default="7scenes",
                      choices=sorted(PRESETS))
  parser.add_argument("--scene", default="chess")
  parser.add_argument("--batch_size", type=int, default=8)
  parser.add_argument("--learning_rate", type=float, default=1e-4)
  parser.add_argument("--max_steps", type=int, default=300_000)
  parser.add_argument("--decay_steps", type=int, default=100_000)
  parser.add_argument("--decay_rate", type=float, default=0.5)
  parser.add_argument("--seed", type=int, default=0)
  parser.add_argument("--steps_per_dispatch", type=int, default=1,
                      help="optimizer steps per jit dispatch (scan); >1 "
                           "amortizes host dispatch cost")
  parser.add_argument("--net_scale", default="full",
                      choices=("full", "small", "tiny"),
                      help="model width preset: full = flagship paper-"
                           "parity nets; small/tiny = reduced widths for "
                           "rehearsals and CI smoke runs of the real-"
                           "dataset CLI path (tools/acceptance.py)")
  return parser


def from_args(args: argparse.Namespace) -> ExperimentConfig:
  kw = {}
  scale = getattr(args, "net_scale", "full")
  if scale != "full":
    from kfnet_tpu import configs as presets
    sc_fn, of_fn = presets.NET_SCALES[scale]
    kw = {"scoordnet": sc_fn(), "oflownet": of_fn()}
  return ExperimentConfig(
      dataset=PRESETS[args.dataset],
      scene=args.scene,
      input_folder=args.input_folder,
      model_folder=args.model_folder,
      batch_size=args.batch_size,
      optimizer=OptimizerConfig(
          learning_rate=args.learning_rate,
          decay_steps=args.decay_steps,
          decay_rate=args.decay_rate),
      loop=TrainLoopConfig(max_steps=args.max_steps,
                           steps_per_dispatch=args.steps_per_dispatch),
      seed=args.seed,
      **kw,
  )
