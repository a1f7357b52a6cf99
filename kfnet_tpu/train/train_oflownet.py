"""Per-dataset OFlowNet training on consecutive-frame pairs (reference:
``OFlowNet/train.py``, SURVEY.md §3.2). Scene-agnostic: pairs are drawn
across all scenes of the dataset.

    python -m kfnet_tpu.train.train_oflownet \
        --input_folder /data/7scenes --scenes chess,fire,heads \
        --model_folder /ckpts/oflownet_7scenes
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import os

import jax
import numpy as np

from kfnet_tpu.data import labels, pipeline
from kfnet_tpu.models import oflownet
from kfnet_tpu.parallel import mesh as mesh_lib
from kfnet_tpu.train import objectives, trainer
from kfnet_tpu.utils import config as config_lib
from kfnet_tpu.utils import logging as log_lib


def make_pair_loaders(exp: config_lib.ExperimentConfig, scenes: list[str],
                      frame_gap: int = 1):
  """Consecutive-frame pair examples across all requested scenes."""
  from kfnet_tpu.data import registry
  adapter = registry.get(exp.dataset.name)
  load_fns = []
  for scene in scenes:
    if adapter.name == "cambridge":
      split = adapter.load_split(exp.input_folder, scene, "train")
    else:
      split = adapter.load_split(exp.input_folder, scene, "train",
                                 intrinsics=exp.dataset.intrinsics)
    K = split.intrinsics
    stride = exp.dataset.stride

    def load_pair(fr_prev, fr_cur, K=K, stride=stride, split=split):
      a = adapter.load_frame_with_split(split, fr_prev)
      b = adapter.load_frame_with_split(split, fr_cur)
      ca, va = labels.generate(np.asarray(a["depth"]), K, a["pose"],
                               stride=stride,
                               min_depth=exp.dataset.min_depth,
                               max_depth=exp.dataset.max_depth)
      cb, vb = labels.generate(np.asarray(b["depth"]), K, b["pose"],
                               stride=stride,
                               min_depth=exp.dataset.min_depth,
                               max_depth=exp.dataset.max_depth)
      return {"image_prev": a["image"], "image": b["image"],
              "coords_prev": np.asarray(ca), "valid_prev": np.asarray(va),
              "coords": np.asarray(cb), "valid": np.asarray(vb)}

    for seq_frames in adapter.iter_sequences(split):
      for i in range(len(seq_frames) - frame_gap):
        pair = (seq_frames[i], seq_frames[i + frame_gap])
        # both frames need depth for the warped-GT NLL labels; frames
        # without a depth file (Cambridge ships many) are eval-only
        if not (pair[0].depth_path and pair[1].depth_path):
          continue
        load_fns.append(functools.partial(load_pair, *pair))
  if not load_fns:
    raise ValueError("no frame pairs with depth across the requested "
                     "scenes — cannot build OFlowNet training labels")
  return load_fns


def main(argv=None):
  parser = config_lib.add_common_flags(argparse.ArgumentParser())
  parser.add_argument("--scenes", default="",
                      help="comma-separated; default = the selected "
                           "--dataset's full canonical scene list")
  parser.add_argument("--frame_gap", type=int, default=1)
  parser.add_argument("--flow_reg_weight", type=float, default=0.0)
  args = parser.parse_args(argv)
  exp = config_lib.from_args(args)
  from kfnet_tpu.data import registry
  scenes = ([s for s in args.scenes.split(",") if s]
            or registry.default_scenes(exp.dataset.name))

  load_fns = make_pair_loaders(exp, scenes, args.frame_gap)
  params = oflownet.init(
      jax.random.key(exp.seed), exp.oflownet, exp.dataset.image_size + (3,))
  loss_fn = objectives.oflownet_objective(
      exp.oflownet, flow_reg_weight=args.flow_reg_weight)

  out_dir = os.path.join(exp.model_folder, f"oflownet_{exp.dataset.name}")
  logger = log_lib.MetricLogger(
      jsonl_path=os.path.join(out_dir, "metrics.jsonl"),
      tensorboard_dir=os.path.join(out_dir, "tb"))
  loop = dataclasses.replace(exp.loop, checkpoint_dir=out_dir)
  # host-side batches for K-step dispatch (trainer.grouped host stack)
  batches = pipeline.batched(load_fns, exp.batch_size, seed=exp.seed,
                             to_device=loop.steps_per_dispatch <= 1)
  state = trainer.fit(loss_fn, params, batches,
                      optimizer_cfg=exp.optimizer, loop_cfg=loop,
                      mesh=mesh_lib.default_mesh(exp.batch_size),
                      logger=logger)
  from kfnet_tpu.utils import checkpoint as ckpt_lib
  ckpt_lib.export_params(os.path.join(out_dir, "export"), state.params,
                         meta={"dataset": exp.dataset.name,
                               "scenes": scenes})
  logger.log_text(f"done at step {int(state.step)}")
  return state


if __name__ == "__main__":
  main()
