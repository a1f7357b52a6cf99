"""Joint KFNet fine-tune on temporal pairs (reference: ``KFNet/train.py``,
SURVEY.md §3.5): loads pretrained SCoordNet (per scene) + OFlowNet (per
dataset) checkpoints and optimizes the posterior NLL through both subnets.

    python -m kfnet_tpu.train.train_kfnet \
        --input_folder /data/7scenes --scene chess \
        --scoordnet_ckpt /ckpts/scoordnet_chess \
        --oflownet_ckpt /ckpts/oflownet_7scenes \
        --model_folder /ckpts/kfnet_chess
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import jax

from kfnet_tpu.models import kfnet, oflownet, scoordnet
from kfnet_tpu.data import pipeline
from kfnet_tpu.parallel import mesh as mesh_lib
from kfnet_tpu.train import objectives, trainer
from kfnet_tpu.train.train_oflownet import make_pair_loaders
from kfnet_tpu.utils import checkpoint as ckpt_lib
from kfnet_tpu.utils import config as config_lib
from kfnet_tpu.utils import logging as log_lib


def load_pretrained(exp: config_lib.ExperimentConfig, image_shape,
                    scoordnet_ckpt: str | None, oflownet_ckpt: str | None,
                    seed: int = 0):
  """Init the combined pytree, overwriting subnets from stage-1/2
  checkpoints when given (fresh init otherwise, for smoke tests).

  The SCoordNet checkpoint's meta.json (written by train_scoordnet)
  carries the per-scene coordinate normalization; it is baked back into
  the config here so restored weights emit METRIC coordinates — without
  this the net would silently emit normalized coordinates (ADVICE r1).
  """
  scfg = exp.scoordnet
  if scoordnet_ckpt:
    meta = ckpt_lib.load_meta(scoordnet_ckpt)
    if meta and "coord_scale" in meta:
      scfg = dataclasses.replace(
          scfg, coord_offset=tuple(float(x) for x in meta["coord_offset"]),
          coord_scale=float(meta["coord_scale"]))
  cfg = kfnet.KFNetConfig(scoordnet=scfg, oflownet=exp.oflownet)
  params = kfnet.init(jax.random.key(seed), cfg, image_shape)
  if scoordnet_ckpt:
    params["scoordnet"] = ckpt_lib.load_params(
        scoordnet_ckpt, template=params["scoordnet"])
  if oflownet_ckpt:
    params["oflownet"] = ckpt_lib.load_params(
        oflownet_ckpt, template=params["oflownet"])
  return cfg, params


def make_window_loaders(exp: config_lib.ExperimentConfig, scenes,
                        window: int):
  """T-frame sliding-window examples for the BPTT objective
  (images (T, H, W, 3), coords/valid (T, h, w[, 3]) per example)."""
  import functools

  import numpy as np

  from kfnet_tpu.data import labels, registry
  adapter = registry.get(exp.dataset.name)
  load_fns = []
  for scene in scenes:
    if adapter.name == "cambridge":
      split = adapter.load_split(exp.input_folder, scene, "train")
    else:
      split = adapter.load_split(exp.input_folder, scene, "train",
                                 intrinsics=exp.dataset.intrinsics)
    K = split.intrinsics

    def load_window(frames, K=K, split=split):
      exs = [adapter.load_frame_with_split(split, fr) for fr in frames]
      cs, vs = zip(*[labels.generate(
          np.asarray(e["depth"]), K, e["pose"], stride=exp.dataset.stride,
          min_depth=exp.dataset.min_depth, max_depth=exp.dataset.max_depth)
          for e in exs])
      return {"images": np.stack([e["image"] for e in exs]),
              "coords": np.stack([np.asarray(c) for c in cs]),
              "valid": np.stack([np.asarray(v) for v in vs])}

    for seq_frames in adapter.iter_sequences(split):
      for i in range(len(seq_frames) - window + 1):
        win = seq_frames[i:i + window]
        # every frame needs depth for its coordinate labels; windows
        # touching a depth-less frame (Cambridge ships many) are
        # eval-only — same rule as make_pair_loaders, which would
        # otherwise KeyError('depth') inside the prefetch thread
        if not all(fr.depth_path for fr in win):
          continue
        load_fns.append(functools.partial(load_window, win))
  if not load_fns:
    raise ValueError(
        f"no {window}-frame windows with depth on every frame across "
        "the requested scenes — cannot build BPTT training labels")
  return load_fns


def main(argv=None):
  parser = config_lib.add_common_flags(argparse.ArgumentParser())
  parser.add_argument("--scoordnet_ckpt", default="")
  parser.add_argument("--oflownet_ckpt", default="")
  parser.add_argument("--posterior_weight", type=float, default=1.0)
  parser.add_argument("--measurement_weight", type=float, default=0.5)
  parser.add_argument("--prior_weight", type=float, default=0.5)
  parser.add_argument("--window_size", type=int, default=2,
                      help=">2 trains the T-frame BPTT window objective "
                           "(kfnet_window_objective) instead of the "
                           "2-frame pair objective")
  parser.add_argument("--remat", action="store_true",
                      help="rematerialize the BPTT scan body (O(1) "
                           "activation memory in window_size; ~1.3x "
                           "step FLOPs) — for long windows at full "
                           "resolution")
  args = parser.parse_args(argv)
  exp = config_lib.from_args(args)

  image_shape = exp.dataset.image_size + (3,)
  cfg, params = load_pretrained(
      exp, image_shape, args.scoordnet_ckpt or None,
      args.oflownet_ckpt or None, seed=exp.seed)
  weights = objectives.JointLossWeights(
      posterior=args.posterior_weight,
      measurement=args.measurement_weight,
      prior=args.prior_weight)
  if args.window_size > 2:
    loss_fn = objectives.kfnet_window_objective(cfg, weights,
                                                remat=args.remat)
    load_fns = make_window_loaders(exp, [exp.scene], args.window_size)
  else:
    loss_fn = objectives.kfnet_objective(cfg, weights)
    load_fns = make_pair_loaders(exp, [exp.scene])
  out_dir = os.path.join(exp.model_folder, f"kfnet_{exp.scene}")
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
  ckpt_lib.export_params(
      os.path.join(out_dir, "export"), state.params,
      meta={"scene": exp.scene,
            "coord_offset": list(cfg.scoordnet.coord_offset),
            "coord_scale": float(cfg.scoordnet.coord_scale)})
  logger.log_text(f"done at step {int(state.step)}")
  return state


if __name__ == "__main__":
  main()
