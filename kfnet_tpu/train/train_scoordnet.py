"""Per-scene SCoordNet training (reference: ``SCoordNet/train.py``,
SURVEY.md §3.1).

    python -m kfnet_tpu.train.train_scoordnet \
        --input_folder /data/7scenes --scene chess \
        --model_folder /ckpts/scoordnet_chess

The input pipeline decodes frames on the host, generates coordinate-map
labels on device from depth + GT pose, and the jitted DP train step runs
under the data mesh.
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import os

import jax
import numpy as np

from kfnet_tpu.data import labels, pipeline
from kfnet_tpu.data import seven_scenes as s7
from kfnet_tpu.models import scoordnet
from kfnet_tpu.parallel import mesh as mesh_lib
from kfnet_tpu.train import objectives, trainer
from kfnet_tpu.utils import checkpoint as ckpt_lib
from kfnet_tpu.utils import config as config_lib
from kfnet_tpu.utils import logging as log_lib


def make_scene_loader(exp: config_lib.ExperimentConfig):
  """Returns (load_fns, scene_stats) for per-frame SCoordNet examples."""
  from kfnet_tpu.data import registry
  adapter = registry.get(exp.dataset.name)
  if adapter.name == "cambridge":
    split = adapter.load_split(exp.input_folder, exp.scene, "train")
  else:
    split = adapter.load_split(exp.input_folder, exp.scene, "train",
                               intrinsics=exp.dataset.intrinsics)
  K = split.intrinsics
  stride = exp.dataset.stride

  # Labels come from depth + pose; frames with no depth file (possible on
  # any dataset — Cambridge ships many, 7-Scenes can have holes) are
  # eval-only and must not reach the label generator.
  train_frames = [fr for fr in split.frames if fr.depth_path]
  if not train_frames:
    raise ValueError(f"scene {exp.scene}: no frames with depth — cannot "
                     "generate coordinate labels for training")

  def load(frame):
    ex = adapter.load_frame_with_split(split, frame)
    return {"image": ex["image"], "depth": ex["depth"], "pose": ex["pose"]}

  # Pass 1 (subsampled): scene coordinate statistics for normalization.
  sample = train_frames[::max(1, len(train_frames) // 200)]
  cs, vs = [], []
  img_hw = exp.dataset.image_size
  for fr in sample[:200]:
    ex = load(fr)
    img_hw = tuple(np.asarray(ex["image"]).shape[:2])
    c, v = labels.generate(
        np.asarray(ex["depth"]), K, ex["pose"], stride=stride,
        min_depth=exp.dataset.min_depth, max_depth=exp.dataset.max_depth)
    cs.append(np.asarray(c))
    vs.append(np.asarray(v))
  mean, std = labels.scene_statistics(cs, vs)

  def load_with_labels(frame):
    ex = load(frame)
    c, v = labels.generate(
        np.asarray(ex["depth"]), K, ex["pose"], stride=stride,
        min_depth=exp.dataset.min_depth, max_depth=exp.dataset.max_depth)
    return {"image": ex["image"], "coords": np.asarray(c),
            "valid": np.asarray(v)}

  load_fns = [functools.partial(load_with_labels, fr) for fr in train_frames]

  # native batch-loader metadata, built lazily (pose reads are thousands of
  # small file reads — only pay them if the native path is actually taken).
  # The native decoder is PNG-only: Cambridge resizes on load and 12-Scenes
  # ships JPEG color frames, so gate on the on-disk extensions, not the
  # dataset name.
  native_meta = None
  native_ok = adapter.name != "cambridge" and all(
      fr.color_path.endswith(".png") and fr.depth_path.endswith(".png")
      for fr in train_frames)
  if native_ok:
    def native_meta():
      return {
          "color_paths": [fr.color_path for fr in train_frames],
          "depth_paths": [fr.depth_path for fr in train_frames],
          "poses": np.stack([s7.read_pose(fr.pose_path)
                             for fr in train_frames]),
          "K": np.asarray(K, np.float32),
          "image_size": img_hw,  # actual on-disk frame dims
          "stride": stride,
          "depth_scale": exp.dataset.depth_scale,
          "min_depth": exp.dataset.min_depth,
          "max_depth": exp.dataset.max_depth,
      }
  return load_fns, (mean, std), native_meta


def main(argv=None):
  parser = config_lib.add_common_flags(argparse.ArgumentParser())
  parser.add_argument("--no_native_loader", action="store_true",
                      help="force the Python (PIL) data path even when "
                           "the native C++ loader is built")
  args = parser.parse_args(argv)
  exp = config_lib.from_args(args)

  load_fns, (mean, std), native_meta = make_scene_loader(exp)
  net_cfg = dataclasses.replace(
      exp.scoordnet, coord_offset=tuple(float(x) for x in mean),
      coord_scale=float(std))
  params = scoordnet.init(
      jax.random.key(exp.seed), net_cfg, exp.dataset.image_size + (3,))
  loss_fn = objectives.scoordnet_objective(net_cfg)

  out_dir = os.path.join(exp.model_folder, f"scoordnet_{exp.scene}")
  logger = log_lib.MetricLogger(
      jsonl_path=os.path.join(out_dir, "metrics.jsonl"),
      tensorboard_dir=os.path.join(out_dir, "tb"))
  # Persist the normalization up front so ANY checkpoint in out_dir (even
  # from an interrupted run) can be restored with the exact net config —
  # eval/fine-tune rebuild SCoordNetConfig from this (ADVICE r1).
  meta = {"scene": exp.scene,
          "coord_offset": [float(x) for x in mean],
          "coord_scale": float(std)}
  ckpt_lib.save_meta(out_dir, meta)
  loop = dataclasses.replace(exp.loop, checkpoint_dir=out_dir)
  # NB: crop is disabled by default so the pixel grid matches eval exactly;
  # enable AugmentConfig(crop=...) for regularization on small scenes.
  from kfnet_tpu.data import native_io
  # K-step dispatch stacks K batches on the host before ONE sharded
  # transfer — keep batches host-side in that mode (trainer.grouped).
  to_device = loop.steps_per_dispatch <= 1
  if native_meta and not args.no_native_loader and native_io.available():
    # native C++ batch loader: one GIL-free decode+label call per batch
    logger.log_text("using native batch loader (kfn_load_batch)")
    batches = pipeline.batched_native(
        batch_size=exp.batch_size, seed=exp.seed,
        augment=pipeline.AugmentConfig(crop=None), to_device=to_device,
        **native_meta())
  else:
    batches = pipeline.batched(
        load_fns, exp.batch_size, seed=exp.seed,
        augment=pipeline.AugmentConfig(crop=None), to_device=to_device)
  state = trainer.fit(loss_fn, params, batches,
                      optimizer_cfg=exp.optimizer, loop_cfg=loop,
                      mesh=mesh_lib.default_mesh(exp.batch_size),
                      logger=logger)
  # Release-format params-only export (SURVEY.md §2.2 #13).
  ckpt_lib.export_params(os.path.join(out_dir, "export"), state.params, meta)
  logger.log_text(f"done at step {int(state.step)}; "
                  f"coord normalization mean={mean.tolist()} std={std}")
  return state


if __name__ == "__main__":
  main()
