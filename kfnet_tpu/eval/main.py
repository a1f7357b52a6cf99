"""Recursive-filter evaluation CLI (reference: ``KFNet/eval.py`` +
``tools/`` pose eval — SURVEY.md §3.3/§3.4):

    python -m kfnet_tpu.eval.main \
        --input_folder /data/7scenes --scene chess \
        --scoordnet_ckpt ... --oflownet_ckpt ... \
        --report /tmp/chess_report.json [--measurement_only]

Runs the device-resident scan filter over every test sequence of the
scene, solves a pose per frame with batched PnP-RANSAC, and writes a
structured JSON report (median cm/deg, 5cm5deg accuracy, fps).
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


from kfnet_tpu.eval import eval_sequence
from kfnet_tpu.train.train_kfnet import load_pretrained
from kfnet_tpu.utils import config as config_lib


def main(argv=None):
  parser = config_lib.add_common_flags(argparse.ArgumentParser())
  parser.add_argument("--scoordnet_ckpt", default="")
  parser.add_argument("--oflownet_ckpt", default="")
  parser.add_argument("--kfnet_ckpt", default="",
                      help="combined stage-3 export ({scoordnet, "
                           "oflownet} tree from train_kfnet) — "
                           "alternative to the two per-subnet ckpts")
  parser.add_argument("--report", default="")
  parser.add_argument("--measurement_only", action="store_true")
  parser.add_argument("--use_pallas", action="store_true",
                      help="fused filter kernel (TPU)")
  parser.add_argument("--streaming", action="store_true",
                      help="memory-bounded chunked eval (O(chunk) HBM) "
                           "for arbitrarily long sequences")
  parser.add_argument("--chunk_size", type=int, default=32)
  parser.add_argument("--uint8_stream", action="store_true",
                      help="with --streaming: feed the device uint8 "
                           "frames (cast+scaled on device, "
                           "models/scoordnet.ingest) — 4x less "
                           "host->device wire per chunk. Lossless for "
                           "8-bit sources: the loaders' f32 values are "
                           "exactly n/255, so the re-quantization "
                           "round-trips bit-identically")
  parser.add_argument("--chi2_threshold", type=float, default=None,
                      help="override the consistency-test threshold "
                           "(chi-square 3 dof; default p=0.05 -> 7.81)")
  parser.add_argument("--w_scale", type=float, default=None,
                      help="eval-time process-noise temperature W <- s*W "
                           "(>1 deflates an overconfident OFlowNet on "
                           "scenes it never saw; see KFNetConfig.w_scale)")
  parser.add_argument("--adaptive_alpha_max", type=float, default=None,
                      help="innovation-adaptive prior inflation cap "
                           "(scene-agnostic alternative to --w_scale; "
                           "see KFNetConfig.adaptive_alpha_max)")
  parser.add_argument("--pose_smooth_beta", type=float, default=0.0,
                      help="gated constant-velocity SE(3) smoothing of "
                           "the solved trajectory (pose/smoothing.py; "
                           "0 = off, the reference protocol). Smoothed "
                           "poses flow into the report AND --dump_dir.")
  parser.add_argument("--pose_smooth_gate_factor", type=float, default=3.0,
                      help="relock gate in multiples of the stream's "
                           "frame-to-frame motion scale")
  parser.add_argument("--pose_smooth_rot_gate_deg", type=float, default=30.0,
                      help="relock when prediction and measurement "
                           "disagree by more than this rotation (deg)")
  parser.add_argument("--pnp_solver", default="dlt", choices=("dlt", "p3p"),
                      help="RANSAC minimal solver (p3p = 3-pt Grunert, "
                           "survives lower inlier ratios and is faster; "
                           "dlt = 6-pt, most robust on noisy maps)")
  parser.add_argument("--num_hypotheses", type=int, default=256)
  parser.add_argument("--inlier_threshold_px", type=float, default=10.0)
  parser.add_argument("--dump_dir", default="",
                      help="dump per-frame fused coord+uncertainty maps "
                           "(.npz) like the reference eval scripts")
  parser.add_argument("--profile_dir", default="",
                      help="capture a jax.profiler trace of the first "
                           "sequence into this dir")
  args = parser.parse_args(argv)
  if args.uint8_stream and not args.streaming:
    parser.error("--uint8_stream requires --streaming (the batch eval "
                 "commits f32 frames up front; a silently ignored flag "
                 "would mislabel the measurement)")
  exp = config_lib.from_args(args)

  import dataclasses

  image_shape = exp.dataset.image_size + (3,)
  if args.kfnet_ckpt:
    if args.scoordnet_ckpt or args.oflownet_ckpt:
      raise ValueError("--kfnet_ckpt replaces --scoordnet_ckpt/"
                       "--oflownet_ckpt; pass one or the other")
    from kfnet_tpu.models import kfnet as kfnet_lib
    from kfnet_tpu.utils import checkpoint as ckpt_lib
    meta = ckpt_lib.load_meta(args.kfnet_ckpt) or {}
    scfg = exp.scoordnet
    if "coord_scale" in meta:
      scfg = dataclasses.replace(
          scfg,
          coord_offset=tuple(float(x) for x in meta["coord_offset"]),
          coord_scale=float(meta["coord_scale"]))
    if meta.get("scoordnet_norm"):
      # self-describing export (tools/protocol.py meta): the trunk the
      # weights were trained with wins over the config default, same
      # rule as pretrained._scoordnet_config
      scfg = dataclasses.replace(scfg, norm=meta["scoordnet_norm"])
    cfg = kfnet_lib.KFNetConfig(scoordnet=scfg, oflownet=exp.oflownet)
    # Apply the export's calibrated serving point (serving_w_scale /
    # serving_chi2_threshold) exactly like pretrained.load does — the
    # shipped nonorm release serves at w_scale=2, and evaluating it at
    # the GN default 16 silently mis-calibrates the filter. Explicit
    # --w_scale/--chi2_threshold flags still win (applied below).
    from kfnet_tpu import pretrained as pretrained_lib
    cfg = pretrained_lib._apply_serving(cfg, meta)
    params = kfnet_lib.init(jax.random.key(exp.seed), cfg, image_shape)
    params = ckpt_lib.load_params(args.kfnet_ckpt, template=params)
  else:
    cfg, params = load_pretrained(
        exp, image_shape, args.scoordnet_ckpt or None,
        args.oflownet_ckpt or None, seed=exp.seed)
  if args.use_pallas:
    cfg = dataclasses.replace(cfg, use_pallas=True)
  if args.chi2_threshold is not None:
    cfg = dataclasses.replace(cfg, chi2_threshold=args.chi2_threshold)
  if args.w_scale is not None:
    cfg = dataclasses.replace(cfg, w_scale=args.w_scale)
  if args.adaptive_alpha_max is not None:
    cfg = dataclasses.replace(cfg,
                              adaptive_alpha_max=args.adaptive_alpha_max)

  from kfnet_tpu.data import registry
  adapter = registry.get(exp.dataset.name)
  if adapter.name == "cambridge":
    split = adapter.load_split(exp.input_folder, exp.scene, "test")
  else:
    split = adapter.load_split(exp.input_folder, exp.scene, "test",
                               intrinsics=exp.dataset.intrinsics)
  K = jnp.asarray(split.intrinsics)
  if args.dump_dir:
    # Fail FAST on a stale dump dir (before any sequence is filtered):
    # a meta.json from a different scene/camera would make
    # tools/eval_poses.py solve the new maps with the wrong intrinsics
    # and report confidently wrong medians.
    import os
    meta = {"intrinsics": np.asarray(K).tolist(),
            "stride": exp.dataset.stride,
            "scene": exp.scene,
            "dataset": exp.dataset.name}
    meta_path = os.path.join(args.dump_dir, "meta.json")
    if os.path.exists(meta_path):
      with open(meta_path) as f:
        old = json.load(f)
      if old != meta:
        raise ValueError(
            f"--dump_dir {args.dump_dir} already holds a dump for "
            f"{old.get('dataset')}/{old.get('scene')} with different "
            f"meta; use a fresh directory per scene/run")
    else:
      os.makedirs(args.dump_dir, exist_ok=True)
      with open(meta_path, "w") as f:
        json.dump(meta, f, indent=2)
  reports = []
  for i, seq_frames in enumerate(adapter.iter_sequences(split)):
    frames = [adapter.load_frame_with_split(split, fr) for fr in seq_frames]
    # streaming: the whole point is O(chunk) HBM — keep the stack on the
    # HOST (numpy) so the chunked runner transfers one chunk at a time;
    # committing it with jnp.asarray would materialize the full (T,H,W,3)
    # sequence in HBM up front.
    host_stack = np.stack([f["image"] for f in frames])
    if args.streaming and args.uint8_stream:
      # exact inverse of the loaders' /255 (see --uint8_stream help)
      host_stack = np.clip(np.round(host_stack * 255.0), 0,
                           255).astype(np.uint8)
    images = host_stack if args.streaming else jnp.asarray(host_stack)
    gt = np.stack([f["pose"] for f in frames])
    import contextlib
    import functools
    if args.measurement_only:
      # always chunk-bounded (measure_chunked); with --streaming the
      # stack additionally stays host-resident and transfers per chunk
      fn = functools.partial(eval_sequence.evaluate_measurement_only,
                             chunk_size=args.chunk_size)
    elif args.streaming:
      fn = functools.partial(eval_sequence.evaluate_sequence_streaming,
                             chunk_size=args.chunk_size)
    else:
      fn = eval_sequence.evaluate_sequence
    profiling = (jax.profiler.trace(args.profile_dir)
                 if args.profile_dir and i == 0 else contextlib.nullcontext())
    with profiling:
      from kfnet_tpu.pose import ransac
      rcfg = ransac.RansacConfig(
          solver=args.pnp_solver, num_hypotheses=args.num_hypotheses,
          inlier_threshold_px=args.inlier_threshold_px,
          refine_threshold_px=args.inlier_threshold_px)
      res = fn(params, cfg, images, K, gt_poses=gt,
               scene=f"{exp.scene}/{seq_frames[0].seq}",
               stride=exp.dataset.stride, ransac_config=rcfg)
    if args.pose_smooth_beta > 0.0:
      from kfnet_tpu.pose import metrics as pose_metrics
      from kfnet_tpu.pose import smoothing
      res.poses = smoothing.smooth_trajectory(
          res.poses, smoothing.SmootherConfig(
              beta=args.pose_smooth_beta,
              gate_factor=args.pose_smooth_gate_factor,
              rot_gate_deg=args.pose_smooth_rot_gate_deg))
      if res.report is not None:
        fps = res.report["frames_per_sec"]
        res.report = pose_metrics.report(
            f"{exp.scene}/{seq_frames[0].seq}", res.poses, gt)
        res.report["frames_per_sec"] = fps
        res.report["pose_smooth_beta"] = args.pose_smooth_beta
    if args.dump_dir:
      # per-frame dump, mirroring the reference eval scripts' map blobs
      # (SURVEY.md §2.2 #5/#8: "dumps fused maps"). meta.json makes the
      # dump self-contained for the offline pose tool
      # (tools/eval_poses.py — the reference's tools/ pose eval, §3.4).
      import os
      seq_name = seq_frames[0].seq
      os.makedirs(os.path.join(args.dump_dir, seq_name), exist_ok=True)
      for t, fr in enumerate(seq_frames):
        np.savez_compressed(
            os.path.join(args.dump_dir, seq_name, f"frame-{fr.index:06d}"),
            coords=res.coords[t], covariance=res.covariance[t],
            pose=res.poses[t], pose_gt=gt[t])
    if all("depth" in f for f in frames):
      # coordinate-accuracy stats against depth+pose-derived GT maps
      from kfnet_tpu.data import labels as labels_lib
      gt_maps, gt_valid = jax.vmap(
          lambda d, T: labels_lib.generate(
              d, K, T, stride=exp.dataset.stride,
              min_depth=exp.dataset.min_depth,
              max_depth=exp.dataset.max_depth))(
          jnp.asarray(np.stack([f["depth"] for f in frames])),
          jnp.asarray(gt))
      res.report.update(eval_sequence.coord_accuracy_report(
          res.coords, np.asarray(gt_maps), np.asarray(gt_valid)))
    reports.append(res.report)
    print(json.dumps(res.report))
  if args.report:
    eval_sequence.write_report(args.report, reports)
  return reports


if __name__ == "__main__":
  main()
