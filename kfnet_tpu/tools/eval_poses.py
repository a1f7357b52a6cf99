"""Offline pose evaluation from dumped coordinate maps (reference:
``tools/`` pose-eval scripts — SURVEY.md §3.4: "load fused coord map +
uncertainty → solvePnPRansac → per-scene median translation/rotation").

Consumes a dump directory written by ``eval/main.py --dump_dir`` (one
``.npz`` per frame with coords/covariance/pose/pose_gt, plus a
``meta.json`` with intrinsics + stride), re-solves a pose per frame with
the batched PnP-RANSAC, and writes the per-sequence median report. This
decouples pose solving from network inference exactly like the reference
workflow — sweep RANSAC settings offline without re-running the filter:

    python -m kfnet_tpu.eval.main ... --dump_dir /tmp/dump
    python -m kfnet_tpu.tools.eval_poses --dump_dir /tmp/dump \
        --pnp_solver p3p --inlier_threshold_px 5 --report poses.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from kfnet_tpu.pose import metrics as pose_metrics
from kfnet_tpu.pose import ransac


def load_dump_sequence(seq_dir: str, keys: tuple[str, ...] | None = None):
  """Load one sequence's dumped frames (sorted by frame index).

  Returns dict of stacked arrays: coords (T, h, w, 3),
  covariance (T, h, w, 1), pose (T, 4, 4), pose_gt (T, 4, 4) | None.

  keys: restrict to a subset (e.g. ("pose", "pose_gt") for pose-only
  post-processing like smoothing) — decompressing the full coordinate/
  covariance blobs of a 1000-frame dump costs tens of MB of npz inflate
  that a few-KB pose pass does not need.
  """
  files = sorted(glob.glob(os.path.join(seq_dir, "frame-*.npz")))
  if not files:
    raise FileNotFoundError(f"no frame-*.npz dumps in {seq_dir}")
  frames = []
  for f in files:
    # copy arrays and close each file eagerly: np.load holds the zip fd
    # open lazily, and a 1000-frame sequence would exhaust the default
    # fd limit if all handles stayed live.
    with np.load(f) as fr:
      want = fr.files if keys is None else [k for k in keys if k in fr.files]
      frames.append({k: np.asarray(fr[k]) for k in want})
  stack_keys = ("coords", "covariance", "pose") if keys is None else tuple(
      k for k in keys if k != "pose_gt" and k in frames[0])
  out = {k: np.stack([fr[k] for fr in frames]) for k in stack_keys}
  if keys is None or "pose_gt" in keys:
    out["pose_gt"] = (np.stack([fr["pose_gt"] for fr in frames])
                      if "pose_gt" in frames[0] else None)
  return out


def solve_sequence(coords: np.ndarray, covariance: np.ndarray,
                   K: np.ndarray, stride: int,
                   config: ransac.RansacConfig,
                   seed: int = 0) -> np.ndarray:
  """Batched per-frame PnP over a whole dumped sequence → (T, 4, 4)."""
  from kfnet_tpu.eval import eval_sequence
  keys = jax.random.split(jax.random.key(seed), coords.shape[0])
  solve = eval_sequence.make_pose_solver(K, stride=stride, config=config)
  return np.asarray(solve(jnp.asarray(coords), jnp.asarray(covariance),
                          keys)["T_wc"])


def main(argv=None):
  p = argparse.ArgumentParser()
  p.add_argument("--dump_dir", required=True)
  p.add_argument("--report", default="")
  p.add_argument("--pnp_solver", default="dlt", choices=("dlt", "p3p"))
  p.add_argument("--num_hypotheses", type=int, default=256)
  p.add_argument("--inlier_threshold_px", type=float, default=10.0)
  p.add_argument("--stride", type=int, default=None,
                 help="override meta.json (map-cell stride in pixels)")
  p.add_argument("--intrinsics", default="",
                 help="fx,fy,cx,cy — overrides meta.json")
  p.add_argument("--pose_smooth_beta", type=float, default=0.0,
                 help="gated constant-velocity SE(3) smoothing of the "
                      "re-solved trajectory (pose/smoothing.py; 0 = "
                      "off — docs/CALIBRATION.md §6 serving option)")
  p.add_argument("--seed", type=int, default=0)
  args = p.parse_args(argv)

  meta = {}
  meta_path = os.path.join(args.dump_dir, "meta.json")
  if os.path.exists(meta_path):
    with open(meta_path) as f:
      meta = json.load(f)
  if args.intrinsics:
    fx, fy, cx, cy = (float(v) for v in args.intrinsics.split(","))
    K = np.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
  elif "intrinsics" in meta:
    K = np.asarray(meta["intrinsics"], np.float32)
  else:
    raise SystemExit("no intrinsics: pass --intrinsics fx,fy,cx,cy "
                     "(dump has no meta.json)")
  stride = args.stride if args.stride is not None else meta.get("stride", 8)
  rcfg = ransac.RansacConfig(
      solver=args.pnp_solver, num_hypotheses=args.num_hypotheses,
      inlier_threshold_px=args.inlier_threshold_px,
      refine_threshold_px=args.inlier_threshold_px)

  seq_dirs = sorted(
      d for d in glob.glob(os.path.join(args.dump_dir, "*"))
      if os.path.isdir(d))
  if not seq_dirs:
    raise SystemExit(f"no sequence directories under {args.dump_dir}")
  reports = []
  for seq_dir in seq_dirs:
    seq = os.path.basename(seq_dir)
    data = load_dump_sequence(seq_dir)
    poses = solve_sequence(data["coords"], data["covariance"], K, stride,
                           rcfg, seed=args.seed)
    if args.pose_smooth_beta > 0.0:
      from kfnet_tpu.pose import smoothing
      poses = smoothing.smooth_trajectory(
          poses, smoothing.SmootherConfig(beta=args.pose_smooth_beta))
    scene = f"{meta.get('scene', '')}/{seq}".lstrip("/")
    if data["pose_gt"] is not None:
      rep = pose_metrics.report(scene, poses, data["pose_gt"])
    else:
      # no GT in the dump: report drift vs the poses solved at dump time
      # (a solver-settings consistency check, labeled as such).
      rep = pose_metrics.report(scene, poses, data["pose"])
      rep["gt_source"] = "dumped_poses_no_gt"
    if args.pose_smooth_beta > 0.0:
      rep["pose_smooth_beta"] = args.pose_smooth_beta
    reports.append(rep)
    print(json.dumps(rep))
  if args.report:
    from kfnet_tpu.eval import eval_sequence
    eval_sequence.write_report(args.report, reports)
  return reports


if __name__ == "__main__":
  main()
