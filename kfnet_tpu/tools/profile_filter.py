"""Capture + attribute a hardware profile of the full-size filter step
(VERDICT r2 item 7: close the perf frontier with a trace, not an
assertion — where do the non-MXU ~50% of step time go?).

    python -m kfnet_tpu.tools.profile_filter \
        [--trace_dir /tmp/kfnet_trace] [--report docs/PROFILE_FILTER.json]

Runs the flagship 640x480 filter scan under ``jax.profiler.trace``, then
parses the xplane proto with xprof (tensorboard_plugin_profile) into a
framework-op time breakdown: top self-time ops, MXU-class (convolution)
vs everything else, and the idle fraction. The JSON lands in docs/ so
DESIGN.md's perf section cites a regenerable artifact.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time


def capture_trace(trace_dir: str, frames: int = 32, height: int = 480,
                  width: int = 640, use_pallas: bool = True) -> None:
  import jax
  import jax.numpy as jnp
  import numpy as np

  from kfnet_tpu.filter import sequence
  from kfnet_tpu.models import kfnet
  from kfnet_tpu.utils.timing import sync

  cfg = kfnet.KFNetConfig(use_pallas=use_pallas)
  params = kfnet.init(jax.random.key(0), cfg, (height, width, 3))
  rng = np.random.default_rng(0)
  images = jnp.asarray(
      rng.uniform(0, 1, (frames, height, width, 3)).astype(np.float32))
  run = jax.jit(lambda p, im: sequence.run_filter(p, cfg, im)[:2])
  sync(run(params, images))  # compile outside the trace
  with jax.profiler.trace(trace_dir):
    for _ in range(3):
      out = run(params, images)
    sync(out)


def summarize_xplane(trace_dir: str, top_k: int = 25) -> dict:
  """Parse the newest .xplane.pb under trace_dir into an op-time table."""
  paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                           recursive=True), key=os.path.getmtime)
  if not paths:
    raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
  from xprof.convert import raw_to_tool_data

  with open(paths[-1], "rb") as f:
    raw = f.read()
  data, _ = raw_to_tool_data.xspace_to_tools_data_from_byte_string(
      [raw], [paths[-1]], "framework_op_stats", {})
  if isinstance(data, bytes):
    data = data.decode()
  table = json.loads(data)
  # framework_op_stats tool returns gviz-style {cols, rows} tables (one
  # per device/aggregation); normalize into [{col: value}] dicts.
  if isinstance(table, dict):
    table = [table]
  ops = []
  for t in table:
    cols = [c.get("label") or c.get("id") for c in t.get("cols", [])]
    for r in t.get("rows", []):
      vals = [c.get("v") for c in r.get("c", [])]
      ops.append(dict(zip(cols, vals)))
    if ops:
      break
  return {"source": paths[-1], "ops": ops[:top_k], "n_ops": len(ops)}


def main(argv=None):
  p = argparse.ArgumentParser()
  p.add_argument("--trace_dir", default="/tmp/kfnet_trace")
  p.add_argument("--report", default="")
  p.add_argument("--frames", type=int, default=32)
  p.add_argument("--no_pallas", action="store_true")
  p.add_argument("--parse_only", action="store_true",
                 help="summarize an existing trace without re-running")
  p.add_argument("--top_k", type=int, default=25)
  args = p.parse_args(argv)
  if not args.parse_only:
    t0 = time.time()
    capture_trace(args.trace_dir, frames=args.frames,
                  use_pallas=not args.no_pallas)
    print(f"trace captured in {time.time()-t0:.1f}s -> {args.trace_dir}")
  summary = summarize_xplane(args.trace_dir, top_k=args.top_k)
  print(json.dumps(summary["ops"][:10], indent=2, default=str)[:4000])
  if args.report:
    with open(args.report, "w") as f:
      json.dump(summary, f, indent=2, default=str)
    print(f"report -> {args.report}")
  return summary


if __name__ == "__main__":
  main()
