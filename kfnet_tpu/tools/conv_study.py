"""Re-measure the custom conv kernels end-to-end per trunk norm.

DESIGN.md §8's "XLA wins over custom Pallas convs" verdict was measured
WITH GroupNorm in the net, and its stated mechanism — breaking XLA's
conv↔GN epilogue fusion cost more than the hand kernels won — does not
exist on the ``norm="none"`` trunk, which now ships as the measured
in-domain serving config. This tool re-runs the e2e headline protocol
(eval/benchmark.aot_filter_fps — the same timing bench.py uses) for
every (norm, conv_impl) cell so the negative result is either refreshed
or overturned under the config where throughput matters most
(VERDICT r4 item 4).

    python -m kfnet_tpu.tools.conv_study --report docs/CONV_STUDY.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

from kfnet_tpu.eval import benchmark
from kfnet_tpu.eval import flops as flops_lib
from kfnet_tpu.models import kfnet


def cell_config(norm: str, conv_impl: str, use_pallas: bool):
  cfg = kfnet.KFNetConfig(use_pallas=use_pallas)
  return dataclasses.replace(
      cfg, scoordnet=dataclasses.replace(cfg.scoordnet, norm=norm,
                                         conv_impl=conv_impl))


def main(argv=None):
  p = argparse.ArgumentParser()
  p.add_argument("--norms", default="none,group,ws")
  p.add_argument("--impls", default="xla,pallas_3x3")
  p.add_argument("--frames", type=int, default=32)
  p.add_argument("--height", type=int, default=480)
  p.add_argument("--width", type=int, default=640)
  p.add_argument("--report", default="")
  args = p.parse_args(argv)

  on_tpu = jax.default_backend() == "tpu"
  rng = np.random.default_rng(0)
  imgs = jnp.asarray(rng.uniform(
      0, 1, (args.frames, args.height, args.width, 3)).astype(np.float32))
  peak = flops_lib.peak_flops(jax.devices()[0])

  rows = []
  for norm in args.norms.split(","):
    for impl in args.impls.split(","):
      if impl == "pallas_fused" and norm != "group":
        continue  # rejected at build time by design (scoordnet._layer_list)
      cfg = cell_config(norm, impl, on_tpu)
      params = kfnet.init(jax.random.key(0), cfg, imgs.shape[1:])
      fps, _ = benchmark.aot_filter_fps(cfg, params, imgs)
      fpf = flops_lib.filter_step_flops(cfg, args.height, args.width)
      row = {"norm": norm, "conv_impl": impl, "fps": round(fps, 2),
             "mfu": round(fpf * fps / peak, 4)}
      rows.append(row)
      print(json.dumps(row), flush=True)
      del params

  out = {"backend": jax.default_backend(), "height": args.height,
         "width": args.width, "frames": args.frames, "rows": rows}
  if args.report:
    with open(args.report, "w") as f:
      json.dump(out, f, indent=2)
  return out


if __name__ == "__main__":
  main()
