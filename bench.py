"""Headline benchmark: full-size KFNet recursive filtering throughput
(frames/sec/chip) at the reference's working resolution (640x480 input →
60x80 filtered coordinate maps), on whatever backend is available
(TPU when run by the driver).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N,
   "fps_pallas": N, "fps_xla": N, "mfu": N, ...}

Measures BOTH the fused-Pallas-kernel path and the plain-XLA composition
(VERDICT r1 item 4: the kernel's end-to-end win must be recorded, not
assumed), plus MFU computed from XLA's own cost analysis of the compiled
executable (analytic conv-count fallback).

vs_baseline: the reference TF1 throughput was not measurable (reference
mount empty — SURVEY.md §0) and the paper reports no fps; we use an
estimated 15 fps for the TF1 recursive filter on a 2019-class GPU
(SCoordNet+OFlowNet+per-frame session.run round trip), so the
BASELINE.json north star "≥10x TF1 fps" corresponds to vs_baseline ≥ 10.
Re-anchor when the mount is populated. The assumption-free headline is
the absolute fps + MFU.
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

ASSUMED_TF1_FPS = 15.0
FRAMES = 32
H, W = 480, 640


def bench_variant(cfg, params, images, reps=3, k=3):
  """(fps, total_flops|None) for one config — the shared headline
  protocol (eval/benchmark.aot_filter_fps: AOT compile, hard-sync
  warmup, median of k timing batches)."""
  from kfnet_tpu.eval.benchmark import aot_filter_fps
  return aot_filter_fps(cfg, params, images, reps=reps, k=k)


def main():
  from kfnet_tpu.models import kfnet
  from kfnet_tpu.eval import flops as flops_lib

  on_tpu = jax.default_backend() == "tpu"
  # NB: conv_impl stays "xla" — the Pallas conv wins standalone (+21%)
  # but loses end-to-end because it breaks XLA's GN/elementwise fusion
  # into conv epilogues (measured 379 vs 414 fps). See docs/DESIGN.md.
  cfg = kfnet.KFNetConfig(use_pallas=on_tpu)
  if not on_tpu:
    # CPU fallback (dev machines): tiny shapes so the bench still runs.
    from tests import tiny_configs as tc
    cfg = tc.tiny_kfnet()

  h, w = (H, W) if on_tpu else (48, 64)
  params = kfnet.init(jax.random.key(0), cfg, (h, w, 3))
  rng = np.random.default_rng(0)
  images = jnp.asarray(rng.uniform(0, 1, (FRAMES, h, w, 3)).astype(np.float32))

  fps, fl_ca = bench_variant(cfg, params, images)
  if cfg.use_pallas:
    cfg_xla = dataclasses.replace(cfg, use_pallas=False)
    fps_xla, _ = bench_variant(cfg_xla, params, images, reps=2, k=3)
  else:
    fps_xla = fps

  # MFU from the analytic conv count (XLA's cost_analysis counts the scan
  # body ONCE, not ×trip-count, so it is useless for a loop — it is still
  # emitted raw for transparency).
  flops_per_frame = flops_lib.filter_step_flops(cfg, h, w)
  gflops_per_frame = flops_per_frame / 1e9
  peak = flops_lib.peak_flops(jax.devices()[0])
  mfu = flops_per_frame * fps / peak

  # the CPU dev-machine fallback measures a TINY config at 48x64 — it
  # must not masquerade as the 640x480 headline nor claim a ratio
  # against the full-size TF1 anchor
  metric = ("kfnet_filtered_frames_per_sec_640x480" if on_tpu else
            "kfnet_filtered_frames_per_sec_48x64_tiny_cpu_fallback")
  print(json.dumps({
      "metric": metric,
      "value": round(fps, 2),
      "unit": "frames/sec/chip",
      "vs_baseline": round(fps / ASSUMED_TF1_FPS, 2) if on_tpu else None,
      "backend": jax.default_backend(),
      "frames": FRAMES,
      "use_pallas": bool(cfg.use_pallas),
      "fps_pallas": round(fps, 2) if cfg.use_pallas else None,
      "fps_xla": round(fps_xla, 2),
      "pallas_speedup": round(fps / fps_xla, 3) if cfg.use_pallas else None,
      "gflops_per_frame": round(gflops_per_frame, 1),
      "mfu": round(mfu, 3),
      "flop_source": "analytic_conv_count",
      "xla_cost_analysis_total_gflops":
          round(fl_ca / 1e9, 1) if fl_ca else None,
      "peak_tflops_assumed": peak / 1e12,
      "baseline_note": "assumed TF1 reference 15 fps (mount empty; "
                       "north-star target vs_baseline >= 10)",
  }))


if __name__ == "__main__":
  main()
