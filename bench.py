"""Headline benchmark: full-size KFNet recursive filtering throughput
(frames/sec/chip) at the reference's working resolution (640x480 input →
60x80 filtered coordinate maps), on whatever backend is available
(TPU when run by the driver).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

vs_baseline: the reference TF1 throughput was not measurable this round
(reference mount empty — SURVEY.md §0) and the paper reports no fps; we
use an estimated 15 fps for the TF1 recursive filter on a 2019-class GPU
(SCoordNet+OFlowNet+per-frame session.run round trip), so the BASELINE.json
north star "≥10x TF1 fps" corresponds to vs_baseline ≥ 10. Re-anchor when
the mount is populated.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

ASSUMED_TF1_FPS = 15.0
FRAMES = 32
H, W = 480, 640


def main():
  from kfnet_tpu.filter import sequence
  from kfnet_tpu.models import kfnet

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

  from kfnet_tpu.utils.timing import sync

  run = jax.jit(lambda p, im: sequence.run_filter(p, cfg, im)[:2])
  xs, Ps = run(params, images)
  sync((xs, Ps))  # compile + warmup (hard sync; see utils/timing.py)

  reps = 3
  t0 = time.perf_counter()
  for _ in range(reps):
    xs, Ps = run(params, images)
  sync((xs, Ps))
  dt = (time.perf_counter() - t0) / reps
  fps = FRAMES / dt

  print(json.dumps({
      "metric": "kfnet_filtered_frames_per_sec_640x480",
      "value": round(fps, 2),
      "unit": "frames/sec/chip",
      "vs_baseline": round(fps / ASSUMED_TF1_FPS, 2),
      "backend": jax.default_backend(),
      "frames": FRAMES,
      "use_pallas": bool(cfg.use_pallas),
      "baseline_note": "assumed TF1 reference 15 fps (mount empty; "
                       "north-star target vs_baseline >= 10)",
  }))


if __name__ == "__main__":
  main()
