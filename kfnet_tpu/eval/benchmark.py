"""Throughput benchmarking (SURVEY.md §7 eval/benchmark.py): per-stage and
end-to-end fps/chip numbers with honest device sync (utils/timing.sync).

    python -m kfnet_tpu.eval.benchmark [--frames 32] [--height 480] ...
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from kfnet_tpu.utils.timing import sync


def bench_fn(fn, args, reps: int = 10) -> float:
  """Median-free simple wall time per call (warm), seconds."""
  out = fn(*args)
  sync(out)
  t0 = time.perf_counter()
  for _ in range(reps):
    out = fn(*args)
  sync(out)
  return (time.perf_counter() - t0) / reps


def run(height: int = 480, width: int = 640, frames: int = 32,
        use_pallas: bool | None = None, reps: int = 3) -> dict:
  from kfnet_tpu.filter import sequence
  from kfnet_tpu.models import kfnet

  if use_pallas is None:
    use_pallas = jax.default_backend() == "tpu"
  cfg = kfnet.KFNetConfig(use_pallas=use_pallas)
  params = kfnet.init(jax.random.key(0), cfg, (height, width, 3))
  rng = np.random.default_rng(0)
  images = jnp.asarray(
      rng.uniform(0, 1, (frames, height, width, 3)).astype(np.float32))
  img = images[0]

  results = {"backend": jax.default_backend(), "height": height,
             "width": width, "frames": frames, "use_pallas": use_pallas}

  measure = jax.jit(lambda p, im: kfnet.measure(p, cfg, im))
  results["scoordnet_ms"] = 1e3 * bench_fn(measure, (params, img))
  encode = jax.jit(lambda p, im: kfnet.encode(p, cfg, im))
  results["oflownet_encode_ms"] = 1e3 * bench_fn(encode, (params, img))
  feat = encode(params, img)
  flowfn = jax.jit(lambda p, a, b: kfnet.flow_from_features(p, cfg, a, b))
  results["costvolume_decode_ms"] = 1e3 * bench_fn(flowfn,
                                                   (params, feat, feat))
  runf = jax.jit(lambda p, im: sequence.run_filter(p, cfg, im)[:2])
  t = bench_fn(runf, (params, images), reps=reps)
  results["filter_ms_per_frame"] = 1e3 * t / frames
  results["filtered_fps"] = frames / t

  # Streaming mode (host frames → chunked jitted scan): both chunk entries
  # are compiled, so this should sit within ~15% of the batch scan minus
  # host-transfer cost (VERDICT r1 item 6 regression surface).
  def stream_once():
    n, last = 0, None
    for _, P in sequence.run_filter_chunked(
        params, cfg, list(np.asarray(images)),
        chunk_size=max(4, frames // 2 - 1)):
      n, last = n + 1, P
    sync(last)  # the yields are lazy device slices — force completion
    return n

  stream_once()  # compile both chunk entries
  t0 = time.perf_counter()
  n = stream_once()
  results["streaming_fps"] = n / (time.perf_counter() - t0)

  # Serving mode: B independent sequences filtered in lockstep (time-major
  # batched scan) — amortizes per-step overhead and fills the MXU at small
  # spatial sizes. Frames/sec/chip counts all B streams.
  B = 4
  batch_seqs = jnp.broadcast_to(images[:, None], images.shape[:1] + (B,) +
                                images.shape[1:])
  runb = jax.jit(lambda im: sequence.run_filter_batched(params, cfg, im))
  tb = bench_fn(runb, (batch_seqs,), reps=reps)
  results["filtered_fps_batch4"] = B * frames / tb
  return results


def main(argv=None):
  p = argparse.ArgumentParser()
  p.add_argument("--height", type=int, default=480)
  p.add_argument("--width", type=int, default=640)
  p.add_argument("--frames", type=int, default=32)
  p.add_argument("--no_pallas", action="store_true")
  args = p.parse_args(argv)
  res = run(args.height, args.width, args.frames,
            use_pallas=False if args.no_pallas else None)
  print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                    for k, v in res.items()}))


if __name__ == "__main__":
  main()
