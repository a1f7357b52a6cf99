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


def aot_filter_fps(cfg, params, images, reps: int = 3, k: int = 3):
  """The headline-bench timing protocol, shared by bench.py and
  tools/norm_study so their speed numbers can never diverge: AOT-compile
  the filter scan (the timed executable is the one cost-analyzed), one
  hard-sync warmup call, then median of k timing batches of ``reps``
  calls. Returns (frames/sec, xla_cost_analysis_flops | None)."""
  from kfnet_tpu.filter import sequence
  from kfnet_tpu.eval import flops as flops_lib

  compiled = jax.jit(
      lambda p, im: sequence.run_filter(p, cfg, im)[:2]).lower(
          params, images).compile()
  fl = flops_lib.compiled_flops(compiled)
  out = compiled(params, images)
  sync(out)  # warmup (hard sync; see utils/timing.py)
  times = []
  for _ in range(k):
    t0 = time.perf_counter()
    for _ in range(reps):
      out = compiled(params, images)
    sync(out)
    times.append((time.perf_counter() - t0) / reps)
  return images.shape[0] / float(np.median(times)), fl


def run(height: int = 480, width: int = 640, frames: int = 32,
        use_pallas: bool | None = None, reps: int = 3,
        tick: bool = False) -> dict:
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

  # Full pipeline (filter + vmapped PnP-RANSAC pose solve): what a user
  # gets from eval_sequence per frame, poses included.
  from kfnet_tpu.eval import eval_sequence
  K = jnp.asarray([[585.0, 0.0, width / 2.0 - 0.5],
                   [0.0, 585.0, height / 2.0 - 0.5],
                   [0.0, 0.0, 1.0]], jnp.float32)
  keys = jax.random.split(jax.random.key(0), frames)
  solve = eval_sequence.make_pose_solver(K)

  @jax.jit
  def run_with_pose(p, im, ks):
    xs, Ps = sequence.run_filter(p, cfg, im)[:2]
    return solve(xs, Ps, ks)["T_wc"]

  t = bench_fn(run_with_pose, (params, images, keys), reps=reps)
  results["e2e_pose_fps"] = frames / t
  # difference of two separately-timed runs — clamp at 0: a dispatch-noise
  # spike in the filter-only measurement must not emit a negative time.
  results["pose_solve_ms_per_frame"] = max(
      0.0, 1e3 * t / frames - results["filter_ms_per_frame"])

  # Streaming mode (chunked jitted scan; both chunk entries compiled) at
  # the DEFAULT chunk size over a multi-chunk stream — per-chunk dispatch
  # overhead amortizes over the chunk, and the ragged tail pads to the
  # chunk shape, so fps is chunk-size sensitive: measured 315 / 379 / 285
  # fps at chunk 15 / 32 / 63 on a 128-frame stream (vs 426 batch scan).
  # Two numbers: device-resident frames isolates the scan/dispatch cost
  # (comparable to filtered_fps — VERDICT r1 item 6's regression surface),
  # host frames additionally pays the host→device transfer (on this
  # sandbox's ~90 MB/s tunnel that is the hard ceiling: ~25 fps at 640x480,
  # not a property of the filter).
  chunk = 32
  stream_T = 3 * chunk  # 3+ chunks so per-chunk overhead is visible

  def stream_once(frame_list):
    n, last = 0, None
    for xs, _ in sequence.run_filter_chunked_arrays(
        params, cfg, frame_list, chunk_size=chunk):
      n, last = n + xs.shape[0], xs
    sync(last)  # chunk outputs are async — force completion
    return n

  reps_np = np.concatenate([np.asarray(images)] *
                           (-(-stream_T // frames)))[:stream_T]
  host_frames = list(reps_np)
  stream_imgs = jnp.asarray(reps_np)
  device_frames = [stream_imgs[i] for i in range(stream_T)]
  # warm up BOTH variants: they compile different tiny stack/concat ops,
  # and a first-use op compile inside the timed region dominates the
  # measurement on this backend.
  stream_once(host_frames)
  stream_once(device_frames)

  def stream_fps(frame_list, k=3):
    # median-of-k: single-shot stream timings showed 345-391 fps
    # run-to-run spread (dispatch-cadence noise on this host's tunnel)
    times = []
    for _ in range(k):
      t0 = time.perf_counter()
      n = stream_once(frame_list)
      times.append(time.perf_counter() - t0)
    return n / float(np.median(times))

  results["streaming_fps_device"] = stream_fps(device_frames)
  results["streaming_fps"] = stream_fps(host_frames, k=1)  # transfer-bound
  # Camera-origin format: uint8 host frames upload 1 byte/channel and are
  # cast to [0,1] f32 on device (models/scoordnet.ingest) — 4x less on
  # the wire than f32, which IS the streaming bottleneck on a tunneled
  # host; the streamer additionally overlaps each chunk's upload with the
  # previous chunk's compute (filter/sequence.py pipelining).
  host_frames_u8 = [np.ascontiguousarray((f * 255).astype(np.uint8))
                    for f in reps_np]
  stream_once(host_frames_u8)  # separate compile (uint8 input graph)
  results["streaming_fps_host_uint8"] = stream_fps(host_frames_u8, k=1)

  # Serving mode: B independent sequences filtered in lockstep (time-major
  # batched scan) — amortizes per-step overhead and fills the MXU at small
  # spatial sizes. Frames/sec/chip counts all B streams.
  B = 4
  batch_seqs = jnp.broadcast_to(images[:, None], images.shape[:1] + (B,) +
                                images.shape[1:])
  runb = jax.jit(lambda p, im: sequence.run_filter_batched(p, cfg, im))
  tb = bench_fn(runb, (params, batch_seqs), reps=reps)
  results["filtered_fps_batch4"] = B * frames / tb

  if tick:
    # Shared tick-timing protocol (warm compiles, then median of k
    # batches of reps): ONE implementation so every *_tick_ms row in the
    # JSON line is comparable by construction — the timing policy is
    # part of the numbers' contract (DESIGN.md §6).
    def tick_ms(reloc, frame, warm=2, k=3, reps=5):
      for _ in range(warm):
        reloc.process(frame)  # first/steady-tick compiles + settle
      times = []
      for _ in range(k):
        t0 = time.perf_counter()
        for _ in range(reps):
          reloc.process(frame)  # syncs internally (packed download)
        times.append((time.perf_counter() - t0) / reps)
      return 1e3 * float(np.median(times))

    # Online serving latency: one FleetRelocalizer tick (filter step +
    # per-slot PnP, fused into ONE dispatch + ONE packed download —
    # DESIGN.md §5) on device-resident frames. This is the number an
    # interactive multi-camera user sees per frame; host-numpy input adds
    # the host→device transfer on top (tunnel-bound on this sandbox).
    from kfnet_tpu.eval.online import FleetRelocalizer
    fleet = FleetRelocalizer(params, cfg, K, batch_size=B)
    tick_imgs = jnp.broadcast_to(img, (B,) + img.shape)
    results["fleet_tick_ms_b4"] = tick_ms(fleet, tick_imgs)

    # Pipelined fleet tick (pipeline_depth=1): the t-1 result's download
    # overlaps tick t's device compute, so the steady-state rate is
    # max(compute, download) instead of compute + round trip — the
    # throughput-serving configuration for remote/tunneled hosts.
    # Fail-soft: a failure here must not void the rest of the report.
    try:
      pfleet = FleetRelocalizer(params, cfg, K, batch_size=B,
                                pipeline_depth=1)
      results["fleet_pipelined_tick_ms_b4"] = tick_ms(pfleet, tick_imgs,
                                                      warm=3)
      pfleet.flush()
    except Exception as e:  # pragma: no cover - hardware-path insurance
      results["fleet_pipelined_tick_ms_b4"] = None
      results["fleet_pipelined_error"] = repr(e)

    # Single-stream online tick (OnlineRelocalizer — the one-camera API):
    # same fused single-dispatch/single-download shape at B=1. See
    # tools/profile_tick.py for the latency decomposition (on this
    # sandbox the tick is dominated by the tunnel round trip, not compute).
    from kfnet_tpu.eval.online import OnlineRelocalizer
    try:
      reloc = OnlineRelocalizer(params, cfg, K)
      results["online_tick_ms"] = tick_ms(reloc, img)
    except Exception as e:  # pragma: no cover - hardware-path insurance
      results["online_tick_ms"] = None
      results["online_tick_error"] = repr(e)

    # Host-origin ticks: the frame arrives as host numpy EVERY tick (the
    # reference's per-frame feed_dict regime, SURVEY.md §3.3) and its
    # upload rides the tick. uint8 camera frames transfer 1 byte/channel
    # and cast on device (models/scoordnet.ingest) — 4x less wire than
    # f32 on the transfer-bound serving link.
    img_np = np.asarray(img)
    img_u8 = (img_np * 255).astype(np.uint8)
    try:
      reloc_h = OnlineRelocalizer(params, cfg, K)
      results["online_host_tick_ms"] = tick_ms(reloc_h, img_np)
      # same relocalizer: the dtype switch retraces once, state carries on
      results["online_host_uint8_tick_ms"] = tick_ms(reloc_h, img_u8)
    except Exception as e:  # pragma: no cover - hardware-path insurance
      results.setdefault("online_host_tick_ms", None)
      results["online_host_uint8_tick_ms"] = None
      results["online_host_error"] = repr(e)
    try:
      tick_u8 = np.ascontiguousarray(
          np.broadcast_to(img_u8, (B,) + img_u8.shape))
      pfleet_h = FleetRelocalizer(params, cfg, K, batch_size=B,
                                  pipeline_depth=1)
      results["fleet_pipelined_host_uint8_tick_ms_b4"] = tick_ms(
          pfleet_h, tick_u8, warm=3)
      pfleet_h.flush()
    except Exception as e:  # pragma: no cover - hardware-path insurance
      results["fleet_pipelined_host_uint8_tick_ms_b4"] = None
      results["fleet_host_error"] = repr(e)
  return results


def main(argv=None):
  p = argparse.ArgumentParser()
  p.add_argument("--height", type=int, default=480)
  p.add_argument("--width", type=int, default=640)
  p.add_argument("--frames", type=int, default=32)
  p.add_argument("--no_pallas", action="store_true")
  p.add_argument("--serving", action="store_true",
                 help="also run the serving sweep: batched-lockstep fps "
                      "at 640x480 AND 96x128 (the two regimes — one chip "
                      "saturates at B=1 full size, batching wins 4x+ at "
                      "small size), one JSON line per resolution")
  args = p.parse_args(argv)
  use_pallas = False if args.no_pallas else None
  res = run(args.height, args.width, args.frames, use_pallas=use_pallas,
            tick=args.serving)
  fmt = lambda r: json.dumps({k: (round(v, 3) if isinstance(v, float)
                                  else v) for k, v in r.items()})
  print(fmt(res))
  if args.serving:
    for h, w in ((480, 640), (96, 128)):
      if (h, w) == (args.height, args.width):
        continue  # already measured above
      print(fmt(run(h, w, args.frames, use_pallas=use_pallas, tick=True)))


if __name__ == "__main__":
  main()
