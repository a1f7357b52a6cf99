"""Long-stream soak harness: back the "arbitrarily long videos" claim of
``filter/sequence.py`` with measurements (SURVEY.md §5 long-context row).

The chunked streaming path (``run_filter_chunked_arrays``) is O(chunk) in
HBM and O(1) in host memory by construction; this tool actually runs a
multi-thousand-frame synthetic stream through it and checks numeric
health end to end:

  * zero NaN/Inf in posterior state or covariance, ever;
  * covariance bounded: min P > 0 and max P never exceeds its early-
    stream envelope (no drift/blow-up over thousands of steps);
  * consistency fraction stationary: the late-stream window mean stays
    within a tolerance of the post-warmup window mean (the χ² gate does
    not silently saturate open or shut as the stream ages);
  * flat host memory: RSS growth across the identical-shape steady
    chunks stays below a small bound (no per-frame accumulation anywhere
    in the loop). The one-time jit allocations — first-step chunk,
    steady-chunk compile, ragged-tail shape — are excluded from the
    window (the tail's cost is reported separately), so the bound
    measures stream growth, not compilation.

Frames are rendered chunk-by-chunk ON DEVICE (one jitted raycast per
chunk) and fed to the filter as device arrays, so a 5,000-frame full-size
soak never materializes (T, H, W, 3) anywhere — host or HBM — and no hot
array crosses this sandbox's ~90 MB/s tunnel.

    python -m kfnet_tpu.tools.soak --pretrained artifacts/pretrained_synthetic \
        --frames 5000 --report docs/SOAK.json
    python -m kfnet_tpu.tools.soak --pretrained .protocol_cache/full \
        --frames 5000 --report docs/SOAK_FULL.json   # full-size, TPU

Per-chunk statistics are reduced on device to a tiny vector before
download (the tunnel is the bottleneck, CLAUDE.md). The reported
steady-state fps measures the real per-frame streaming API — including
its ~2 dispatches/frame slice+stack overhead (see
``run_filter_chunked_arrays``), so it sits below ``bench.py``'s batch
scan number by design.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from kfnet_tpu.data import synthetic
from kfnet_tpu.filter import sequence
from kfnet_tpu.models import kfnet


def _rss_kb() -> float:
  """CURRENT resident set (kB) — ru_maxrss is a peak, which would hide
  leaks behind any earlier high-water mark (e.g. a training phase)."""
  with open("/proc/self/statm") as f:
    return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") / 1024.0


def device_frame_chunks(num_frames: int, height: int, width: int,
                        chunk: int, seed: int = 0, scale: float = 1.0,
                        traj_seed: int | None = None):
  """Yield (k, H, W, 3) DEVICE chunks of one continuous trajectory.

  Poses for the whole stream are host-built ((T, 4, 4) — tiny); frames
  render on device per chunk with one cached jit. ``duration`` scales
  with T so per-frame motion matches the 48-frame protocol streams
  (synthetic.orbit_trajectory docstring)."""
  scene = synthetic.make_scene(seed, scale=scale)
  sx, sy = width / 640.0, height / 480.0
  K = jnp.asarray([[585.0 * sx, 0.0, width / 2.0 - 0.5],
                   [0.0, 585.0 * sy, height / 2.0 - 0.5],
                   [0.0, 0.0, 1.0]], jnp.float32)
  poses = synthetic.orbit_trajectory(
      num_frames, seed=(seed + 1 if traj_seed is None else traj_seed),
      scale=scale, duration=num_frames / 48.0)
  vrender = jax.jit(jax.vmap(
      lambda T: synthetic.render(scene, T, K, height, width)[0]))
  for i in range(0, num_frames, chunk):
    sl = poses[i:i + chunk]
    if sl.shape[0] < chunk:  # ragged tail: pad poses, drop frames below
      pad = jnp.repeat(sl[-1:], chunk - sl.shape[0], 0)
      yield vrender(jnp.concatenate([sl, pad]))[: num_frames - i]
    else:
      yield vrender(sl)


@jax.jit
def _chunk_stats(xs, Ps, Vs, consistent_mean):
  """Reduce one output chunk to 8 scalars on device (one tiny download)."""
  finite = jnp.isfinite(xs).all() & jnp.isfinite(Ps).all()
  return jnp.stack([
      1.0 - finite.astype(jnp.float32),        # nonfinite flag
      jnp.max(jnp.abs(xs)),
      jnp.max(Ps),
      jnp.min(Ps),
      consistent_mean,
      jnp.mean(Ps),
      jnp.mean(jnp.abs(xs)),
      jnp.max(Vs),
  ])


def run_soak(params, config: kfnet.KFNetConfig, num_frames: int,
             height: int, width: int, chunk: int = 48, seed: int = 0,
             scale: float = 1.0, log=print):
  """Stream ``num_frames`` rendered frames through the chunked filter.

  Returns a report dict (see module docstring for the health criteria it
  feeds); raises nothing itself beyond argument validation — callers
  assert on the report.
  """
  if num_frames <= 0:
    raise ValueError(f"soak needs a positive frame count, got no frames "
                     f"({num_frames})")
  frames = device_frame_chunks(num_frames, height, width, chunk,
                               seed=seed, scale=scale)
  # run_filter_chunked_arrays buffers chunk_size frames; feed it frame
  # views of each device chunk (stays on device — sequence.stack jnp path)
  def frame_iter():
    for ch in frames:
      for i in range(ch.shape[0]):
        yield ch[i]

  rows = []
  chunk_times = []   # wall time per received chunk (stats download syncs)
  chunk_sizes = []
  rss0_kb = rss_full_kb = rss_tail_kb = None
  done = 0
  t_prev = time.perf_counter()
  for xs, Ps, auxs in sequence.run_filter_chunked_arrays(
      params, config, frame_iter(), chunk_size=chunk, return_aux=True):
    cmean = jnp.mean(auxs["consistent"].astype(jnp.float32))
    stats = np.array(  # the chunk's one sync (writable host copy)
        _chunk_stats(xs, Ps, auxs["V"], cmean))
    if not rows:
      # Frame 0's posterior IS its measurement variance (the first step
      # has no prior, kfnet.py first_step), but aux V covers updated
      # frames only (1..T-1) — fold P[0] into the measurement envelope
      # so healthy()'s max_P <= max_V invariant compares the same frame
      # set (otherwise a stream whose noisiest pixel is in frame 0
      # false-fails the envelope check).
      stats[7] = max(stats[7], float(jnp.max(Ps[0])))
    now = time.perf_counter()
    k = int(xs.shape[0])
    chunk_times.append(now - t_prev)
    t_prev = now
    chunk_sizes.append(k)
    done += k
    rows.append(stats)
    # RSS bookkeeping: the memory-leak window covers identical-shape
    # steady chunks ONLY. Chunk 0 (size chunk+1) compiles the first-step
    # jit and the first size==chunk chunk compiles the steady jit — both
    # allocate once; a ragged tail (size<chunk) compiles a third shape at
    # stream end. None of that is per-frame growth, so the baseline is
    # taken after the steady jit exists and the tail's one-time cost is
    # reported separately.
    if k == chunk:
      if rss0_kb is None:
        rss0_kb = _rss_kb()
      else:
        rss_full_kb = _rss_kb()
    elif rss0_kb is not None and done >= num_frames:
      rss_tail_kb = _rss_kb()
    if log and (len(rows) % 16 == 0 or done >= num_frames):
      log(f"soak: {done}/{num_frames} frames, maxP={stats[2]:.4g} "
          f"minP={stats[3]:.4g} consistent={stats[4]:.3f}")
  if not rows:
    raise ValueError("soak stream yielded no frames (num_frames <= 0?)")
  # steady-state rate: median over identical-shape chunks, excluding the
  # one that compiled the steady jit (and the differently-shaped first
  # chunk / ragged tail, which are not in full_idx at all)
  full_idx = [i for i, n in enumerate(chunk_sizes) if n == chunk]
  steady_idx = full_idx[1:]
  steady_fps = (chunk / float(np.median([chunk_times[i] for i in
                                         steady_idx]))
                if steady_idx else None)
  if rss0_kb is None:
    rss0_kb = _rss_kb()
  rows = np.stack(rows)  # (n_chunks, 8)
  n = rows.shape[0]
  warm = max(1, n // 10)           # post-warmup window: chunks [1, 1+warm)
  early = rows[1:1 + warm] if n > 1 else rows
  late = rows[-warm:]
  report = {
      "frames": int(done),
      "height": height, "width": width, "chunk": chunk,
      "world_scale": scale,
      "nonfinite_chunks": int(rows[:, 0].sum()),
      "max_abs_x": float(rows[:, 1].max()),
      "max_P": float(rows[:, 2].max()),
      "min_P": float(rows[:, 3].min()),
      "max_V": float(rows[:, 7].max()),
      "consistent_frac_early": float(early[:, 4].mean()),
      "consistent_frac_late": float(late[:, 4].mean()),
      "consistent_frac_min": float(rows[1:, 4].min()) if n > 1 else None,
      "mean_P_early": float(early[:, 5].mean()),
      "mean_P_late": float(late[:, 5].mean()),
      "steady_state_fps": steady_fps,
      "rss_start_mb": rss0_kb / 1024.0,
      "rss_growth_mb": ((rss_full_kb - rss0_kb) / 1024.0
                        if rss_full_kb is not None else None),
      "rss_ragged_tail_mb": (
          (rss_tail_kb - (rss_full_kb or rss0_kb)) / 1024.0
          if rss_tail_kb is not None else None),
      "backend": jax.devices()[0].platform,
  }
  return report


def healthy(report: dict, consistent_drift: float = 0.15,
            rss_growth_mb: float = 256.0) -> list[str]:
  """Evaluate the module-docstring health criteria; returns a list of
  failure strings (empty = healthy)."""
  bad = []
  if report["nonfinite_chunks"]:
    bad.append(f"nonfinite values in {report['nonfinite_chunks']} chunks")
  if not (report["min_P"] > 0.0):
    bad.append(f"covariance floor violated: min_P={report['min_P']}")
  # Bounded covariance, the Kalman invariant: P_post = P⁻V/(P⁻+V) ≤ V
  # pointwise (and the χ²-reset fallback IS V), so the posterior envelope
  # can never exceed the measurement-noise envelope. max_P itself is
  # content-driven (tracks max V per frame), so window-to-window growth
  # is normal; exceeding max_V means the update math broke.
  if report["max_P"] > 1.01 * report["max_V"] + 1e-6:
    bad.append(f"covariance exceeded the measurement envelope: "
               f"max_P={report['max_P']:.6g} > max_V={report['max_V']:.6g}")
  # stationarity: mean posterior variance must not trend over the stream
  if report["mean_P_late"] > 2.0 * report["mean_P_early"] + 1e-9:
    bad.append(f"mean covariance drifted up: "
               f"{report['mean_P_early']:.6g} -> {report['mean_P_late']:.6g}")
  drift = abs(report["consistent_frac_late"]
              - report["consistent_frac_early"])
  if drift > consistent_drift:
    bad.append(f"consistency fraction drifted {drift:.3f} "
               f"({report['consistent_frac_early']:.3f} -> "
               f"{report['consistent_frac_late']:.3f})")
  if report["rss_growth_mb"] is None:
    # fewer than two full-size chunks streamed: the growth window never
    # existed, so the criterion cannot pass vacuously — flag it
    bad.append("RSS growth window absent (stream too short to measure)")
  elif report["rss_growth_mb"] > rss_growth_mb:
    bad.append(f"host RSS grew {report['rss_growth_mb']:.0f} MB")
  return bad


def main(argv=None):
  p = argparse.ArgumentParser()
  p.add_argument("--pretrained", default="artifacts/pretrained_synthetic",
                 help="protocol export root (stage3_<scene> preferred)")
  p.add_argument("--scene", default="sceneA")
  p.add_argument("--frames", type=int, default=5000)
  p.add_argument("--chunk", type=int, default=48)
  p.add_argument("--seed", type=int, default=None,
                 help="soak scene seed (default: the scene's own "
                      "protocol seed — the weights' training scene, but "
                      "a longer, fresh trajectory over it; any other "
                      "seed = an unseen scene — transfer soak)")
  p.add_argument("--report", default="")
  args = p.parse_args(argv)

  from kfnet_tpu import pretrained
  from kfnet_tpu.tools import protocol as protocol_lib
  from kfnet_tpu.utils import checkpoint as ckpt_lib
  cfg, params = pretrained.load(args.pretrained, scene=args.scene)
  meta = None
  for stage in (f"stage3_{args.scene}", f"stage1_{args.scene}"):
    meta = ckpt_lib.load_meta(os.path.join(args.pretrained, stage))
    if meta:
      break
  H, W = int(meta["height"]), int(meta["width"])
  # the scene's protocol regime: world scale and (by default) seed come
  # from the protocol table, so e.g. --scene outdoor_train soaks the 20x
  # world-scale outdoor regime the weights were actually trained on
  spec = next((s for s in protocol_lib.DEFAULT_SCENES
               if s.name == args.scene), None)
  scale = spec.scale if spec else 1.0
  seed = args.seed if args.seed is not None else (spec.seed if spec else 0)
  print(f"soak: {args.frames} frames at {W}x{H} (world scale {scale}), "
        f"chunk {args.chunk}, scene seed {seed}, "
        f"weights {args.pretrained}/{args.scene}")
  report = run_soak(params, cfg, args.frames, H, W, chunk=args.chunk,
                    seed=seed, scale=scale)
  problems = healthy(report)
  report["healthy"] = not problems
  report["problems"] = problems
  print(json.dumps(report, indent=2))
  if args.report:
    with open(args.report, "w") as f:
      json.dump(report, f, indent=2)
  return 0 if not problems else 1


if __name__ == "__main__":
  raise SystemExit(main())
