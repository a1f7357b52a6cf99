"""Attribute the serving tick's latency (round-3 verdict item 3).

Round 3 fused the FleetRelocalizer tick into one dispatch + one packed
download and measured 53.6 ms at B=4 full size — against ~17 ms of known
device compute (filter ≈ 11.5 ms + vmapped PnP). This tool decomposes
where a tick actually goes, with wall-clock experiments rather than an
assertion:

  * ``compute_ms``          — device time per tick: N back-to-back jitted
    steps chained through the donated carry with NO host sync between
    them (dispatch pipelines, the chip never waits on the host), one
    sync at the end. This is the latency a co-located host would see.
  * ``roundtrip_floor_ms``  — the sandbox tunnel's floor: a trivial
    jitted op + its (19,)-float download, timed the same way a tick is.
    Real serving hosts sit on PCIe where this is ~0.1 ms; here it is
    several ms and NOT a property of the framework.
  * ``tick_ms``             — the end-to-end ``process()`` wall time
    (one dispatch + one packed download + python bookkeeping).
  * ``dispatch_residual_ms`` = tick − compute − roundtrip: argument
    handling / dispatch serialization not explained by the two above.

Each is measured for the full tick and a ``solve_pose=False`` fleet, so
the PnP share falls out by difference.

    python -m kfnet_tpu.tools.profile_tick --report docs/PROFILE_TICK.json
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from kfnet_tpu.eval.online import FleetRelocalizer
from kfnet_tpu.models import kfnet


def _median_ms(fn, k=5, reps=3):
  fn()  # warm
  times = []
  for _ in range(k):
    t0 = time.perf_counter()
    for _ in range(reps):
      fn()
    times.append((time.perf_counter() - t0) / reps)
  return 1e3 * float(np.median(times))


def measure_fleet(params, cfg, K, images, solve_pose: bool, chain_n=16):
  fleet = FleetRelocalizer(params, cfg, K, batch_size=images.shape[0],
                           solve_pose=solve_pose)
  fleet.process(images)  # first-tick compile
  fleet.process(images)  # steady-tick compile

  # end-to-end tick: ONE dispatch + ONE packed download per call
  tick_ms = _median_ms(lambda: fleet.process(images))

  # pipelined device compute: chain the jitted step through its donated
  # carry with no host sync until the end — the dispatch/download round
  # trip overlaps with compute, so per-step time converges to the
  # device's own tick cost.
  state = {"carry": fleet._carry, "rng": fleet._rng}

  def chain(n):
    carry, rng = state["carry"], state["rng"]
    packed = None
    for _ in range(n):
      carry, rng, packed = fleet._step_fn(
          fleet._params, carry, images, fleet._zero_mask, rng)
    state["carry"], state["rng"] = carry, rng
    return packed

  np.asarray(chain(2))  # warm (and leave a live carry in state)
  times = []
  for _ in range(5):
    t0 = time.perf_counter()
    packed = chain(chain_n)
    np.asarray(packed)  # single sync for the whole chain
    times.append((time.perf_counter() - t0) / chain_n)
  compute_ms = 1e3 * float(np.median(times))
  return tick_ms, compute_ms


def roundtrip_floor_ms(batch: int = 4):
  """Dispatch + tiny-download round trip of a trivial jitted op — the
  irreducible per-tick cost of syncing ANY result to this host."""
  x = jnp.zeros((batch, 19), jnp.float32)  # the packed tick output's shape
  f = jax.jit(lambda v: v + 1.0)
  np.asarray(f(x))
  return _median_ms(lambda: np.asarray(f(x)), k=7, reps=10)


def main(argv=None):
  p = argparse.ArgumentParser()
  p.add_argument("--batch", type=int, default=4)
  p.add_argument("--height", type=int, default=480)
  p.add_argument("--width", type=int, default=640)
  p.add_argument("--report", default="")
  args = p.parse_args(argv)

  cfg = kfnet.KFNetConfig(use_pallas=jax.default_backend() == "tpu")
  params = kfnet.init(jax.random.key(0), cfg,
                      (args.height, args.width, 3))
  K = jnp.asarray([[585.0, 0.0, args.width / 2.0 - 0.5],
                   [0.0, 585.0, args.height / 2.0 - 0.5],
                   [0.0, 0.0, 1.0]], jnp.float32)
  rng = np.random.default_rng(0)
  images = jax.device_put(rng.uniform(
      0, 1, (args.batch, args.height, args.width, 3)).astype(np.float32))

  floor = roundtrip_floor_ms(args.batch)
  tick_full, compute_full = measure_fleet(params, cfg, K, images, True)
  tick_nopose, compute_nopose = measure_fleet(params, cfg, K, images, False)

  report = {
      "batch": args.batch, "height": args.height, "width": args.width,
      "backend": jax.default_backend(),
      "roundtrip_floor_ms": round(floor, 2),
      "tick_ms": round(tick_full, 2),
      "tick_ms_no_pose": round(tick_nopose, 2),
      "compute_ms": round(compute_full, 2),
      "compute_ms_no_pose": round(compute_nopose, 2),
      "pnp_compute_ms": round(compute_full - compute_nopose, 2),
      "dispatch_residual_ms": round(
          max(0.0, tick_full - compute_full - floor), 2),
      "aggregate_fps": round(1e3 * args.batch / tick_full, 1),
      "pipelined_aggregate_fps": round(1e3 * args.batch / compute_full, 1),
      "note": "compute_ms chains donated steps with no host sync — the "
              "latency a co-located (PCIe) host would see; roundtrip_"
              "floor_ms is this sandbox's tunnel cost per synced tick",
  }
  print(json.dumps(report, indent=2))
  if args.report:
    with open(args.report, "w") as f:
      json.dump(report, f, indent=2)
  return report


if __name__ == "__main__":
  main()
