"""TPU-hardware tests: compiled Pallas kernel parity + kernel microbench.

Run directly on a TPU host (NOT collected by the default CPU suite —
tests/conftest.py forces the CPU backend; this directory has no such
conftest):

    python -m pytest tests_tpu/ -q
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kfnet_tpu.utils.timing import sync

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs TPU")


def make_inputs(seed=0, h=60, w=80, r=4):
  rng = np.random.default_rng(seed)
  x = jnp.asarray(rng.normal(size=(h, w, 3)).astype(np.float32))
  P = jnp.asarray(rng.uniform(0.05, 2.0, (h, w, 1)).astype(np.float32))
  flow = jnp.asarray(rng.uniform(-r, r, (h, w, 2)).astype(np.float32))
  W = jnp.asarray(rng.uniform(0.01, 0.5, (h, w, 1)).astype(np.float32))
  z = x + jnp.asarray(rng.normal(size=(h, w, 3)).astype(np.float32)) * 0.3
  V = jnp.asarray(rng.uniform(0.05, 2.0, (h, w, 1)).astype(np.float32))
  return x, P, flow, W, z, V


@pytest.mark.parametrize("h,w", [(60, 80), (34, 60), (17, 23)])
def test_fused_kernel_compiled_matches_xla(h, w):
  from kfnet_tpu.core import kalman, warp
  from kfnet_tpu.kernels import fused_filter

  args = make_inputs(h=h, w=w)
  x_pr, P_pr, _ = warp.warp_state_cov(*args[:4])
  x_ref, P_ref, c_ref = kalman.kalman_update(x_pr, P_pr, *args[4:])
  x_k, P_k, c_k = fused_filter.fused_warp_kalman(*args, radius=4)
  np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_ref), atol=3e-5)
  np.testing.assert_allclose(np.asarray(P_k), np.asarray(P_ref), rtol=3e-5,
                             atol=1e-6)
  np.testing.assert_array_equal(np.asarray(c_k), np.asarray(c_ref))


def test_full_filter_throughput_floor():
  """Perf regression guard: the full-size recursive filter must sustain
  >250 fps on one chip (round-1 measured 414; see docs/DESIGN.md §6).
  Costs one ~5 min compile — this suite is run on demand, not in CI."""
  import numpy as np
  from kfnet_tpu.filter import sequence
  from kfnet_tpu.models import kfnet

  cfg = kfnet.KFNetConfig(use_pallas=True)
  params = kfnet.init(jax.random.key(0), cfg, (480, 640, 3))
  rng = np.random.default_rng(0)
  imgs = jnp.asarray(rng.uniform(0, 1, (32, 480, 640, 3)).astype(np.float32))
  run = jax.jit(lambda p, im: sequence.run_filter(p, cfg, im)[:2])
  out = run(params, imgs)
  sync(out)
  t0 = time.perf_counter()
  for _ in range(3):
    out = run(params, imgs)
  sync(out)
  fps = 32 * 3 / (time.perf_counter() - t0)
  print(f"filter throughput: {fps:.1f} fps")
  assert fps > 250, fps


def test_fused_kernel_faster_than_xla_composition():
  from kfnet_tpu.core import kalman, warp
  from kfnet_tpu.kernels import fused_filter

  args = make_inputs()

  @jax.jit
  def xla_step(x, P, flow, W, z, V):
    x_pr, P_pr, _ = warp.warp_state_cov(x, P, flow, W)
    return kalman.kalman_update(x_pr, P_pr, z, V)

  pallas_step = jax.jit(
      lambda *a: fused_filter.fused_warp_kalman(*a, radius=4))

  def bench(fn, reps=100, k=9):
    """Median of k timing batches — robust to the dispatch-noise spikes
    that made a single-batch ratio flaky in round 1."""
    out = fn(*args)
    sync(out)
    times = []
    for _ in range(k):
      t0 = time.perf_counter()
      for _ in range(reps):
        out = fn(*args)
      sync(out)
      times.append((time.perf_counter() - t0) / reps)
    return float(np.median(times))

  # interleave the two measurements so slow drift hits both equally
  t_xla = bench(xla_step)
  t_pl = bench(pallas_step)
  t_xla = min(t_xla, bench(xla_step))
  t_pl = min(t_pl, bench(pallas_step))
  print(f"xla {t_xla*1e6:.1f}us vs pallas {t_pl*1e6:.1f}us")
  # the north-star kernel must be at least at parity with the XLA
  # composition (round 1 shipped a 2x bar, i.e. "allowed to lose" — the
  # honest fix is robust timing, not a lower bar).
  assert t_pl <= 1.1 * t_xla, (t_pl, t_xla)


def test_full_size_long_window_bptt_remat_fits_and_runs():
  """Long-context training proof on hardware: one full-size (640x480,
  23.6M-param) BPTT grad step over a T=12 window with the rematerialized
  scan body executes on a single chip and yields finite loss/grads.
  Without remat the same step needs ~9 GiB of temp HBM at T=16 (measured
  via XLA memory analysis — docs/DESIGN.md §5); with it, <1 GiB."""
  from kfnet_tpu.models import kfnet
  from kfnet_tpu.train import objectives

  cfg = kfnet.KFNetConfig()  # use_pallas=False: differentiable path
  params = kfnet.init(jax.random.key(0), cfg, (480, 640, 3))
  T = 12
  rng = np.random.default_rng(0)
  batch = {
      "images": jnp.asarray(
          rng.uniform(0, 1, (1, T, 480, 640, 3)).astype(np.float32)),
      "coords": jnp.asarray(
          rng.normal(size=(1, T, 60, 80, 3)).astype(np.float32)),
      "valid": np.ones((1, T, 60, 80), bool),
  }
  loss_fn = objectives.kfnet_window_objective(cfg, remat=True)
  g = jax.jit(jax.value_and_grad(lambda p, b: loss_fn(p, b)[0]))
  loss, grads = g(params, batch)
  sync(loss)
  assert np.isfinite(float(loss)), float(loss)
  norms = [float(jnp.sum(jnp.square(x)))
           for x in jax.tree_util.tree_leaves(grads)]
  assert all(np.isfinite(n) for n in norms)
  assert sum(norms) > 0


def test_batched_fused_kernel_parity_and_perf():
  """The vmapped fused kernel IS the batched/fleet serving hot path
  (filter/sequence.py run_filter_batched) — round 2 only covered the
  single-stream kernel on hardware. Parity + at-least-parity perf vs
  the vmapped XLA composition at B=4 (VERDICT r2 item 5)."""
  from kfnet_tpu.core import kalman, warp
  from kfnet_tpu.kernels import fused_filter

  B = 4
  batches = [make_inputs(seed=s) for s in range(B)]
  args = tuple(jnp.stack([b[i] for b in batches]) for i in range(6))

  @jax.jit
  def xla_step(x, P, flow, W, z, V):
    def one(x, P, flow, W, z, V):
      x_pr, P_pr, _ = warp.warp_state_cov(x, P, flow, W)
      return kalman.kalman_update(x_pr, P_pr, z, V)
    return jax.vmap(one)(x, P, flow, W, z, V)

  pallas_step = jax.jit(jax.vmap(
      lambda *a: fused_filter.fused_warp_kalman(*a, radius=4)))

  x_ref, P_ref, c_ref = xla_step(*args)
  x_k, P_k, c_k = pallas_step(*args)
  np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_ref), atol=3e-5)
  np.testing.assert_allclose(np.asarray(P_k), np.asarray(P_ref),
                             rtol=3e-5, atol=1e-6)
  np.testing.assert_array_equal(np.asarray(c_k), np.asarray(c_ref))

  def bench(fn, reps=50, k=9):
    out = fn(*args)
    sync(out)
    times = []
    for _ in range(k):
      t0 = time.perf_counter()
      for _ in range(reps):
        out = fn(*args)
      sync(out)
      times.append((time.perf_counter() - t0) / reps)
    return float(np.median(times))

  t_xla = bench(xla_step)
  t_pl = bench(pallas_step)
  t_xla = min(t_xla, bench(xla_step))
  t_pl = min(t_pl, bench(pallas_step))
  print(f"B=4 xla {t_xla*1e6:.1f}us vs pallas {t_pl*1e6:.1f}us")
  assert t_pl <= 1.1 * t_xla, (t_pl, t_xla)


def test_fleet_relocalizer_serving_tick():
  """One FleetRelocalizer lifecycle on hardware at full size: first tick,
  steady tick, and a mid-stream per-slot reset (session churn) — with
  poses solved every tick (VERDICT r2 item 5: the multi-stream serving
  story was CPU-parity-tested only)."""
  from kfnet_tpu.eval.online import FleetRelocalizer
  from kfnet_tpu.models import kfnet

  B = 4
  cfg = kfnet.KFNetConfig(use_pallas=True)
  params = kfnet.init(jax.random.key(0), cfg, (480, 640, 3))
  K = jnp.asarray([[585., 0, 319.5], [0, 585., 239.5], [0, 0, 1]],
                  jnp.float32)
  fleet = FleetRelocalizer(params, cfg, K, batch_size=B)
  rng = np.random.default_rng(0)
  # Device-resident ticks: process() passes jax.Arrays through untouched,
  # so this measures the chip.  Host-numpy input would re-upload 14.7 MB
  # per tick, and this sandbox's host<->device tunnel runs ~90 MB/s
  # (CLAUDE.md) => >=163 ms/tick from transfer alone, a sandbox artifact
  # no latency floor can sit above (real serving feeds frames over PCIe).
  ticks = jax.device_put(
      rng.uniform(0, 1, (3, B, 480, 640, 3)).astype(np.float32))

  poses0, info0 = fleet.process(ticks[0])
  assert poses0.shape == (B, 4, 4)
  assert np.allclose(info0["consistent_frac"], 0.0)  # first tick: fresh
  poses1, info1 = fleet.process(ticks[1])
  assert np.all(np.isfinite(poses1))
  assert info1["consistent_frac"].shape == (B,)
  # slot 2 resets mid-stream; its consistent_frac must read 0 by contract
  poses2, info2 = fleet.process(ticks[2], reset=[False, False, True, False])
  assert np.all(np.isfinite(poses2))
  assert info2["consistent_frac"][2] == 0.0
  assert np.all(info2["num_inliers"] >= 0)
  # steady-state tick latency (post-compile): all B streams, pose included
  t0 = time.perf_counter()
  reps = 5
  for _ in range(reps):
    poses, _ = fleet.process(ticks[1])
  dt = (time.perf_counter() - t0) / reps
  print(f"fleet tick: {1e3*dt:.1f} ms for B={B} ({B/dt:.0f} fps aggregate)")
  assert B / dt > 40  # loose floor: per-tick dispatch costs ~5-10ms here


def test_fleet_pipelined_tick_on_device():
  """pipeline_depth=1 on hardware: identical results one tick late, and
  the steady-state tick must not be slower than the sync tick (it hides
  the result download behind the next tick's compute — on this tunneled
  host the download IS the dominant tick cost, tools/profile_tick.py)."""
  from kfnet_tpu.eval.online import FleetRelocalizer
  from kfnet_tpu.models import kfnet

  B = 4
  cfg = kfnet.KFNetConfig(use_pallas=True)
  params = kfnet.init(jax.random.key(0), cfg, (480, 640, 3))
  K = jnp.asarray([[585., 0, 319.5], [0, 585., 239.5], [0, 0, 1]],
                  jnp.float32)
  rng = np.random.default_rng(0)
  ticks = jax.device_put(
      rng.uniform(0, 1, (3, B, 480, 640, 3)).astype(np.float32))

  sync_fleet = FleetRelocalizer(params, cfg, K, batch_size=B, seed=3)
  pipe_fleet = FleetRelocalizer(params, cfg, K, batch_size=B, seed=3,
                                pipeline_depth=1)
  sync_out = [sync_fleet.process(ticks[t])[0] for t in range(3)]
  pipe_out = []
  for t in range(3):
    poses, info = pipe_fleet.process(ticks[t])
    if poses is not None:
      pipe_out.append(poses)
  pipe_out += [p for p, _ in pipe_fleet.flush()]
  assert len(pipe_out) == 3
  for ps, pp in zip(sync_out, pipe_out):
    np.testing.assert_allclose(pp, ps, atol=1e-6)

  def bench(fleet):
    for _ in range(2):
      fleet.process(ticks[1])  # warm steady-state path
    t0 = time.perf_counter()
    reps = 8
    for _ in range(reps):
      fleet.process(ticks[1])
    return (time.perf_counter() - t0) / reps

  t_sync = bench(sync_fleet)
  t_pipe = bench(pipe_fleet)
  pipe_fleet.flush()
  print(f"fleet tick sync {1e3*t_sync:.1f} ms vs pipelined "
        f"{1e3*t_pipe:.1f} ms (B={B})")
  # dispatch-cadence noise on this host is real; require no regression
  assert t_pipe <= 1.15 * t_sync, (t_pipe, t_sync)


def test_online_relocalizer_single_stream_tick():
  """Single-stream OnlineRelocalizer on hardware at full size (round-3
  verdict item 5: the one-camera API was CPU-tested only): lifecycle
  (first tick, steady tick, reset), filter-state parity with a B=1
  fleet fed the same frames, and a recorded steady-state tick latency
  with a floor guard."""
  from kfnet_tpu.eval.online import FleetRelocalizer, OnlineRelocalizer
  from kfnet_tpu.models import kfnet

  cfg = kfnet.KFNetConfig(use_pallas=True)
  params = kfnet.init(jax.random.key(0), cfg, (480, 640, 3))
  K = jnp.asarray([[585., 0, 319.5], [0, 585., 239.5], [0, 0, 1]],
                  jnp.float32)
  rng = np.random.default_rng(0)
  frames = jax.device_put(
      rng.uniform(0, 1, (3, 480, 640, 3)).astype(np.float32))

  reloc = OnlineRelocalizer(params, cfg, K)
  pose0, info0 = reloc.process(frames[0])
  assert pose0.shape == (4, 4)
  assert info0["consistent_frac"] == 0.0  # first frame: fresh everywhere
  pose1, info1 = reloc.process(frames[1])
  assert np.all(np.isfinite(pose1))
  assert info1["num_inliers"] >= 0

  # filter-state parity with a B=1 fleet fed the same two frames: the
  # fused single-stream tick and the vmapped fleet tick must implement
  # the SAME filter semantics (tolerance = compile-order variance class)
  single_state = jax.tree_util.tree_map(jnp.copy, reloc.state)
  fleet = FleetRelocalizer(params, cfg, K, batch_size=1)
  fleet.process(frames[0][None])
  _, finfo1 = fleet.process(frames[1][None])
  fleet_state = jax.tree_util.tree_map(jnp.copy, fleet.state)
  np.testing.assert_allclose(np.asarray(single_state[0]),
                             np.asarray(fleet_state[0][0]), atol=3e-5)
  np.testing.assert_allclose(np.asarray(single_state[1]),
                             np.asarray(fleet_state[1][0]),
                             rtol=3e-5, atol=1e-6)
  assert abs(info1["consistent_frac"]
             - float(finfo1["consistent_frac"][0])) < 1e-3

  # reset drops the temporal state: the next frame is a first frame again
  reloc.reset()
  _, info2 = reloc.process(frames[2])
  assert info2["consistent_frac"] == 0.0

  # steady-state tick latency (post-compile), pose solve included
  reloc.process(frames[1])  # back on the steady path
  t0 = time.perf_counter()
  reps = 5
  for _ in range(reps):
    pose, _ = reloc.process(frames[1])
  dt = (time.perf_counter() - t0) / reps
  print(f"online tick: {1e3*dt:.1f} ms single stream ({1/dt:.0f} fps)")
  # loose floor: the B=4 fleet tick measured 53.6 ms (round 3); a B=1
  # tick does strictly less work per dispatch
  assert dt < 0.08, dt


def test_host_origin_uint8_tick():
  """Camera-origin serving: uint8 frames arrive from HOST numpy every
  tick. Checks (a) filter-state parity with the equivalent f32 stream
  (the on-device cast is the only difference), and (b) the 4x-smaller
  upload actually pays on this tunnel-bound link — the uint8 host tick
  must not be slower than the f32 host tick."""
  from kfnet_tpu.eval.online import OnlineRelocalizer
  from kfnet_tpu.models import kfnet

  cfg = kfnet.KFNetConfig(use_pallas=True)
  params = kfnet.init(jax.random.key(0), cfg, (480, 640, 3))
  K = jnp.asarray([[585., 0, 319.5], [0, 585., 239.5], [0, 0, 1]],
                  jnp.float32)
  rng = np.random.default_rng(1)
  u8 = rng.integers(0, 256, (2, 480, 640, 3), dtype=np.uint8)
  f32 = u8.astype(np.float32) * np.float32(1.0 / 255.0)

  ru = OnlineRelocalizer(params, cfg, K)
  rf = OnlineRelocalizer(params, cfg, K)
  for t in range(2):
    ru.process(u8[t])     # host numpy uint8 — uploads 0.9 MB
    rf.process(f32[t])    # host numpy f32  — uploads 3.7 MB
  su = jax.tree_util.tree_map(jnp.copy, ru.state)
  sf = jax.tree_util.tree_map(jnp.copy, rf.state)
  np.testing.assert_allclose(np.asarray(su[0]), np.asarray(sf[0]),
                             atol=3e-5)
  np.testing.assert_allclose(np.asarray(su[1]), np.asarray(sf[1]),
                             rtol=3e-5, atol=1e-6)

  def tick_ms(reloc, frame, reps=5):
    reloc.process(frame)  # settle the steady path
    times = []
    for _ in range(3):
      t0 = time.perf_counter()
      for _ in range(reps):
        reloc.process(frame)
      times.append((time.perf_counter() - t0) / reps)
    return 1e3 * float(np.median(times))

  ms_u8 = tick_ms(ru, u8[1])
  ms_f32 = tick_ms(rf, f32[1])
  print(f"host-origin tick: uint8 {ms_u8:.1f} ms vs f32 {ms_f32:.1f} ms")
  # the uint8 upload is 2.8 MB smaller; on the ~90 MB/s tunnel that is
  # ~30 ms — allow generous slack but never regression
  assert ms_u8 <= ms_f32 * 1.05, (ms_u8, ms_f32)


def test_streaming_with_pose_e2e_floor():
  """Chunked streaming + per-chunk PnP (eval_sequence_streaming's shape)
  on device-resident frames: the number a long-video user sees. Floor is
  conservative vs the ~386 fps streaming / ~272 fps filter+pose batch
  measurements (docs/DESIGN.md)."""
  from kfnet_tpu.eval import eval_sequence
  from kfnet_tpu.filter import sequence
  from kfnet_tpu.models import kfnet
  from kfnet_tpu.pose import ransac

  cfg = kfnet.KFNetConfig(use_pallas=True)
  params = kfnet.init(jax.random.key(0), cfg, (480, 640, 3))
  rng = np.random.default_rng(0)
  T, chunk = 64, 32
  imgs = jnp.asarray(rng.uniform(0, 1, (T, 480, 640, 3)).astype(np.float32))
  frames = [imgs[i] for i in range(T)]  # device-resident source
  K = jnp.asarray([[585., 0, 319.5], [0, 585., 239.5], [0, 0, 1]],
                  jnp.float32)
  solve = eval_sequence.make_pose_solver(
      K, config=ransac.RansacConfig(solver="p3p"))

  def stream_once():
    n = 0
    last = None
    for xs, Ps in sequence.run_filter_chunked_arrays(
        params, cfg, frames, chunk_size=chunk):
      keys = jax.random.split(jax.random.fold_in(jax.random.key(1), n),
                              xs.shape[0])
      last = solve(xs, Ps, keys)["T_wc"]
      n += xs.shape[0]
    sync(last)
    return n

  stream_once()  # compile both chunk entries + solver
  times = []
  for _ in range(3):
    t0 = time.perf_counter()
    n = stream_once()
    times.append(time.perf_counter() - t0)
  fps = n / float(np.median(times))
  print(f"streaming+pose: {fps:.1f} fps")
  assert fps > 120, fps


def test_batched_lockstep_small_res_floor():
  """Serving at small resolution is where lockstep batching wins
  (measured 1695 fps at 96x128 B=4 in round 2 — the chip starves at
  B=1). Guard the regime stays >3x the B=1 full-size number."""
  from kfnet_tpu.filter import sequence
  from kfnet_tpu.models import kfnet

  B, T = 4, 32
  cfg = kfnet.KFNetConfig(use_pallas=True)
  params = kfnet.init(jax.random.key(0), cfg, (96, 128, 3))
  rng = np.random.default_rng(0)
  seqs = jnp.asarray(
      rng.uniform(0, 1, (T, B, 96, 128, 3)).astype(np.float32))
  runb = jax.jit(lambda p, im: sequence.run_filter_batched(p, cfg, im))
  out = runb(params, seqs)
  sync(out)
  times = []
  for _ in range(5):
    t0 = time.perf_counter()
    out = runb(params, seqs)
    sync(out)
    times.append(time.perf_counter() - t0)
  fps = B * T / float(np.median(times))
  print(f"batched lockstep 96x128 B=4: {fps:.0f} fps")
  assert fps > 1000, fps


def test_pose_solver_throughput_floor():
  """Regression guard for the r2 pose-solver rewrite (inverse-iteration
  DLT, polar/triad alignment): full RANSAC solve must stay under 3 ms per
  frame at the default config (measured 1.4 ms after the rewrite; the old
  eigh/SVD route was 6.5)."""
  import dataclasses

  from kfnet_tpu.pose import ransac

  B = 32
  rng = np.random.default_rng(0)
  coords = jnp.asarray(rng.normal(size=(B, 60, 80, 3)).astype(np.float32))
  var = jnp.asarray(
      rng.uniform(0.01, 1.0, (B, 60, 80, 1)).astype(np.float32))
  K = jnp.asarray([[585., 0, 319.5], [0, 585., 239.5], [0, 0, 1]],
                  jnp.float32)
  keys = jax.random.split(jax.random.key(0), B)
  for solver, budget_ms in (("dlt", 3.0), ("p3p", 2.0)):
    cfg = dataclasses.replace(ransac.RansacConfig(), solver=solver)
    f = jax.jit(jax.vmap(lambda c, P, k: ransac.solve_pnp_from_maps(
        c, P, jnp.ones_like(P, bool), K, k, config=cfg)))
    out = f(coords, var, keys)
    sync(out)
    times = []
    for _ in range(5):
      t0 = time.perf_counter()
      for _ in range(3):
        out = f(coords, var, keys)
      sync(out)
      times.append((time.perf_counter() - t0) / 3)
    ms = float(np.median(times)) * 1e3 / B
    print(f"{solver}: {ms:.2f} ms/frame")
    assert ms < budget_ms, (solver, ms)
