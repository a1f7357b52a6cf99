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
