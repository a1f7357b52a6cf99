"""tools/calibrate.py: the traced-knob recursion must match the real
filter, and the knobs must move the posterior the way the math says."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from kfnet_tpu.filter import sequence
from kfnet_tpu.models import kfnet
from kfnet_tpu.tools import calibrate
from tests import tiny_configs as tc


def _setup(w_scale=1.0, chi2=None, T=6, seed=0):
  kw = {"w_scale": w_scale}
  if chi2 is not None:
    kw["chi2_threshold"] = chi2
  cfg = tc.tiny_kfnet(**kw)
  params = kfnet.init(jax.random.key(seed), cfg, tc.IMG)
  images = tc.random_images(T, seed=seed + 1)
  return cfg, params, images


def test_series_recursion_matches_run_filter():
  """filter_from_series with traced knobs == run_filter with the same
  values baked into the static config (incl. non-default values)."""
  for w_scale, chi2 in [(1.0, None), (4.0, 2.37)]:
    cfg, params, images = _setup(w_scale=w_scale, chi2=chi2)
    xs_ref, Ps_ref, _ = sequence.run_filter(params, cfg, images)
    cfg1 = dataclasses.replace(cfg, w_scale=1.0)
    series = calibrate.precompute_series(params, cfg1, images)
    xs, Ps = calibrate.filter_from_series(
        cfg1, series, jnp.float32(cfg.chi2_threshold),
        jnp.float32(w_scale))
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xs_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(Ps), np.asarray(Ps_ref),
                               rtol=2e-5, atol=1e-7)


def test_measurement_maps_match_first_frame_and_measure():
  cfg, params, images = _setup()
  series = calibrate.precompute_series(params, cfg, images)
  zs, Vs = calibrate.measurement_maps(series)
  pre = kfnet.preprocess_images(cfg, images)
  z3, V3 = kfnet.measure(params, cfg, pre[3])
  # 5e-5 absorbs compile-order variance (scan body vs standalone jit;
  # ~1e-5 documented in CLAUDE.md conventions)
  np.testing.assert_allclose(np.asarray(zs[3]), np.asarray(z3), atol=5e-5)
  np.testing.assert_allclose(np.asarray(Vs[3]), np.asarray(V3), atol=5e-5)


def test_w_scale_limits():
  """w_scale → large must drive the posterior to the measurement (K → 1);
  w_scale < 1 must pull it closer to the prior than w_scale = 1."""
  cfg, params, images = _setup()
  cfg1 = dataclasses.replace(cfg, w_scale=1.0)
  series = calibrate.precompute_series(params, cfg1, images)
  zs, _ = calibrate.measurement_maps(series)
  chi2 = jnp.float32(1e9)  # disable the gate so the limit is pure-gain
  xs_huge, _ = calibrate.filter_from_series(cfg1, series, chi2,
                                            jnp.float32(1e9))
  np.testing.assert_allclose(np.asarray(xs_huge), np.asarray(zs),
                             atol=1e-4)
  xs_1, _ = calibrate.filter_from_series(cfg1, series, chi2,
                                         jnp.float32(1.0))
  xs_small, _ = calibrate.filter_from_series(cfg1, series, chi2,
                                             jnp.float32(0.25))
  d1 = float(jnp.mean(jnp.abs(xs_1[1:] - zs[1:])))
  dsmall = float(jnp.mean(jnp.abs(xs_small[1:] - zs[1:])))
  assert dsmall > d1 > 0  # smaller W ⇒ more prior weight ⇒ further from z


def test_chi2_zero_is_measurement_only():
  cfg, params, images = _setup()
  cfg1 = dataclasses.replace(cfg, w_scale=1.0)
  series = calibrate.precompute_series(params, cfg1, images)
  zs, Vs = calibrate.measurement_maps(series)
  xs, Ps = calibrate.filter_from_series(cfg1, series, jnp.float32(0.0),
                                        jnp.float32(1.0))
  # chi2 gate at 0 rejects every pixel -> posterior == measurement
  np.testing.assert_allclose(np.asarray(xs), np.asarray(zs), atol=1e-6)
  np.testing.assert_allclose(np.asarray(Ps), np.asarray(Vs), atol=1e-6)


def test_adaptive_inflation_off_is_identity_and_on_deflates_prior():
  """alpha_max < 1 must be the exact stock recursion; with an
  overconfident prior (W scaled down), adaptive inflation must pull the
  posterior toward the measurement relative to the stock filter."""
  cfg, params, images = _setup()
  cfg1 = dataclasses.replace(cfg, w_scale=1.0)
  series = calibrate.precompute_series(params, cfg1, images)
  chi2 = jnp.float32(1e9)  # isolate gain behavior from the gate
  stock = calibrate.filter_from_series(cfg1, series, chi2,
                                       jnp.float32(1.0))
  off = calibrate.filter_from_series(cfg1, series, chi2,
                                     jnp.float32(1.0), jnp.float32(0.0))
  np.testing.assert_array_equal(np.asarray(stock[0]), np.asarray(off[0]))
  np.testing.assert_array_equal(np.asarray(stock[1]), np.asarray(off[1]))
  # crafted overconfident-prior regime: the measurement drifts +1/frame
  # while the (zero-flow, tiny-W) prior insists nothing moves — the
  # transfer failure mode in miniature. maha ≈ 3/(P⁻+V) ≫ 3 ⇒ α > 1.
  T, h, w = 7, 6, 8
  drift = jnp.arange(1, T, dtype=jnp.float32)[:, None, None, None]
  crafted = {
      "z0": jnp.zeros((h, w, 3)),
      "V0": jnp.full((h, w, 1), 0.1),
      "z": jnp.broadcast_to(drift, (T - 1, h, w, 3)),
      "V": jnp.full((T - 1, h, w, 1), 0.1),
      "flow": jnp.zeros((T - 1, h, w, 2)),
      "W": jnp.full((T - 1, h, w, 1), 1e-3),
  }
  xs_over, _ = calibrate.filter_from_series(
      cfg1, crafted, chi2, jnp.float32(1.0), jnp.float32(0.0))
  xs_adapt, _ = calibrate.filter_from_series(
      cfg1, crafted, chi2, jnp.float32(1.0), jnp.float32(100.0))
  zs_crafted = jnp.concatenate([crafted["z0"][None], crafted["z"]])
  d_over = float(jnp.mean(jnp.abs(xs_over[1:] - zs_crafted[1:])))
  d_adapt = float(jnp.mean(jnp.abs(xs_adapt[1:] - zs_crafted[1:])))
  assert d_adapt < 0.5 * d_over  # adaptation deflates the stuck prior


def test_model_adaptive_matches_series_recursion():
  """KFNetConfig.adaptive_alpha_max (the product path, filter/sequence)
  must equal the sweep tool's traced-alpha recursion."""
  cfg = tc.tiny_kfnet(adaptive_alpha_max=8.0)
  params = kfnet.init(jax.random.key(3), cfg, tc.IMG)
  images = tc.random_images(6, seed=4)
  xs_ref, Ps_ref, _ = sequence.run_filter(params, cfg, images)
  cfg1 = dataclasses.replace(cfg, adaptive_alpha_max=0.0)
  series = calibrate.precompute_series(params, cfg1, images)
  xs, Ps = calibrate.filter_from_series(
      cfg1, series, jnp.float32(cfg.chi2_threshold), jnp.float32(1.0),
      jnp.float32(8.0))
  np.testing.assert_allclose(np.asarray(xs), np.asarray(xs_ref), atol=2e-5)
  np.testing.assert_allclose(np.asarray(Ps), np.asarray(Ps_ref),
                             rtol=2e-5, atol=1e-7)


def test_fit_w_scale_runs_and_picks_from_grid():
  """--fit path: per-scene temperature fit on TRAIN data returns a grid
  member and per-candidate means for every candidate."""
  from kfnet_tpu.pose import ransac

  cfg, params, images = _setup(T=5)
  rng = np.random.default_rng(0)
  K = jnp.asarray([[60.0, 0, 31.5], [0, 60.0, 23.5], [0, 0, 1]])
  gt = jnp.broadcast_to(jnp.eye(4), (5, 4, 4))
  grid = [1.0, 8.0]
  best, means = calibrate.fit_w_scale(
      params, cfg, images, K, np.asarray(gt), grid,
      ransac.RansacConfig(num_hypotheses=16, top_k=64))
  assert best in grid
  assert set(means) == set(grid)
  assert all(np.isfinite(v) for v in means.values())


def test_sweep_scene_smooth_grid_rows():
  """smooth_grid crosses pose-space smoothing with the Kalman grid:
  beta=0 filtered row, beta>0 filtered row, and a measurement+smooth
  row — all paired against the raw measurement trajectory."""
  from kfnet_tpu.pose import ransac

  cfg, params, images = _setup(T=6)
  K = jnp.asarray([[60.0, 0, 31.5], [0, 60.0, 23.5], [0, 0, 1]])
  gt = np.broadcast_to(np.eye(4), (6, 4, 4))
  rows, meas = calibrate.sweep_scene(
      params, cfg, images, K, gt, [2.37], [16.0],
      ransac.RansacConfig(num_hypotheses=16, top_k=64),
      block=3, smooth_grid=(0.0, 0.4))
  assert np.isfinite(meas["median_translation_m"])
  bases = {(r["base"], r["smooth_beta"]) for r in rows}
  assert bases == {("measurement", 0.4), ("filtered", 0.0),
                   ("filtered", 0.4)}
  for r in rows:
    assert np.isfinite(r["median_translation_m"])
    assert "delta_translation_mean_ci95" in r
  # the beta=0 filtered row must be the raw solver trajectory (same as
  # a sweep without smooth_grid)
  ref_rows, _ = calibrate.sweep_scene(
      params, cfg, images, K, gt, [2.37], [16.0],
      ransac.RansacConfig(num_hypotheses=16, top_k=64), block=3)
  raw = next(r for r in rows if r["base"] == "filtered"
             and r["smooth_beta"] == 0.0)
  assert raw["median_translation_m"] == (
      ref_rows[0]["median_translation_m"])


def test_sweep_reuses_one_executable():
  """The whole point: no recompiles across grid points (traced knobs)."""
  cfg, params, images = _setup()
  cfg1 = dataclasses.replace(cfg, w_scale=1.0)
  series = calibrate.precompute_series(params, cfg1, images)
  fn = calibrate.filter_from_series
  fn(cfg1, series, jnp.float32(1.0), jnp.float32(1.0))
  misses0 = fn._cache_size()
  for chi2 in (0.5, 3.0, 7.81):
    for ws in (0.5, 2.0, 8.0):
      fn(cfg1, series, jnp.float32(chi2), jnp.float32(ws))
  assert fn._cache_size() == misses0
