"""eval/stats.py: moving-block bootstrap + paired delta reports."""

import numpy as np
import pytest

from kfnet_tpu.eval import stats


def test_bootstrap_ci_covers_true_mean():
  rng = np.random.default_rng(0)
  x = rng.normal(0.5, 1.0, size=400)
  lo, hi = stats.moving_block_bootstrap_ci(x, np.mean, block=20, seed=1)
  assert lo < x.mean() < hi
  # interval is a real interval, roughly ±2 se wide (se ≈ 0.05)
  assert 0.05 < hi - lo < 0.5


def test_bootstrap_ci_wider_under_autocorrelation():
  """Serially correlated data must yield a WIDER interval than an iid
  shuffle of the same values — the reason for block (not iid) bootstrap."""
  rng = np.random.default_rng(2)
  # AR(1) with strong correlation
  e = rng.normal(size=600)
  x = np.empty(600)
  x[0] = e[0]
  for i in range(1, 600):
    x[i] = 0.9 * x[i - 1] + e[i]
  lo_b, hi_b = stats.moving_block_bootstrap_ci(x, np.mean, block=50, seed=3)
  shuffled = rng.permutation(x)
  lo_i, hi_i = stats.moving_block_bootstrap_ci(
      shuffled, np.mean, block=1, seed=3)  # block=1 == iid bootstrap
  assert (hi_b - lo_b) > 1.5 * (hi_i - lo_i)


def test_bootstrap_tiny_inputs():
  assert stats.moving_block_bootstrap_ci(np.array([]), np.mean)[0] != \
      stats.moving_block_bootstrap_ci(np.array([]), np.mean)[0]  # nan
  lo, hi = stats.moving_block_bootstrap_ci(np.array([3.0]), np.mean)
  assert lo == hi == 3.0
  lo, hi = stats.moving_block_bootstrap_ci(np.array([1.0, 2.0]), np.mean,
                                           block=24)
  assert 1.0 <= lo <= hi <= 2.0


def test_paired_delta_detects_small_consistent_win():
  """A 2% consistent improvement invisible to median-of-48 comparisons is
  decisively resolved by the paired CI at T=480."""
  rng = np.random.default_rng(4)
  base = np.abs(rng.normal(0.1, 0.05, size=480))
  meas = base + rng.normal(0, 0.005, size=480)
  filt = base * 0.98 + rng.normal(0, 0.005, size=480)
  rep = stats.paired_delta_report(filt, meas, block=24, prefix="t_")
  assert rep["delta_t_mean"] < 0
  assert stats.significant(rep["delta_t_mean_ci95"]) == -1
  assert rep["t_win_frac"] > 0.5
  assert rep["t_frames"] == 480


def test_paired_delta_undecided_on_noise():
  rng = np.random.default_rng(5)
  meas = np.abs(rng.normal(0.1, 0.02, size=200))
  filt = meas + rng.normal(0, 0.02, size=200)  # same distribution, paired noise
  rep = stats.paired_delta_report(filt, meas, prefix="")
  assert stats.significant(rep["delta_mean_ci95"]) == 0


def test_paired_delta_shape_mismatch():
  with pytest.raises(ValueError):
    stats.paired_delta_report(np.zeros(3), np.zeros(4))


def test_significant():
  assert stats.significant([-2.0, -1.0]) == -1
  assert stats.significant([1.0, 2.0]) == 1
  assert stats.significant([-1.0, 1.0]) == 0
