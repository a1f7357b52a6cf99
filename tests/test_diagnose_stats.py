"""residual_stats separates scatter from global bias (tools/diagnose.py).

The round-4 outdoor GN-vs-none inversion showed a residual field that is
BETTER by median norm, autocorrelation and inlier ratio yet yields WORSE
poses — the signature of a rigid per-frame shift. The bias statistic
must expose exactly that shape while staying near zero for iid scatter.
"""

import numpy as np

from kfnet_tpu.tools.diagnose import residual_stats


def _field(T=4, H=10, W=12):
  rng = np.random.default_rng(0)
  gt = rng.normal(size=(T, H, W, 3))
  valid = np.ones((T, H, W), bool)
  return gt, valid, rng


def test_iid_scatter_has_tiny_bias():
  gt, valid, rng = _field()
  scatter = rng.normal(scale=0.1, size=gt.shape)
  s = residual_stats(gt + scatter, gt, valid)
  # per-frame mean of N=120 iid residuals shrinks ~1/sqrt(N)
  assert s["median_frame_bias_m"] < 0.35 * s["median_coord_err_m"]
  assert abs(s["spatial_autocorr_lag1"]) < 0.2


def test_rigid_shift_is_all_bias():
  # integer gt + dyadic shift keeps the residual EXACTLY constant in f64
  # (inexact arithmetic would leave ~1e-17 rounding jitter whose
  # "autocorrelation" is numerically meaningless)
  rng = np.random.default_rng(1)
  gt = rng.integers(-8, 8, size=(4, 10, 12, 3)).astype(np.float64)
  valid = np.ones(gt.shape[:3], bool)
  shift = np.array([0.25, -0.5, 0.0])
  want = float(np.linalg.norm(shift))
  s = residual_stats(gt + shift, gt, valid)
  np.testing.assert_allclose(s["median_frame_bias_m"], want, rtol=1e-12)
  np.testing.assert_allclose(s["median_coord_err_m"], want, rtol=1e-12)
  # constant residual has zero variance: autocorr is undefined, not fake
  assert s["spatial_autocorr_lag1"] is None


def test_low_valid_frames_excluded():
  gt, valid, rng = _field()
  valid[1:] = False  # frames 1.. have 0 <= 100 valid px
  valid[0, :, :] = True
  s = residual_stats(gt + 0.1, gt, valid)
  assert s["median_frame_bias_m"] is not None  # frame 0 alone (120 px)
