"""pose/smoothing.py: gated constant-velocity SE(3) smoothing.

Pins: scatter reduction on noisy-but-smooth trajectories, exact
relock on teleports (the gate), streaming ≡ offline, rotation-manifold
validity, and scale-awareness of the gate (same config, 20x world).
"""

import numpy as np
import pytest

from kfnet_tpu.pose import metrics as pose_metrics
from kfnet_tpu.pose import smoothing


def _traj(n=120, scale=1.0, step=0.02, seed=0):
  """Smooth camera arc: constant-ish velocity translation + slow yaw."""
  rng = np.random.default_rng(seed)
  T = np.zeros((n, 4, 4))
  for t in range(n):
    ang = 0.01 * t
    c, s = np.cos(ang), np.sin(ang)
    T[t] = np.eye(4)
    T[t][:3, :3] = np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    T[t][:3, 3] = scale * np.asarray(
        [step * t, 0.3 * np.sin(0.05 * t), 0.1 * np.cos(0.03 * t)])
  return T, rng


def _add_noise(T, rng, t_sigma=0.02, r_sigma_deg=0.5, scale=1.0):
  out = T.copy()
  for t in range(len(T)):
    out[t][:3, 3] += scale * t_sigma * rng.standard_normal(3)
    w = np.radians(r_sigma_deg) * rng.standard_normal(3)
    out[t][:3, :3] = out[t][:3, :3] @ smoothing._exp_so3(w)
  return out


def test_smoothing_reduces_iid_pose_scatter():
  gt, rng = _traj()
  meas = _add_noise(gt, rng)
  sm = smoothing.smooth_trajectory(meas, smoothing.SmootherConfig(beta=0.4))
  t_raw, r_raw = pose_metrics.pose_errors(meas, gt)
  t_sm, r_sm = pose_metrics.pose_errors(sm, gt)
  assert t_sm.mean() < 0.85 * t_raw.mean()
  assert r_sm.mean() < 0.9 * r_raw.mean()


def test_beta_zero_is_passthrough():
  gt, rng = _traj(n=20)
  meas = _add_noise(gt, rng)
  sm = smoothing.smooth_trajectory(meas, smoothing.SmootherConfig(beta=0.0))
  np.testing.assert_allclose(sm, meas, atol=1e-12)


def test_gate_relocks_on_teleport():
  gt, rng = _traj(n=60)
  meas = _add_noise(gt, rng)
  meas[30:, :3, 3] += np.asarray([5.0, 0.0, 0.0])  # scene cut
  cfg = smoothing.SmootherConfig(beta=0.6)
  sm = smoothing.smooth_trajectory(meas, cfg)
  # the jump frame is emitted unchanged (relock, no blend toward the
  # pre-jump prediction)
  np.testing.assert_allclose(sm[30], meas[30], atol=1e-12)
  # and the stale pre-jump velocity must not contaminate the frame after
  # the relock: its prediction is the relocked pose itself, so the
  # smoothed output stays within the gate of the post-jump measurements
  assert np.linalg.norm(sm[31][:3, 3] - meas[31][:3, 3]) < 0.1


def test_streaming_equals_offline():
  gt, rng = _traj(n=40)
  meas = _add_noise(gt, rng)
  cfg = smoothing.SmootherConfig(beta=0.4)
  off = smoothing.smooth_trajectory(meas, cfg)
  sm = smoothing.PoseSmoother(cfg)
  on = np.stack([sm.update(T) for T in meas])
  np.testing.assert_allclose(on, off, atol=0.0)


def test_reset_mask_restarts_history():
  gt, rng = _traj(n=40)
  meas = _add_noise(gt, rng)
  cfg = smoothing.SmootherConfig(beta=0.4)
  reset = np.zeros(40, bool)
  reset[20] = True
  sm = smoothing.smooth_trajectory(meas, cfg, reset=reset)
  # frame 20 is a fresh start: emitted unchanged
  np.testing.assert_allclose(sm[20], meas[20], atol=1e-12)
  # and the tail equals smoothing the tail alone
  tail = smoothing.smooth_trajectory(meas[20:], cfg)
  np.testing.assert_allclose(sm[20:], tail, atol=0.0)


def test_outputs_stay_on_rotation_manifold():
  gt, rng = _traj(n=50)
  meas = _add_noise(gt, rng, r_sigma_deg=3.0)
  sm = smoothing.smooth_trajectory(meas, smoothing.SmootherConfig(beta=0.6))
  for T in sm:
    R = T[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
    assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-10)
    np.testing.assert_allclose(T[3], [0, 0, 0, 1], atol=0.0)


def test_gate_is_scale_aware():
  """Same config on a 20x world: the motion-EMA gate scales with the
  stream, so smoothing still engages (not constant relock) and still
  reduces scatter."""
  gt, rng = _traj(scale=20.0, seed=3)
  meas = _add_noise(gt, rng, scale=20.0)
  cfg = smoothing.SmootherConfig(beta=0.4)
  sm = smoothing.smooth_trajectory(meas, cfg)
  t_raw, _ = pose_metrics.pose_errors(meas, gt)
  t_sm, _ = pose_metrics.pose_errors(sm, gt)
  assert t_sm.mean() < 0.85 * t_raw.mean()
  # smoothing actually engaged: outputs differ from measurements on the
  # overwhelming majority of frames
  moved = np.linalg.norm(sm[:, :3, 3] - meas[:, :3, 3], axis=-1) > 1e-9
  assert moved[2:].mean() > 0.9


def test_log_exp_so3_roundtrip_incl_pi():
  rng = np.random.default_rng(0)
  for theta in (1e-9, 0.3, 1.5, np.pi / 2 + 0.3, np.pi - 1e-7, np.pi):
    axis = rng.standard_normal(3)
    axis /= np.linalg.norm(axis)
    R = smoothing._exp_so3(theta * axis)
    w = smoothing._log_so3(R)
    R2 = smoothing._exp_so3(w)
    np.testing.assert_allclose(R2, R, atol=1e-8)


def test_single_outlier_does_not_poison_gate_or_contaminate_recovery():
  """A single gross PnP outlier must not widen the motion-EMA gate: the
  outlier frame relocks (pass-through), and the following GOOD frames
  must come out (near-)unchanged rather than blended toward the outlier
  (the review-confirmed failure mode of ingesting the outlier step into
  the EMA before gating)."""
  gt, _ = _traj(n=20, step=0.02)
  meas = gt.copy()
  meas[5, :3, 3] += np.asarray([5.0, 0.0, 0.0])  # one degenerate solve
  sm = smoothing.smooth_trajectory(meas, smoothing.SmootherConfig(beta=0.4))
  # outlier frame: relock, emitted unchanged
  np.testing.assert_allclose(sm[5], meas[5], atol=1e-12)
  # frames 6.. are exact measurements; their smoothed outputs must stay
  # within a small fraction of the outlier magnitude of the truth
  err = np.linalg.norm(sm[:, :3, 3] - gt[:, :3, 3], axis=-1)
  assert err[6] < 0.05 and err[7] < 0.05 and err[8:].max() < 0.02
