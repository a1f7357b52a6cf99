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


def test_rotation_deformation_seen_by_rigid_move_not_bias():
  """A small rotation about the field centroid has ~zero mean residual
  (invisible to frame_bias) but IS a pose-shaped error: rigid_move must
  capture it and the non-rigid remainder must be ~0 — the exact shape
  that made the round-4 bias statistic come back 'refuted'."""
  gt, valid, rng = _field()
  out = np.empty_like(gt)
  th = 0.05
  R = np.array([[np.cos(th), -np.sin(th), 0],
                [np.sin(th), np.cos(th), 0],
                [0, 0, 1.0]])
  for t in range(gt.shape[0]):
    c = gt[t].reshape(-1, 3).mean(axis=0)
    out[t] = ((gt[t].reshape(-1, 3) - c) @ R.T + c).reshape(gt[t].shape)
  s = residual_stats(out, gt, valid)
  assert s["median_frame_bias_m"] < 0.05 * s["median_coord_err_m"]
  # rigid_move is a median of per-frame medians; coord_err a global
  # median — same rotation displacement, slightly different aggregation
  np.testing.assert_allclose(s["median_rigid_move_m"],
                             s["median_coord_err_m"], rtol=0.05)
  assert s["median_resid_after_rigid_m"] < 1e-9


def test_rotation_lever_arm_amplifies_implied_camera_move():
  """Rotation by θ about the field centroid with the camera at distance
  d: points move ~r·θ (cloud radius r ≈ 1 here) but the implied camera
  moves 2·sin(θ/2)·d — the outdoor-transfer signature where a
  point-small deformation is pose-large."""
  gt, valid, rng = _field()
  th = 0.05
  R = np.array([[np.cos(th), -np.sin(th), 0],
                [np.sin(th), np.cos(th), 0],
                [0, 0, 1.0]])
  out = np.empty_like(gt)
  cams = np.empty((gt.shape[0], 3))
  d = 40.0
  for t in range(gt.shape[0]):
    c = gt[t].reshape(-1, 3).mean(axis=0)
    out[t] = ((gt[t].reshape(-1, 3) - c) @ R.T + c).reshape(gt[t].shape)
    cams[t] = c + np.array([d, 0.0, 0.0])  # in the rotation plane
  s = residual_stats(out, gt, valid, cam_centers=cams)
  want_cam = 2.0 * np.sin(th / 2.0) * d
  np.testing.assert_allclose(s["median_rigid_rot_deg"], np.degrees(th),
                             rtol=1e-6)
  np.testing.assert_allclose(s["median_implied_cam_move_m"], want_cam,
                             rtol=1e-6)
  # the lever arm: camera error is many times the point-level error
  assert s["median_implied_cam_move_m"] > 10 * s["median_rigid_move_m"]


def test_pure_shift_implied_camera_move_equals_shift():
  """A pure translation has no lever arm: the implied camera moves by
  exactly the shift, with zero rigid rotation."""
  rng = np.random.default_rng(1)
  gt = rng.integers(-8, 8, size=(4, 10, 12, 3)).astype(np.float64)
  valid = np.ones(gt.shape[:3], bool)
  shift = np.array([0.25, -0.5, 0.0])
  cams = np.tile(np.array([100.0, -30.0, 7.0]), (4, 1))
  s = residual_stats(gt + shift, gt, valid, cam_centers=cams)
  np.testing.assert_allclose(s["median_implied_cam_move_m"],
                             np.linalg.norm(shift), rtol=1e-9)
  assert s["median_rigid_rot_deg"] < 1e-6


def test_iid_scatter_is_nonrigid():
  gt, valid, rng = _field()
  s = residual_stats(gt + rng.normal(scale=0.1, size=gt.shape), gt, valid)
  # the rigid fit cannot explain iid scatter: remainder ~= raw error
  assert s["median_resid_after_rigid_m"] > 0.8 * s["median_coord_err_m"]
  assert s["median_rigid_move_m"] < 0.3 * s["median_coord_err_m"]


def test_sigma_ranking_stats():
  """Informative σ → the top-k pool is cleaner than the field and the
  rank correlation is strongly positive; anti-informative σ (confident
  exactly where wrong) → the pool is WORSE than the field median."""
  gt, valid, rng = _field()
  err = rng.uniform(0.01, 1.0, size=gt.shape[:3])
  direction = rng.normal(size=gt.shape)
  direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
  pred = gt + err[..., None] * direction
  good_sigma = err[..., None] ** 2
  s = residual_stats(pred, gt, valid, variance=good_sigma, top_k=30)
  assert s["sigma_err_rank_corr"] > 0.9
  assert s["median_topk_coord_err_m"] < 0.5 * s["median_coord_err_m"]
  bad_sigma = (err.max() - err)[..., None] ** 2
  s2 = residual_stats(pred, gt, valid, variance=bad_sigma, top_k=30)
  assert s2["sigma_err_rank_corr"] < -0.9
  assert s2["median_topk_coord_err_m"] > 1.5 * s2["median_coord_err_m"]


def test_sigma_rank_corr_ties_unbiased():
  """Tied σ blocks (the clipped-log-variance regime) must not
  manufacture correlation: with near-constant σ over a raster-ordered
  error gradient, ordinal ranks would read ρ≈1 (raster order IS the
  error order); average ranks for ties must read ρ≈0."""
  T, H, W = 2, 10, 12
  gt = np.zeros((T, H, W, 3))
  err = np.linspace(0.01, 1.0, H * W).reshape(1, H, W).repeat(T, axis=0)
  pred = gt + err[..., None] * np.array([1.0, 0.0, 0.0])
  sigma = np.ones((T, H, W, 1))
  # one non-tie so σ isn't constant (std > 0), at the MIDDLE of the
  # error gradient so its own (genuine) correlation contribution is ~0
  sigma[:, H // 2, W // 2, 0] = 2.0
  valid = np.ones((T, H, W), bool)
  s = residual_stats(pred, gt, valid, variance=sigma, top_k=30)
  assert abs(s["sigma_err_rank_corr"]) < 0.1, s["sigma_err_rank_corr"]


def test_pool_coherent_deformation_seen_only_by_pool_kabsch():
  """The round-5 outdoor shape: σ selects a subset that is coherently
  rotated while the rest of the field is clean. The FULL-field Kabsch
  dilutes the deformation (most points vote identity) but the POOL fit
  sees it whole — pool_implied_cam_move must recover the lever-arm
  amplified camera error the full-field statistic underpredicts."""
  rng = np.random.default_rng(7)
  T, H, W, k = 3, 10, 12, 30
  gt = rng.normal(size=(T, H, W, 3))
  pred = gt.copy()
  sigma = np.full((T, H, W, 1), 4.0)
  th = 0.05
  R = np.array([[np.cos(th), -np.sin(th), 0],
                [np.sin(th), np.cos(th), 0],
                [0, 0, 1.0]])
  cams = np.empty((T, 3))
  d = 40.0
  pool = np.zeros(H * W, bool)
  pool[rng.choice(H * W, size=k, replace=False)] = True
  for t in range(T):
    flat = gt[t].reshape(-1, 3)
    c = flat[pool].mean(axis=0)
    deformed = (flat[pool] - c) @ R.T + c
    pf = pred[t].reshape(-1, 3)
    pf[pool] = deformed
    sigma[t].reshape(-1)[pool] = 1.0  # σ prefers exactly the deformed set
    cams[t] = c + np.array([d, 0.0, 0.0])
  valid = np.ones((T, H, W), bool)
  s = residual_stats(pred, gt, valid, variance=sigma, top_k=k,
                     cam_centers=cams)
  want_cam = 2.0 * np.sin(th / 2.0) * d
  np.testing.assert_allclose(s["pool_rigid_rot_deg"], np.degrees(th),
                             rtol=1e-6)
  np.testing.assert_allclose(s["pool_implied_cam_move_m"], want_cam,
                             rtol=1e-6)
  assert s["pool_resid_after_rigid_m"] < 1e-9
  # the full-field fit, diluted by 90 clean points, underpredicts
  assert s["median_implied_cam_move_m"] < 0.5 * s["pool_implied_cam_move_m"]


def test_pool_concentration_raises_pool_lever_arm():
  """σ-selection that spatially CONCENTRATES the pool (one tight nearby
  cluster) must report a pool lever-arm gain far above the scene's even
  with zero prediction error — the conditioning sub-mechanism."""
  from kfnet_tpu.tools.diagnose import scene_geometry
  rng = np.random.default_rng(8)
  T, H, W, k = 2, 10, 12, 30
  gt = rng.normal(size=(T, H, W, 3))
  sigma = np.full((T, H, W, 1), 4.0)
  cluster = np.zeros(H * W, bool)
  cluster[rng.choice(H * W, size=k, replace=False)] = True
  for t in range(T):
    flat = gt[t].reshape(-1, 3)
    flat[cluster] = flat[cluster].mean(axis=0) + 0.05 * rng.normal(
        size=(k, 3))
    sigma[t].reshape(-1)[cluster] = 1.0
  valid = np.ones((T, H, W), bool)
  cams = gt.reshape(T, -1, 3).mean(axis=1) + np.array([10.0, 0.0, 0.0])
  s = residual_stats(gt, gt, valid, variance=sigma, top_k=k,
                     cam_centers=cams)
  geo = scene_geometry(gt, valid, cams)
  assert s["pool_cloud_radius_m"] < 0.3 * geo["median_cloud_radius_m"]
  assert s["pool_lever_arm_gain"] > 3.0 * geo["lever_arm_gain"]


def test_low_valid_frames_excluded():
  gt, valid, rng = _field()
  valid[1:] = False  # frames 1.. have 0 <= 100 valid px
  valid[0, :, :] = True
  s = residual_stats(gt + 0.1, gt, valid)
  assert s["median_frame_bias_m"] is not None  # frame 0 alone (120 px)


def test_scene_geometry_lever_arm_gain():
  """lever_arm_gain = median(d/r) from GT alone: a unit-radius-class
  cloud viewed from distance d must report gain ≈ d / r exactly, and
  moving the camera 10× further must scale the gain ~10×."""
  from kfnet_tpu.tools.diagnose import scene_geometry
  rng = np.random.default_rng(3)
  T, H, W = 3, 10, 12
  gt = rng.normal(size=(T, H, W, 3))
  valid = np.ones((T, H, W), bool)
  cen = gt.reshape(T, -1, 3).mean(axis=1)
  r_true = np.median(np.linalg.norm(
      gt.reshape(T, -1, 3) - cen[:, None], axis=-1), axis=1)
  near = cen + np.array([5.0, 0.0, 0.0])
  far = cen + np.array([50.0, 0.0, 0.0])
  g_near = scene_geometry(gt, valid, near)
  g_far = scene_geometry(gt, valid, far)
  np.testing.assert_allclose(g_near["median_cloud_radius_m"],
                             np.median(r_true), rtol=1e-12)
  np.testing.assert_allclose(g_near["median_cam_centroid_dist_m"], 5.0,
                             rtol=1e-12)
  np.testing.assert_allclose(
      g_near["lever_arm_gain"],
      np.median(5.0 / r_true), rtol=1e-12)
  np.testing.assert_allclose(g_far["lever_arm_gain"] /
                             g_near["lever_arm_gain"], 10.0, rtol=1e-12)


def test_merge_modes_replaces_only_rerun_rows():
  from kfnet_tpu.tools.diagnose import merge_modes
  prev = {"modes": [{"mode": "measurement_only", "old": True},
                    {"mode": "filtered_serving_chi0.50_w16", "old": True}]}
  rows = [{"mode": "measurement_only", "old": False}]
  merged = merge_modes(prev, rows)
  assert len(merged) == 2
  by = {m["mode"]: m for m in merged}
  assert by["measurement_only"]["old"] is False
  assert by["filtered_serving_chi0.50_w16"]["old"] is True


def test_counterfactual_derigid_removes_deformation_keeps_scatter():
  """derigid must take a rotated+noisy field back to GT+noise: the
  residual_stats of the edited map show ~zero rigid_move while the
  non-rigid scatter magnitude is preserved."""
  from kfnet_tpu.tools.diagnose import counterfactual_maps
  gt, valid, rng = _field()
  th = 0.05
  R = np.array([[np.cos(th), -np.sin(th), 0],
                [np.sin(th), np.cos(th), 0],
                [0, 0, 1.0]])
  noise = rng.normal(scale=0.02, size=gt.shape)
  pred = np.empty_like(gt)
  for t in range(gt.shape[0]):
    c = gt[t].reshape(-1, 3).mean(axis=0)
    pred[t] = ((gt[t].reshape(-1, 3) - c) @ R.T + c).reshape(gt[t].shape)
  pred = pred + noise
  before = residual_stats(pred, gt, valid)
  fixed = counterfactual_maps(pred, gt, valid, "derigid")
  after = residual_stats(fixed, gt, valid)
  assert after["median_rigid_move_m"] < 0.1 * before["median_rigid_move_m"]
  # scatter survives the edit (Kabsch can't remove iid noise)
  np.testing.assert_allclose(after["median_coord_err_m"],
                             after["median_resid_after_rigid_m"], rtol=0.2)
  assert after["median_coord_err_m"] > 0.5 * np.median(
      np.linalg.norm(noise, axis=-1))


def test_counterfactual_rigidonly_is_noise_free_deformation():
  """rigidonly keeps ONLY the fitted deformation: its residual equals
  the rigid_move of the original field with ~zero non-rigid remainder."""
  from kfnet_tpu.tools.diagnose import counterfactual_maps
  gt, valid, rng = _field()
  th = 0.05
  R = np.array([[np.cos(th), -np.sin(th), 0],
                [np.sin(th), np.cos(th), 0],
                [0, 0, 1.0]])
  noise = rng.normal(scale=0.02, size=gt.shape)
  pred = np.empty_like(gt)
  for t in range(gt.shape[0]):
    c = gt[t].reshape(-1, 3).mean(axis=0)
    pred[t] = ((gt[t].reshape(-1, 3) - c) @ R.T + c).reshape(gt[t].shape)
  pred = pred + noise
  iso = counterfactual_maps(pred, gt, valid, "rigidonly")
  s = residual_stats(iso, gt, valid)
  assert s["median_resid_after_rigid_m"] < 5e-3
  # deformation magnitude preserved (float32 output => loose rtol)
  base = residual_stats(pred, gt, valid)
  np.testing.assert_allclose(s["median_rigid_move_m"],
                             base["median_rigid_move_m"], rtol=0.1)


def test_counterfactual_derigid_pool_uses_pool_fit():
  """When the sigma-selected pool carries a coherent shift the full
  field lacks, derigid_pool must correct the pool (its post-edit top-k
  error collapses) while plain derigid, fitted on the whole field,
  cannot."""
  from kfnet_tpu.tools.diagnose import counterfactual_maps
  T, H, W = 3, 10, 12
  rng = np.random.default_rng(7)
  gt = rng.normal(size=(T, H, W, 3))
  valid = np.ones((T, H, W), bool)
  sigma = np.ones((T, H, W, 1))
  sigma[:, :3, :4] = 0.01          # pool = first 12 cells of each frame
  pool = np.zeros((H, W), bool)
  pool[:3, :4] = True
  k = int(pool.sum())
  pred = gt + rng.normal(scale=0.01, size=gt.shape)
  pred[:, pool] += np.array([0.5, 0.0, 0.0])   # coherent pool-only shift
  fixed = counterfactual_maps(pred, gt, valid, "derigid_pool",
                              variance=sigma, top_k=k)
  full = counterfactual_maps(pred, gt, valid, "derigid")
  err_fixed = np.linalg.norm(fixed[:, pool] - gt[:, pool], axis=-1)
  err_full = np.linalg.norm(full[:, pool] - gt[:, pool], axis=-1)
  assert np.median(err_fixed) < 0.1 * np.median(err_full)


def test_counterfactual_passthrough_on_low_valid_frames():
  from kfnet_tpu.tools.diagnose import counterfactual_maps
  gt, valid, rng = _field()
  valid[1] = False                 # frame 1: no valid cells at all
  pred = gt + 0.3
  out = counterfactual_maps(pred, gt, valid, "derigid")
  np.testing.assert_allclose(out[1], pred[1].astype(np.float32))
  assert np.abs(out[0] - gt[0]).max() < 1e-5


def _rays_setup(T=3, H=10, W=12, seed=3):
  rng = np.random.default_rng(seed)
  gt = rng.normal(size=(T, H, W, 3)) + np.array([0.0, 0.0, 5.0])
  valid = np.ones((T, H, W), bool)
  cams = np.zeros((T, 3))          # camera at origin, scene ~5 m away
  return gt, valid, cams, rng


def test_radial_error_has_unit_radial_frac():
  """Error along each point's own viewing ray: reprojection-invisible.
  radial_frac -> 1, pool tangential -> 0, pool radial = magnitude."""
  gt, valid, cams, rng = _rays_setup()
  rays = gt / np.linalg.norm(gt, axis=-1, keepdims=True)
  pred = gt + 0.2 * rays
  sigma = np.ones(gt.shape[:3] + (1,))
  s = residual_stats(pred, gt, valid, variance=sigma,
                     top_k=gt[0, ..., 0].size, cam_centers=cams)
  assert s["median_radial_frac"] > 0.999
  np.testing.assert_allclose(s["pool_radial_err_m"], 0.2, rtol=1e-9)
  assert s["pool_tangential_err_m"] < 1e-9


def test_isotropic_error_radial_frac_half():
  gt, valid, cams, rng = _rays_setup()
  pred = gt + rng.normal(scale=0.1, size=gt.shape)
  sigma = np.ones(gt.shape[:3] + (1,))
  s = residual_stats(pred, gt, valid, variance=sigma,
                     top_k=gt[0, ..., 0].size, cam_centers=cams)
  # |cos| of an isotropic 3D direction has median 0.5
  assert 0.35 < s["median_radial_frac"] < 0.65
  # radial and tangential split the magnitude: tan = sqrt(e^2 - rad^2)
  assert s["pool_radial_err_m"] > 0.01
  assert s["pool_tangential_err_m"] > 0.01


def test_tangential_error_has_zero_radial_frac():
  gt, valid, cams, rng = _rays_setup()
  rays = gt / np.linalg.norm(gt, axis=-1, keepdims=True)
  up = np.array([0.0, 1.0, 0.0])
  tang = np.cross(rays, up)
  tang /= np.linalg.norm(tang, axis=-1, keepdims=True)
  pred = gt + 0.15 * tang
  sigma = np.ones(gt.shape[:3] + (1,))
  s = residual_stats(pred, gt, valid, variance=sigma,
                     top_k=gt[0, ..., 0].size, cam_centers=cams)
  assert s["median_radial_frac"] < 1e-6
  assert s["pool_radial_err_m"] < 1e-9
  np.testing.assert_allclose(s["pool_tangential_err_m"], 0.15, rtol=1e-9)
