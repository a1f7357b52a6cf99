import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kfnet_tpu.core import geometry as geo
from kfnet_tpu.pose import pnp, ransac


def synth_scene(rng, n=200, noise_px=0.0, outlier_frac=0.0):
  """Random camera viewing a random point cloud; returns (uv, X, T_wc)."""
  w = rng.normal(size=3) * 0.3
  R_wc = np.asarray(geo.axis_angle_to_matrix(jnp.asarray(w, jnp.float32)))
  t_wc = rng.normal(size=3).astype(np.float32)
  T_wc = np.asarray(geo.make_pose(jnp.asarray(R_wc), jnp.asarray(t_wc)))
  K = np.asarray(geo.make_intrinsics(*geo.SEVEN_SCENES_K))
  # points in front of the camera: sample in camera frame, map to world.
  pc = np.stack([
      rng.uniform(-1.5, 1.5, n), rng.uniform(-1.0, 1.0, n),
      rng.uniform(1.0, 5.0, n)], -1).astype(np.float32)
  X = pc @ R_wc.T + t_wc
  uv, z = geo.project(jnp.asarray(X), jnp.asarray(K), jnp.asarray(T_wc))
  uv = np.array(uv)
  assert (np.asarray(z) > 0).all()
  uv += rng.normal(size=uv.shape) * noise_px
  n_out = int(n * outlier_frac)
  if n_out:
    idx = rng.choice(n, n_out, replace=False)
    X = X.copy()
    X[idx] += rng.normal(size=(n_out, 3)) * 2.0
  return jnp.asarray(uv), jnp.asarray(X), jnp.asarray(T_wc), jnp.asarray(K)


def w2c_from_Twc(T_wc):
  T_cw = geo.invert_pose(T_wc)
  return T_cw[:3, :3], T_cw[:3, 3]


def test_dlt_exact_recovery():
  rng = np.random.default_rng(0)
  uv, X, T_wc, K = synth_scene(rng, n=24)
  R, t = pnp.dlt_pnp(uv, X, K)
  Rg, tg = w2c_from_Twc(T_wc)
  np.testing.assert_allclose(np.asarray(R), np.asarray(Rg), atol=2e-3)
  np.testing.assert_allclose(np.asarray(t), np.asarray(tg), atol=5e-3)


def test_dlt_minimal_six_points():
  rng = np.random.default_rng(1)
  uv, X, T_wc, K = synth_scene(rng, n=6)
  R, t = pnp.dlt_pnp(uv, X, K)
  err = pnp.reprojection_errors(uv, X, K, R, t)
  assert float(jnp.max(err)) < 0.5


def test_lm_refinement_improves_noisy_dlt():
  rng = np.random.default_rng(2)
  uv, X, T_wc, K = synth_scene(rng, n=100, noise_px=2.0)
  R0, t0 = pnp.dlt_pnp(uv, X, K)
  w = jnp.ones((100,))
  R, t = pnp.refine_pnp_lm(uv, X, K, R0, t0, w, iters=10)
  e0 = float(jnp.mean(pnp.reprojection_errors(uv, X, K, R0, t0)))
  e1 = float(jnp.mean(pnp.reprojection_errors(uv, X, K, R, t)))
  assert e1 <= e0 + 1e-4
  Rg, tg = w2c_from_Twc(T_wc)
  T_est = geo.invert_pose(geo.make_pose(R, t))
  assert float(geo.translation_error(T_est, T_wc)) < 0.03
  assert float(geo.rotation_error_deg(T_est, T_wc)) < 0.5

  # DLT alone already passes the bars above (verified), so a no-op LM
  # would slip through. Start from a DELIBERATELY perturbed pose: only a
  # working optimizer can recover the accuracy bars from there.
  dR = np.asarray(geo.axis_angle_to_matrix(
      jnp.asarray([0.05, -0.04, 0.03], jnp.float32)))
  R_bad = jnp.asarray(dR) @ R0
  t_bad = t0 + jnp.asarray([0.05, -0.05, 0.08])
  e_bad = float(jnp.mean(pnp.reprojection_errors(uv, X, K, R_bad, t_bad)))
  R2, t2 = pnp.refine_pnp_lm(uv, X, K, R_bad, t_bad, w, iters=15)
  e2 = float(jnp.mean(pnp.reprojection_errors(uv, X, K, R2, t2)))
  assert e2 < 0.5 * e_bad  # strict improvement, not just non-regression
  T_est2 = geo.invert_pose(geo.make_pose(R2, t2))
  assert float(geo.translation_error(T_est2, T_wc)) < 0.03
  assert float(geo.rotation_error_deg(T_est2, T_wc)) < 0.5


def test_ransac_with_outliers():
  rng = np.random.default_rng(3)
  uv, X, T_wc, K = synth_scene(rng, n=400, noise_px=1.0, outlier_frac=0.4)
  var = jnp.ones((400,))
  valid = jnp.ones((400,), bool)
  cfg = ransac.RansacConfig(num_hypotheses=128, top_k=400)
  out = ransac.solve_pnp_ransac(uv, X, var, valid, K, jax.random.key(0), cfg)
  terr = float(geo.translation_error(out["T_wc"], T_wc))
  rerr = float(geo.rotation_error_deg(out["T_wc"], T_wc))
  assert terr < 0.05, terr
  assert rerr < 1.0, rerr
  assert float(out["inlier_ratio"]) > 0.4


def test_ransac_confidence_preselection():
  # corrupted points get high variance: preselection must ignore them.
  rng = np.random.default_rng(4)
  uv, X, T_wc, K = synth_scene(rng, n=300, noise_px=0.5)
  X = np.asarray(X).copy()
  var = np.ones(300, np.float32)
  bad = rng.choice(300, 150, replace=False)
  X[bad] += rng.normal(size=(150, 3)) * 3.0
  var[bad] = 100.0
  cfg = ransac.RansacConfig(num_hypotheses=64, top_k=128)
  out = ransac.solve_pnp_ransac(
      uv, jnp.asarray(X), jnp.asarray(var), jnp.ones((300,), bool), K,
      jax.random.key(1), cfg)
  assert float(geo.translation_error(out["T_wc"], T_wc)) < 0.05


def test_ransac_matches_opencv_oracle():
  cv2 = pytest.importorskip("cv2")
  rng = np.random.default_rng(5)
  uv, X, T_wc, K = synth_scene(rng, n=500, noise_px=1.0, outlier_frac=0.3)
  cfg = ransac.RansacConfig(num_hypotheses=256, top_k=500)
  out = ransac.solve_pnp_ransac(
      uv, X, jnp.ones((500,)), jnp.ones((500,), bool), K,
      jax.random.key(2), cfg)
  ok, rvec, tvec, _ = cv2.solvePnPRansac(
      np.asarray(X, np.float64), np.asarray(uv, np.float64),
      np.asarray(K, np.float64), None, reprojectionError=10.0,
      iterationsCount=256, flags=cv2.SOLVEPNP_EPNP)
  assert ok
  R_cv = cv2.Rodrigues(rvec)[0]
  T_cv = np.asarray(geo.invert_pose(geo.make_pose(
      jnp.asarray(R_cv, jnp.float32), jnp.asarray(tvec[:, 0], jnp.float32))))
  # both close to GT, and close to each other
  assert float(geo.translation_error(out["T_wc"], T_wc)) < 0.05
  assert float(geo.translation_error(jnp.asarray(T_cv), T_wc)) < 0.05
  assert float(geo.translation_error(out["T_wc"], jnp.asarray(T_cv))) < 0.08


def test_ransac_degenerate_few_valid_points():
  """Fewer valid correspondences than a minimal set: must not crash or
  return NaNs (garbage pose + ~zero inliers is the contract)."""
  rng = np.random.default_rng(7)
  uv, X, T_wc, K = synth_scene(rng, n=64)
  valid = np.zeros(64, bool)
  valid[:4] = True  # < sample_size(6)
  cfg = ransac.RansacConfig(num_hypotheses=16, top_k=32)
  out = ransac.solve_pnp_ransac(
      uv, X, jnp.ones((64,)), jnp.asarray(valid), K, jax.random.key(4), cfg)
  assert bool(jnp.isfinite(out["T_wc"]).all())
  assert float(out["inlier_ratio"]) <= 1.0


def test_ransac_all_invalid():
  rng = np.random.default_rng(8)
  uv, X, T_wc, K = synth_scene(rng, n=32)
  cfg = ransac.RansacConfig(num_hypotheses=8, top_k=16)
  out = ransac.solve_pnp_ransac(
      uv, X, jnp.ones((32,)), jnp.zeros((32,), bool), K,
      jax.random.key(5), cfg)
  assert bool(jnp.isfinite(out["T_wc"]).all())
  assert float(out["num_inliers"]) == 0.0


def test_solve_from_maps_shapes():
  rng = np.random.default_rng(6)
  h, w, stride = 6, 8, 8
  K = jnp.asarray(np.asarray(geo.make_intrinsics(*geo.SEVEN_SCENES_K)))
  T_wc = jnp.eye(4)
  grid = geo.cell_center_grid(h, w, stride).reshape(-1, 2)
  pc = np.stack([rng.uniform(-1, 1, h * w), rng.uniform(-1, 1, h * w),
                 rng.uniform(1.5, 4, h * w)], -1).astype(np.float32)
  # build coords whose projection equals the grid exactly:
  fx = fy = 585.0
  z = pc[:, 2]
  x = (np.asarray(grid)[:, 0] - 320.0) / fx * z
  y = (np.asarray(grid)[:, 1] - 240.0) / fy * z
  coords = jnp.asarray(np.stack([x, y, z], -1)).reshape(h, w, 3)
  cfg = ransac.RansacConfig(num_hypotheses=64, top_k=48)
  out = ransac.solve_pnp_from_maps(
      coords, jnp.ones((h, w, 1)) * 0.01, jnp.ones((h, w, 1), bool), K,
      jax.random.key(3), stride=stride, config=cfg)
  assert float(geo.translation_error(out["T_wc"], T_wc)) < 0.02
