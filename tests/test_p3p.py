import jax
import jax.numpy as jnp
import numpy as np

from kfnet_tpu.core import geometry as geo
from kfnet_tpu.pose import p3p, ransac
from tests.test_pnp import synth_scene


def test_quartic_roots():
  # (z-1)(z-2)(z-3)(z-4) = z^4 -10z^3 +35z^2 -50z +24
  roots = p3p.durand_kerner_quartic(
      jnp.asarray([1.0, -10.0, 35.0, -50.0, 24.0]))
  got = np.sort(np.real(np.asarray(roots)))
  np.testing.assert_allclose(got, [1, 2, 3, 4], atol=1e-3)
  assert np.abs(np.imag(np.asarray(roots))).max() < 1e-3


def test_p3p_exact_recovery_rate():
  rng = np.random.default_rng(0)
  K = jnp.asarray(np.asarray(geo.make_intrinsics(*geo.SEVEN_SCENES_K)))
  hits = 0
  trials = 20
  for _ in range(trials):
    w = rng.normal(size=3) * 0.4
    R_wc = np.asarray(geo.axis_angle_to_matrix(jnp.asarray(w, jnp.float32)))
    t_wc = rng.normal(size=3).astype(np.float32)
    T_wc = np.asarray(geo.make_pose(jnp.asarray(R_wc), jnp.asarray(t_wc)))
    pc = np.stack([rng.uniform(-1, 1, 3), rng.uniform(-0.8, 0.8, 3),
                   rng.uniform(1.5, 4, 3)], -1).astype(np.float32)
    X = pc @ R_wc.T + t_wc
    uv, _ = geo.project(jnp.asarray(X), K, jnp.asarray(T_wc))
    Rs, ts = p3p.p3p_grunert(uv, jnp.asarray(X), K)
    T_cw = np.asarray(geo.invert_pose(jnp.asarray(T_wc)))
    best = min(
        np.abs(np.asarray(Rs[i]) - T_cw[:3, :3]).max()
        + np.abs(np.asarray(ts[i]) - T_cw[:3, 3]).max() for i in range(4))
    hits += best < 1e-2
  # f32 Durand-Kerner occasionally misses ill-conditioned sets; RANSAC
  # scoring absorbs those. Require a healthy majority.
  assert hits >= trials * 0.8, hits


def test_ransac_p3p_low_inlier_ratio():
  """At 60% outliers, 3-point sampling must still recover the pose with a
  modest hypothesis budget (all-inlier probability per draw: 6.4%)."""
  rng = np.random.default_rng(5)
  uv, X, T_wc, K = synth_scene(rng, n=400, noise_px=1.0, outlier_frac=0.6)
  cfg = ransac.RansacConfig(num_hypotheses=128, top_k=400, solver="p3p")
  out = ransac.solve_pnp_ransac(
      uv, X, jnp.ones((400,)), jnp.ones((400,), bool), K,
      jax.random.key(0), cfg)
  assert float(geo.translation_error(out["T_wc"], T_wc)) < 0.05
  assert float(geo.rotation_error_deg(out["T_wc"], T_wc)) < 1.0


def test_ransac_p3p_matches_dlt_easy_case():
  rng = np.random.default_rng(6)
  uv, X, T_wc, K = synth_scene(rng, n=300, noise_px=1.0, outlier_frac=0.2)
  for solver in ("dlt", "p3p"):
    cfg = ransac.RansacConfig(num_hypotheses=64, top_k=300, solver=solver)
    out = ransac.solve_pnp_ransac(
        uv, X, jnp.ones((300,)), jnp.ones((300,), bool), K,
        jax.random.key(1), cfg)
    assert float(geo.translation_error(out["T_wc"], T_wc)) < 0.05, solver
