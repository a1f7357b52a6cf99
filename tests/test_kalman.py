import jax.numpy as jnp
import numpy as np

from kfnet_tpu.core import kalman


def test_closed_form_one_pixel():
  # P=1, V=1 -> K=0.5, posterior = midpoint, P_post=0.5.
  x = jnp.zeros((1, 1, 3))
  P = jnp.ones((1, 1, 1))
  z = jnp.ones((1, 1, 3)) * 2.0 * 0.1  # small innovation, passes chi2
  V = jnp.ones((1, 1, 1))
  xp, Pp, ok = kalman.kalman_update(x, P, z, V)
  assert bool(ok.all())
  np.testing.assert_allclose(np.asarray(xp), 0.1, rtol=1e-6)
  np.testing.assert_allclose(np.asarray(Pp), 0.5, rtol=1e-6)


def test_posterior_variance_bounded():
  rng = np.random.default_rng(0)
  P = jnp.asarray(rng.uniform(0.01, 5.0, (8, 8, 1)).astype(np.float32))
  V = jnp.asarray(rng.uniform(0.01, 5.0, (8, 8, 1)).astype(np.float32))
  x = jnp.zeros((8, 8, 3))
  z = jnp.zeros((8, 8, 3))
  _, Pp, _ = kalman.kalman_update(x, P, z, V)
  assert bool((Pp <= jnp.minimum(P, V) + 1e-6).all())
  assert bool((Pp > 0).all())


def test_consistency_reset():
  x = jnp.zeros((1, 1, 3))
  P = jnp.full((1, 1, 1), 0.01)
  V = jnp.full((1, 1, 1), 0.01)
  z = jnp.full((1, 1, 3), 10.0)  # wildly inconsistent innovation
  xp, Pp, ok = kalman.kalman_update(x, P, z, V)
  assert not bool(ok.any())
  np.testing.assert_allclose(np.asarray(xp), np.asarray(z))
  np.testing.assert_allclose(np.asarray(Pp), np.asarray(V))


def test_chi2_threshold_boundary():
  # d^2 = |innov|^2/(P+V); choose innov to sit just inside/outside threshold.
  P = jnp.full((1, 1, 1), 1.0)
  V = jnp.full((1, 1, 1), 1.0)
  thr = kalman.CHI2_3DOF_P05
  r_in = float(np.sqrt((thr - 1e-3) * 2.0 / 3.0))
  r_out = float(np.sqrt((thr + 1e-3) * 2.0 / 3.0))
  x = jnp.zeros((1, 1, 3))
  _, _, ok_in = kalman.kalman_update(x, P, jnp.full((1, 1, 3), r_in), V)
  _, _, ok_out = kalman.kalman_update(x, P, jnp.full((1, 1, 3), r_out), V)
  assert bool(ok_in.all()) and not bool(ok_out.any())


def test_information_form_equivalence():
  rng = np.random.default_rng(1)
  x = jnp.asarray(rng.normal(size=(16, 16, 3)).astype(np.float32))
  z = x + jnp.asarray(rng.normal(size=(16, 16, 3)).astype(np.float32)) * 0.05
  P = jnp.asarray(rng.uniform(0.1, 2.0, (16, 16, 1)).astype(np.float32))
  V = jnp.asarray(rng.uniform(0.1, 2.0, (16, 16, 1)).astype(np.float32))
  x1, P1, ok = kalman.kalman_update(x, P, z, V, threshold=1e9)
  x2, P2 = kalman.fuse_information_form(x, P, z, V)
  assert bool(ok.all())
  np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-5)
  np.testing.assert_allclose(np.asarray(P1), np.asarray(P2), atol=1e-6)
