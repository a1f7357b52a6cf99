import jax
import jax.numpy as jnp
import numpy as np

from kfnet_tpu.losses import nll


def test_gaussian_nll_hand_computed():
  # one pixel: pred-target = (0.1, 0.2, 0.2) -> |d|^2 = 0.09; var = 0.5
  pred = jnp.asarray([[[0.1, 0.2, 0.2]]])
  target = jnp.zeros((1, 1, 3))
  var = jnp.full((1, 1, 1), 0.5)
  want = 1.5 * np.log(0.5) + 0.09 / (2 * 0.5)
  got = float(nll.gaussian_nll(pred, target, var))
  np.testing.assert_allclose(got, want, rtol=1e-6)


def test_gaussian_nll_equals_three_log_sigma_form():
  # 3 log σ + |d|²/(2σ²) == 1.5 log σ² + |d|²/(2σ²)
  rng = np.random.default_rng(0)
  d = rng.normal(size=(4, 4, 3)).astype(np.float32)
  sigma = rng.uniform(0.2, 2.0, (4, 4, 1)).astype(np.float32)
  got = float(nll.gaussian_nll(jnp.asarray(d), jnp.zeros((4, 4, 3)),
                               jnp.asarray(sigma ** 2)))
  want = np.mean(3 * np.log(sigma) +
                 np.sum(d * d, -1, keepdims=True) / (2 * sigma ** 2))
  np.testing.assert_allclose(got, want, rtol=1e-5)


def test_masking_excludes_invalid():
  pred = jnp.zeros((2, 2, 3))
  target = jnp.ones((2, 2, 3)) * 100.0  # huge error...
  target = target.at[0, 0].set(0.0)     # ...except one valid pixel
  var = jnp.ones((2, 2, 1))
  mask = jnp.zeros((2, 2), bool).at[0, 0].set(True)
  got = float(nll.gaussian_nll(pred, target, var, mask))
  np.testing.assert_allclose(got, 0.0, atol=1e-6)  # 1.5·log(1) + 0


def test_empty_mask_is_safe():
  x = jnp.zeros((2, 2, 3))
  got = float(nll.gaussian_nll(x, x, jnp.ones((2, 2, 1)),
                               jnp.zeros((2, 2), bool)))
  assert np.isfinite(got)


def test_optimal_variance_minimizes_nll():
  # d/dσ² NLL = 0  at σ² = |d|²/3 for the isotropic 3D Gaussian.
  d = jnp.asarray([[[0.3, 0.0, 0.0]]])
  zero = jnp.zeros((1, 1, 3))
  opt = 0.09 / 3.0
  f = lambda v: float(nll.gaussian_nll(d, zero, jnp.full((1, 1, 1), v)))
  assert f(opt) < f(opt * 2.0) and f(opt) < f(opt * 0.5)


def test_l2_coord_error():
  pred = jnp.zeros((1, 2, 3)).at[0, 1].set(jnp.asarray([3.0, 4.0, 0.0]))
  target = jnp.zeros((1, 2, 3))
  got = float(nll.l2_coord_error(pred, target))
  np.testing.assert_allclose(got, 2.5, rtol=1e-6)  # mean(0, 5)
