import jax.numpy as jnp
import numpy as np

from kfnet_tpu.core import warp


def test_zero_flow_identity():
  rng = np.random.default_rng(0)
  img = jnp.asarray(rng.normal(size=(10, 12, 4)).astype(np.float32))
  out, valid = warp.warp_by_flow(img, jnp.zeros((10, 12, 2)))
  assert bool(valid.all())
  np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_integer_flow_is_gather():
  rng = np.random.default_rng(1)
  img = jnp.asarray(rng.normal(size=(8, 9, 3)).astype(np.float32))
  # shift sample position by (+2, +1): out[v,u] = img[v+1, u+2]
  flow = jnp.broadcast_to(jnp.asarray([2.0, 1.0]), (8, 9, 2))
  out, valid = warp.warp_by_flow(img, flow)
  np.testing.assert_allclose(
      np.asarray(out[:7, :7]), np.asarray(img[1:8, 2:9]), atol=1e-6)
  # last row / last two cols out of bounds
  assert not bool(valid[:, 7:].any()) and not bool(valid[7:, :].any())
  np.testing.assert_array_equal(np.asarray(out[:, 7:]), 0.0)


def test_fractional_flow_bilinear():
  # linear ramp image: bilinear sampling must be exact.
  h, w = 6, 7
  g = warp.base_grid(h, w)
  img = (2.0 * g[..., 0:1] + 3.0 * g[..., 1:2])
  flow = jnp.broadcast_to(jnp.asarray([0.5, 0.25]), (h, w, 2))
  out, valid = warp.warp_by_flow(img, flow)
  expect = 2.0 * (g[..., 0:1] + 0.5) + 3.0 * (g[..., 1:2] + 0.25)
  m = np.asarray(valid)[..., 0]
  np.testing.assert_allclose(
      np.asarray(out)[m], np.asarray(expect)[m], rtol=1e-5)


def test_warp_gradients_finite():
  import jax
  rng = np.random.default_rng(2)
  img = jnp.asarray(rng.normal(size=(6, 6, 2)).astype(np.float32))

  def loss(flow):
    out, _ = warp.warp_by_flow(img, flow)
    return jnp.sum(out ** 2)

  g = jax.grad(loss)(jnp.full((6, 6, 2), 0.3))
  assert bool(jnp.isfinite(g).all())
  assert float(jnp.abs(g).sum()) > 0


def test_warp_state_cov_invalid_gets_huge_cov():
  x = jnp.ones((5, 5, 3))
  P = jnp.full((5, 5, 1), 0.2)
  W = jnp.full((5, 5, 1), 0.1)
  flow = jnp.broadcast_to(jnp.asarray([10.0, 0.0]), (5, 5, 2))  # all OOB
  xp, Pp, valid = warp.warp_state_cov(x, P, flow, W)
  assert not bool(valid.any())
  assert bool((Pp >= 1e7).all())


def test_warp_state_cov_adds_process_noise():
  x = jnp.ones((5, 5, 3))
  P = jnp.full((5, 5, 1), 0.2)
  W = jnp.full((5, 5, 1), 0.1)
  xp, Pp, valid = warp.warp_state_cov(x, P, jnp.zeros((5, 5, 2)), W)
  assert bool(valid.all())
  np.testing.assert_allclose(np.asarray(Pp), 0.3, rtol=1e-6)
  np.testing.assert_allclose(np.asarray(xp), 1.0, rtol=1e-6)
