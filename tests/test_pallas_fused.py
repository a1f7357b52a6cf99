"""Numeric parity: Pallas fused warp+Kalman kernel vs the XLA composition
(SURVEY.md §4 "Numeric"). Runs in Pallas interpret mode on CPU; the same
test re-runs compiled on real TPU via tests/tpu/."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kfnet_tpu.core import kalman, warp
from kfnet_tpu.kernels import fused_filter


def make_inputs(seed=0, h=12, w=16, r=3, oob=False):
  rng = np.random.default_rng(seed)
  x = jnp.asarray(rng.normal(size=(h, w, 3)).astype(np.float32))
  P = jnp.asarray(rng.uniform(0.05, 2.0, (h, w, 1)).astype(np.float32))
  if oob:
    flow = jnp.asarray(rng.uniform(-r, r, (h, w, 2)).astype(np.float32))
  else:
    flow = jnp.asarray(rng.uniform(-1.5, 1.5, (h, w, 2)).astype(np.float32))
  W = jnp.asarray(rng.uniform(0.01, 0.5, (h, w, 1)).astype(np.float32))
  z = x + jnp.asarray(rng.normal(size=(h, w, 3)).astype(np.float32)) * 0.3
  V = jnp.asarray(rng.uniform(0.05, 2.0, (h, w, 1)).astype(np.float32))
  return x, P, flow, W, z, V


def xla_reference(x, P, flow, W, z, V, thr=kalman.CHI2_3DOF_P05,
                  invalid_cov=1e8):
  x_pr, P_pr, _ = warp.warp_state_cov(x, P, flow, W, invalid_cov=invalid_cov)
  return kalman.kalman_update(x_pr, P_pr, z, V, threshold=thr)


@pytest.mark.parametrize("seed,oob,h,w", [
    (0, False, 12, 16),
    (1, True, 12, 16),
    (2, True, 17, 23),   # odd, non-tile-aligned map (Cambridge-like)
])
def test_fused_matches_xla(seed, oob, h, w):
  args = make_inputs(seed=seed, oob=oob, h=h, w=w)
  x_ref, P_ref, c_ref = xla_reference(*args)
  x_k, P_k, c_k = fused_filter.fused_warp_kalman(
      *args, radius=3, interpret=True)
  np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_ref), atol=2e-5)
  np.testing.assert_allclose(np.asarray(P_k), np.asarray(P_ref), rtol=2e-5,
                             atol=1e-6)
  np.testing.assert_array_equal(np.asarray(c_k), np.asarray(c_ref))


def test_fused_zero_flow_reduces_to_plain_kalman():
  x, P, _, W, z, V = make_inputs(seed=3)
  flow = jnp.zeros_like(_)
  x_k, P_k, c_k = fused_filter.fused_warp_kalman(
      x, P, flow, W, z, V, radius=2, interpret=True)
  x_ref, P_ref, c_ref = kalman.kalman_update(x, P + W, z, V)
  np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_ref), atol=2e-5)
  np.testing.assert_allclose(np.asarray(P_k), np.asarray(P_ref), rtol=2e-5)
  np.testing.assert_array_equal(np.asarray(c_k), np.asarray(c_ref))


def test_fused_all_oob_collapses_to_measurement():
  x, P, _, W, z, V = make_inputs(seed=4)
  h, w = x.shape[:2]
  flow = jnp.full((h, w, 2), 50.0)  # far out of bounds after clipping
  x_k, P_k, c_k = fused_filter.fused_warp_kalman(
      x, P, flow, W, z, V, radius=3, interpret=True)
  # everything invalid -> prior cov huge -> posterior == measurement
  np.testing.assert_allclose(np.asarray(x_k), np.asarray(z), atol=1e-4)
  np.testing.assert_allclose(np.asarray(P_k), np.asarray(V), rtol=1e-4)
