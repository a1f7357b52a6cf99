"""Weight-standardized conv (nn/layers.standardize_weights, norm="ws").

The round-4 norm verdict (DESIGN.md §8): norm="none" is faster and
CI-better in-domain but seed-unstable on held-out transfer. "ws" is the
normalizer-free candidate that keeps "none"'s inference graph while
structurally pinning weight-scale drift. These tests pin the
reparameterization's defining properties; accuracy/stability is a
trained full-size question (tools/norm_study.py --alt_norm ws).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kfnet_tpu.nn import layers as L


@pytest.fixture(scope="module")
def ws_layer():
  layer = L.conv(8, 3, 1, weight_standardize=True,
                 compute_dtype=jnp.float32)
  params, _ = layer.init(jax.random.key(0), (16, 16, 4))
  x = jax.random.normal(jax.random.key(1), (16, 16, 4))
  return layer, params, x


def test_scale_invariance(ws_layer):
  """The defining property: the output is invariant to any positive
  rescaling of the raw weights (magnitude lives only in `gain`)."""
  layer, params, x = ws_layer
  y = layer.apply(params, x)
  # exact up to the eps=1e-8 variance floor: at w*0.01 the filter
  # variance shrinks 1e4x and eps contributes ~1e-4 relative — bounded,
  # not drift
  for s, rtol in ((5.0, 2e-5), (0.01, 5e-4)):
    ys = layer.apply(dict(params, w=params["w"] * s), x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ys),
                               rtol=rtol, atol=1e-4)


def test_init_statistics_match_plain_conv(ws_layer):
  """At He init, standardization is a near-identity: the ws output's
  scale matches a plain conv's (training starts with plain dynamics)."""
  layer, params, x = ws_layer
  plain = L.conv(8, 3, 1, compute_dtype=jnp.float32)
  pp, _ = plain.init(jax.random.key(0), (16, 16, 4))
  y_ws = np.asarray(layer.apply(params, x))
  y_pl = np.asarray(plain.apply(pp, x))
  assert 0.5 < y_ws.std() / y_pl.std() < 2.0


def test_gain_carries_magnitude(ws_layer):
  layer, params, x = ws_layer
  y = np.asarray(layer.apply(dict(params, b=params["b"] * 0), x))
  y3 = np.asarray(layer.apply(
      dict(params, gain=params["gain"] * 3.0, b=params["b"] * 0), x))
  np.testing.assert_allclose(y3, 3.0 * y, rtol=2e-5, atol=1e-5)


def test_gradients_flow_to_all_params(ws_layer):
  layer, params, x = ws_layer
  g = jax.grad(lambda p: (layer.apply(p, x) ** 2).sum())(params)
  for name in ("w", "gain", "b"):
    assert float(jnp.abs(g[name]).max()) > 0, name


def test_conv_block_ws_param_shape():
  """norm='ws' → weight-standardized conv + bias, NO GroupNorm params."""
  blk = L.conv_block(8, 3, 1, norm="ws", compute_dtype=jnp.float32)
  params, _ = blk.init(jax.random.key(0), (16, 16, 4))
  (conv_params,) = [p for p in params if p]  # serial: [conv, relu-less]
  assert set(conv_params) == {"w", "gain", "b"}


def test_scoordnet_ws_trains_a_step():
  """A tiny SCoordNet with norm='ws' runs forward + one jitted grad step
  with finite results (the full 3-stage protocol path is exercised at
  miniature scale by the ws smoke in the round-4 queue; this is the CI
  guard)."""
  from kfnet_tpu.models import scoordnet
  from kfnet_tpu.train import objectives

  cfg = dataclasses.replace(
      scoordnet.SCoordNetConfig(channels=(8, 8, 16), strides=(1, 2, 2),
                                head_channels=16, compute_dtype="float32"),
      norm="ws")
  params = scoordnet.init(jax.random.key(0), cfg, (16, 16, 3))
  img = jax.random.uniform(jax.random.key(1), (2, 16, 16, 3))
  z, V = jax.jit(lambda p, im: scoordnet.apply(p, cfg, im))(params, img)
  assert np.isfinite(np.asarray(z)).all() and float(jnp.min(V)) > 0
  loss_fn = objectives.scoordnet_objective(cfg)
  coords = jax.random.normal(jax.random.key(2), z.shape)
  valid = jnp.ones(z.shape[:-1], bool)
  batch = {"image": img, "coords": coords, "valid": valid}
  loss, grads = jax.jit(jax.value_and_grad(
      lambda p: loss_fn(p, batch)[0] if isinstance(loss_fn(p, batch), tuple)
      else loss_fn(p, batch)))(params)
  assert np.isfinite(float(loss))
  gmax = max(float(jnp.abs(g).max())
             for g in jax.tree_util.tree_leaves(grads))
  assert np.isfinite(gmax) and gmax > 0
