"""Pallas 3x3 conv vs the XLA conv (interpret mode on CPU; compiled
parity re-runs on hardware via tests_tpu/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from kfnet_tpu.kernels.conv3x3 import conv3x3_same
from kfnet_tpu.nn import layers as L


def xla_conv(x, k, b=None, relu=False):
  y = lax.conv_general_dilated(
      x[None].astype(jnp.bfloat16), k.astype(jnp.bfloat16), (1, 1), "SAME",
      dimension_numbers=("NHWC", "HWIO", "NHWC"))[0].astype(jnp.float32)
  if b is not None:
    y = y + b
  if relu:
    y = jnp.maximum(y, 0.0)
  return y


@pytest.mark.parametrize("h,w,cin,cout,bias,relu", [
    (8, 16, 128, 128, True, True),
    (6, 10, 256, 128, False, False),
])
def test_conv3x3_matches_xla(h, w, cin, cout, bias, relu):
  rng = np.random.default_rng(0)
  x = jnp.asarray(rng.normal(size=(h, w, cin)).astype(np.float32)) * 0.1
  k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32)) * .02
  b = (jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
       if bias else None)
  y_ref = np.asarray(xla_conv(x, k, b, relu))
  y_pl = np.asarray(conv3x3_same(x, k, b, relu=relu, out_dtype=jnp.float32,
                                 interpret=True))
  # both paths accumulate bf16 products; tolerance covers ordering.
  np.testing.assert_allclose(y_pl, y_ref, rtol=2e-2, atol=2e-2)


def test_conv_layer_pallas_impl_matches_xla_impl():
  rng = np.random.default_rng(1)
  h, w, cin, cout = 8, 16, 128, 128
  x = jnp.asarray(rng.normal(size=(h, w, cin)).astype(np.float32)) * 0.1
  lay_x = L.conv(cout, 3, 1, use_bias=True, impl="xla")
  lay_p = L.conv(cout, 3, 1, use_bias=True, impl="pallas_3x3")
  params, _ = lay_x.init(jax.random.key(0), (h, w, cin))
  import unittest.mock as mock
  y_x = np.asarray(lay_x.apply(params, x), np.float32)
  # route the pallas impl through interpret mode on CPU
  from kfnet_tpu.kernels import conv3x3 as c3
  orig = c3.conv3x3_same

  def interp(*a, **kw):
    kw["interpret"] = True
    return orig(*a, **kw)

  with mock.patch.object(c3, "conv3x3_same", side_effect=interp):
    y_p = np.asarray(lay_p.apply(params, x), np.float32)
  np.testing.assert_allclose(y_p, y_x, rtol=2e-2, atol=2e-2)


def test_pallas_impl_falls_back_for_ineligible_shapes():
  # cin=12 (not %128) must silently use the XLA path — identical result.
  rng = np.random.default_rng(2)
  x = jnp.asarray(rng.normal(size=(8, 16, 12)).astype(np.float32))
  lay_p = L.conv(64, 3, 1, use_bias=True, impl="pallas_3x3")
  lay_x = L.conv(64, 3, 1, use_bias=True, impl="xla")
  params, _ = lay_p.init(jax.random.key(0), (8, 16, 12))
  np.testing.assert_array_equal(
      np.asarray(lay_p.apply(params, x)), np.asarray(lay_x.apply(params, x)))
