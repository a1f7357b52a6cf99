"""Winograd F(2x2,3x3) conv parity vs the direct XLA conv
(kernels/winograd.py — opt-in conv_impl="winograd")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kfnet_tpu.kernels.winograd import conv3x3_winograd


def direct_conv(x, w, bias=None, dtype=jnp.float32):
  xb = x.reshape((-1,) + x.shape[-3:]).astype(dtype)
  y = jax.lax.conv_general_dilated(
      xb, w.astype(dtype), window_strides=(1, 1), padding="SAME",
      dimension_numbers=("NHWC", "HWIO", "NHWC"))
  if bias is not None:
    y = y.astype(jnp.float32) + bias
  return y.astype(dtype).reshape(x.shape[:-3] + y.shape[1:])


@pytest.mark.parametrize("h,w,cin,cout", [(8, 10, 5, 7), (6, 6, 16, 8),
                                          (60, 80, 8, 8)])
def test_winograd_matches_direct_f32(h, w, cin, cout):
  rng = np.random.default_rng(0)
  x = jnp.asarray(rng.normal(size=(h, w, cin)).astype(np.float32))
  k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32))
  y_ref = direct_conv(x, k)
  y_win = conv3x3_winograd(x, k, compute_dtype=jnp.float32)
  np.testing.assert_allclose(np.asarray(y_win), np.asarray(y_ref),
                             rtol=1e-4, atol=1e-4)


def test_winograd_bias_and_batch_dims():
  rng = np.random.default_rng(1)
  x = jnp.asarray(rng.normal(size=(2, 3, 8, 12, 4)).astype(np.float32))
  k = jnp.asarray(rng.normal(size=(3, 3, 4, 6)).astype(np.float32))
  b = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
  y_ref = direct_conv(x, k, b)
  y_win = conv3x3_winograd(x, k, b, compute_dtype=jnp.float32)
  assert y_win.shape == (2, 3, 8, 12, 6)
  np.testing.assert_allclose(np.asarray(y_win), np.asarray(y_ref),
                             rtol=1e-4, atol=1e-4)


def test_winograd_bf16_close_to_direct_bf16():
  """bf16 compute: Winograd's extra tile adds must stay within a couple
  of bf16 ulps of the direct conv's own rounding."""
  rng = np.random.default_rng(2)
  x = jnp.asarray(rng.normal(size=(12, 16, 32)).astype(np.float32))
  k = jnp.asarray((rng.normal(size=(3, 3, 32, 32)) / 17).astype(np.float32))
  y_ref = np.asarray(direct_conv(x, k, dtype=jnp.bfloat16),
                     dtype=np.float32)
  y_win = np.asarray(conv3x3_winograd(x, k, compute_dtype=jnp.bfloat16),
                     dtype=np.float32)
  scale = np.abs(y_ref).max()
  # ~2x the measured deviation (0.031 at scale 4.28 ≈ 0.7% of scale);
  # the old 5%-of-max band would pass a 6x error inflation (review r2)
  np.testing.assert_allclose(y_win, y_ref, atol=0.015 * scale)


def test_winograd_gradients_match_direct():
  rng = np.random.default_rng(3)
  x = jnp.asarray(rng.normal(size=(6, 8, 4)).astype(np.float32))
  k = jnp.asarray(rng.normal(size=(3, 3, 4, 4)).astype(np.float32))

  def loss_win(k_):
    return jnp.sum(jnp.sin(conv3x3_winograd(x, k_,
                                            compute_dtype=jnp.float32)))

  def loss_dir(k_):
    return jnp.sum(jnp.sin(direct_conv(x, k_)))

  g_win = jax.grad(loss_win)(k)
  g_dir = jax.grad(loss_dir)(k)
  np.testing.assert_allclose(np.asarray(g_win), np.asarray(g_dir),
                             rtol=1e-3, atol=1e-4)


def test_layer_impl_winograd_and_odd_size_fallback():
  """nn.layers.conv(impl="winograd"): even sizes go through Winograd,
  odd sizes silently fall back to the direct conv — same params, same
  output either way."""
  from kfnet_tpu.nn import layers as L

  rng = np.random.default_rng(4)
  for h, w in ((8, 10), (7, 9)):
    lay_w = L.conv(6, 3, 1, use_bias=True, compute_dtype=jnp.float32,
                   impl="winograd")
    lay_x = L.conv(6, 3, 1, use_bias=True, compute_dtype=jnp.float32,
                   impl="xla")
    params, out_shape = lay_w.init(jax.random.key(0), (h, w, 5))
    assert out_shape == (h, w, 6)
    x = jnp.asarray(rng.normal(size=(h, w, 5)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(lay_w.apply(params, x)),
                               np.asarray(lay_x.apply(params, x)),
                               rtol=1e-4, atol=1e-4)


def test_scoordnet_winograd_impl_matches_xla():
  """Model-level parity: the full SCoordNet forward with
  conv_impl="winograd" (f32) matches the XLA path."""
  import dataclasses

  from kfnet_tpu.models import scoordnet
  from tests import tiny_configs as tc

  cfg = dataclasses.replace(tc.tiny_scoordnet(), compute_dtype="float32")
  cfg_w = dataclasses.replace(cfg, conv_impl="winograd")
  params = scoordnet.init(jax.random.key(0), cfg, (48, 64, 3))
  rng = np.random.default_rng(5)
  img = jnp.asarray(rng.uniform(0, 1, (48, 64, 3)).astype(np.float32))
  c_ref, v_ref = scoordnet.apply(params, cfg, img)
  c_win, v_win = scoordnet.apply(params, cfg_w, img)
  np.testing.assert_allclose(np.asarray(c_win), np.asarray(c_ref),
                             rtol=1e-3, atol=1e-4)
  np.testing.assert_allclose(np.asarray(v_win), np.asarray(v_ref),
                             rtol=1e-2, atol=1e-6)
