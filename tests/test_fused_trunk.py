"""Parity of the fused Pallas GN-trunk (conv_impl="pallas_fused") against
the serial XLA path, interpret mode on CPU."""

import dataclasses
import unittest.mock as mock

import jax
import jax.numpy as jnp
import numpy as np

from kfnet_tpu.kernels import conv3x3 as c3
from kfnet_tpu.models import scoordnet


def small_cfg(conv_impl="xla"):
  # norm pinned explicitly: the fused trunk is a GroupNorm-specific
  # kernel chain (scoordnet._apply_fused_trunk) and must keep its
  # coverage regardless of what the config default is.
  return scoordnet.SCoordNetConfig(
      channels=(128, 128), strides=(1, 1), head_channels=128,
      stem_s2d=1, compute_dtype="bfloat16", conv_impl=conv_impl,
      norm="group")


def test_fused_suffix_start():
  assert scoordnet._fused_suffix_start(small_cfg()) == 1
  # default config: suffix starts where the 1/8-res 128+-channel run begins
  k = scoordnet._fused_suffix_start(scoordnet.SCoordNetConfig())
  strides = scoordnet._adjusted_strides(
      scoordnet.SCoordNetConfig().strides, 2)
  assert all(s == 1 for s in strides[k:])
  assert k <= 4


def test_fused_trunk_rejects_non_group_norm():
  """conv_impl='pallas_fused' with a normless/ws trunk must fail loudly
  at build/init time (the fused chain's prologues ARE GroupNorm passes;
  the old inference-time assert vanished under python -O)."""
  import pytest

  for norm in ("none", "ws"):
    cfg = dataclasses.replace(small_cfg("pallas_fused"), norm=norm)
    with pytest.raises(ValueError, match="pallas_fused"):
      scoordnet.init(jax.random.key(0), cfg, (16, 16, 3))


def test_fused_trunk_matches_serial():
  cfg_x = small_cfg("xla")
  cfg_p = small_cfg("pallas_fused")
  params = scoordnet.init(jax.random.key(0), cfg_x, (16, 16, 3))
  rng = np.random.default_rng(0)
  img = jnp.asarray(rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))

  c_ref, v_ref = scoordnet.apply(params, cfg_x, img)

  orig = c3.conv3x3_gn_chain

  def interp(*a, **kw):
    kw["interpret"] = True
    return orig(*a, **kw)

  with mock.patch.object(c3, "conv3x3_gn_chain", side_effect=interp):
    c_p, v_p = scoordnet.apply(params, cfg_p, img)

  # bf16 trunks with different accumulation orders. Tolerances are ~2-3x
  # the MEASURED deviation on these inputs (coords max |diff| 0.0077,
  # variance max rel 0.57%) — the old 0.05/0.1 bands were 10-25x looser
  # and would have passed a kernel bug inflating error 10x (review r2).
  np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_ref),
                             rtol=0.0, atol=2e-2)
  np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_ref),
                             rtol=2e-2, atol=1e-6)


def test_fused_trunk_batched_falls_back():
  cfg_p = small_cfg("pallas_fused")
  params = scoordnet.init(jax.random.key(0), cfg_p, (16, 16, 3))
  rng = np.random.default_rng(1)
  imgs = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
  # batched input (ndim > 3) must silently use the serial XLA path —
  # pinned by EXACT equality with conv_impl="xla" (review r2: shape +
  # finiteness alone would pass a wrong-but-finite vectorization)
  c, v = scoordnet.apply(params, cfg_p, imgs)
  assert c.shape == (2, 16, 16, 3)  # this tiny config has total stride 1
  cfg_x = small_cfg("xla")
  c_ref, v_ref = scoordnet.apply(params, cfg_x, imgs)
  np.testing.assert_array_equal(np.asarray(c), np.asarray(c_ref))
  np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))


def test_fused_trunk_ineligible_head_falls_back_to_serial():
  """The fused loop always includes the head conv block; a config whose
  head_channels is not a 128-multiple must fuse NOTHING (and still
  produce serial-path numerics) rather than crash inside the Pallas
  chain's tile assert at inference."""
  cfg_x = dataclasses.replace(small_cfg("xla"), head_channels=96)
  cfg_p = dataclasses.replace(small_cfg("pallas_fused"), head_channels=96)
  n = len(cfg_x.channels)
  assert scoordnet._fused_suffix_start(cfg_p) == n + 1  # nothing fuses
  params = scoordnet.init(jax.random.key(1), cfg_x, (16, 16, 3))
  img = jnp.asarray(
      np.random.default_rng(2).uniform(size=(16, 16, 3)).astype(np.float32))
  cx, vx = scoordnet.apply(params, cfg_x, img)
  cp, vp = scoordnet.apply(params, cfg_p, img)
  np.testing.assert_allclose(np.asarray(cp), np.asarray(cx), atol=1e-6)
  np.testing.assert_allclose(np.asarray(vp), np.asarray(vx), rtol=1e-6)
