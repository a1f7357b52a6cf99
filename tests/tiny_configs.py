"""Tiny model configs + fixtures shared by the CPU test suite."""

import jax
import jax.numpy as jnp
import numpy as np

from kfnet_tpu.models import kfnet, oflownet, scoordnet

IMG = (48, 64, 3)  # tiny frame; 1/8 res = (6, 8)


def tiny_scoordnet():
  return scoordnet.SCoordNetConfig(
      channels=(8, 8, 16, 16, 16, 16),
      strides=(1, 2, 1, 2, 1, 2),
      head_channels=16,
      compute_dtype="float32",
  )


def tiny_oflownet(radius=2):
  return oflownet.OFlowNetConfig(
      encoder_channels=(8, 8, 16),
      encoder_strides=(2, 2, 2),
      search_radius=radius,
      unet_channels=(8, 8, 16),
      compute_dtype="float32",
  )


def tiny_kfnet(**kw):
  return kfnet.KFNetConfig(
      scoordnet=tiny_scoordnet(), oflownet=tiny_oflownet(), **kw)


def random_images(n, seed=0, shape=IMG):
  rng = np.random.default_rng(seed)
  return jnp.asarray(rng.uniform(0, 1, (n,) + shape).astype(np.float32))
