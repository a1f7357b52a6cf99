"""OFlowNet — the process system (paper §4.2, Fig. 4; SURVEY.md §2.2 #3,#6).

Scene-agnostic: a shared (siamese) shallow encoder maps each RGB frame to
1/8-resolution features; a local cost volume correlates the current frame
against the previous one; a small U-Net decodes the volume into per-pixel
backward optical flow (2ch) plus a process-noise variance (1ch). Because it
sees only the cost volume (not raw appearance), it trains once per dataset
and transfers across scenes (SURVEY.md §1 item 2).

Flow head: ``flow = radius · tanh(raw)`` keeps the regressed flow inside
the correlation search window (stable + bounded, so the downstream warp's
out-of-bounds mask only triggers at true image borders).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from kfnet_tpu.kernels.cost_volume import cost_volume
from kfnet_tpu.nn import layers as L

LOG_VAR_MIN = -12.0
LOG_VAR_MAX = 12.0


@dataclasses.dataclass(frozen=True)
class OFlowNetConfig:
  encoder_channels: Sequence[int] = (32, 32, 64, 64, 128, 128)
  encoder_strides: Sequence[int] = (2, 1, 2, 1, 2, 1)
  search_radius: int = 4
  unet_channels: Sequence[int] = (128, 128, 256)  # enc0, down1, down2
  compute_dtype: str = "bfloat16"
  norm: str = "group"  # "group" | "none"
  stem_s2d: int = 2  # space-to-depth stem (see scoordnet.py); 1 = off
  conv_impl: str = "xla"  # "xla" | "pallas_3x3" (see scoordnet.py)

  @property
  def dtype(self):
    return jnp.dtype(self.compute_dtype)

  @property
  def cv_channels(self) -> int:
    return (2 * self.search_radius + 1) ** 2


def _encoder(config: OFlowNetConfig) -> L.Layer:
  from kfnet_tpu.models.scoordnet import _adjusted_strides
  strides = _adjusted_strides(config.encoder_strides, config.stem_s2d)
  return L.serial(*[
      L.conv_block(c, 3, s, norm=config.norm, compute_dtype=config.dtype,
                   impl=config.conv_impl)
      for c, s in zip(config.encoder_channels, strides)
  ])


def _decoder_layers(config: OFlowNetConfig):
  c0, c1, c2 = config.unet_channels
  dt = config.dtype
  nm = config.norm
  im = config.conv_impl
  return {
      "enc0": L.serial(
          L.conv_block(c0, 3, 1, norm=nm, compute_dtype=dt, impl=im),
          L.conv_block(c0, 3, 1, norm=nm, compute_dtype=dt, impl=im)),
      "down1": L.serial(
          L.conv_block(c1, 3, 2, norm=nm, compute_dtype=dt, impl=im),
          L.conv_block(c1, 3, 1, norm=nm, compute_dtype=dt, impl=im)),
      "down2": L.serial(
          L.conv_block(c2, 3, 2, norm=nm, compute_dtype=dt, impl=im),
          L.conv_block(c2, 3, 1, norm=nm, compute_dtype=dt, impl=im)),
      "up1": L.conv_transpose(c1, 4, 2, compute_dtype=dt),
      "fuse1": L.conv_block(c1, 3, 1, norm=nm, compute_dtype=dt, impl=im),
      "up0": L.conv_transpose(c0, 4, 2, compute_dtype=dt),
      "fuse0": L.conv_block(c0, 3, 1, norm=nm, compute_dtype=dt, impl=im),
      # f32 head: flow/log-variance need better than bf16 resolution
      "head": L.conv(3, 3, 1, use_bias=True, compute_dtype=jnp.float32),
  }


def init(key: jax.Array, config: OFlowNetConfig,
         image_shape: Tuple[int, int, int] = (480, 640, 3)):
  k_enc, *ks = jax.random.split(key, 9)
  enc = _encoder(config)
  f = config.stem_s2d
  if f > 1:
    h, w, c = image_shape
    image_shape = (h // f, w // f, c * f * f)
  enc_params, feat_shape = enc.init(k_enc, image_shape)
  h, w, _ = feat_shape
  dec = _decoder_layers(config)
  params = {"encoder": enc_params}
  shape = (h, w, config.cv_channels)
  p, s0 = dec["enc0"].init(ks[0], shape)
  params["enc0"] = p
  p, s1 = dec["down1"].init(ks[1], s0)
  params["down1"] = p
  p, s2 = dec["down2"].init(ks[2], s1)
  params["down2"] = p
  p, u1 = dec["up1"].init(ks[3], s2)
  params["up1"] = p
  p, f1 = dec["fuse1"].init(ks[4], (u1[0], u1[1], u1[2] + s1[2]))
  params["fuse1"] = p
  p, u0 = dec["up0"].init(ks[5], f1)
  params["up0"] = p
  p, f0 = dec["fuse0"].init(ks[6], (u0[0], u0[1], u0[2] + s0[2]))
  params["fuse0"] = p
  p, _ = dec["head"].init(ks[7], f0)
  params["head"] = p
  return params


def encode(params, config: OFlowNetConfig, image: jnp.ndarray) -> jnp.ndarray:
  """Shared encoder: (..., H, W, 3) [or pre-s2d form] -> (..., H/8, W/8, C).
  uint8 frames are cast+scaled on device (scoordnet.ingest)."""
  from kfnet_tpu.models.scoordnet import ingest, maybe_space_to_depth
  image = ingest(maybe_space_to_depth(config, image))
  return _encoder(config).apply(params["encoder"], image)


def _crop_to(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
  return x[..., :h, :w, :]


def decode(params, config: OFlowNetConfig, cv: jnp.ndarray):
  """U-Net over the cost volume -> (flow (..., 2), process variance (..., 1))."""
  dec = _decoder_layers(config)
  e0 = dec["enc0"].apply(params["enc0"], cv)
  d1 = dec["down1"].apply(params["down1"], e0)
  d2 = dec["down2"].apply(params["down2"], d1)
  u1 = _crop_to(dec["up1"].apply(params["up1"], d2), *d1.shape[-3:-1])
  f1 = dec["fuse1"].apply(params["fuse1"], jnp.concatenate([u1, d1], -1))
  u0 = _crop_to(dec["up0"].apply(params["up0"], f1), *e0.shape[-3:-1])
  f0 = dec["fuse0"].apply(params["fuse0"], jnp.concatenate([u0, e0], -1))
  out = dec["head"].apply(params["head"], f0).astype(jnp.float32)
  flow = float(config.search_radius) * jnp.tanh(out[..., :2])
  log_var = jnp.clip(out[..., 2:3], LOG_VAR_MIN, LOG_VAR_MAX)
  return flow, jnp.exp(log_var)


def apply(params, config: OFlowNetConfig, image_prev: jnp.ndarray,
          image_cur: jnp.ndarray):
  """Full forward: image pair -> (backward flow, process-noise variance),
  both at 1/8 resolution."""
  f_prev = encode(params, config, image_prev)
  f_cur = encode(params, config, image_cur)
  cv = cost_volume(f_prev, f_cur, config.search_radius)
  return decode(params, config, cv)
