"""SCoordNet — the measurement system (paper §4.1; SURVEY.md §2.2 #2,#4).

A fully-convolutional net mapping one RGB frame (H, W, 3) to a
1/8-resolution scene-coordinate map (H/8, W/8, 3) plus a per-pixel
isotropic measurement-noise variance (H/8, W/8, 1). ~24M parameters at the
default width, matching the paper's 24.3M scale (vs DSAC++'s 104M).

Head parametrization: the uncertainty channel is a log-variance, clipped
then exponentiated — equivalent to the reference's exp activation but
stable in bf16/fp32 mixed training. Coordinates are emitted in a
scene-normalized frame: ``coords = raw * coord_scale + coord_offset`` with
(offset, scale) taken from the per-scene config (the reference bakes the
same normalization into its label generation).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from kfnet_tpu.nn import layers as L

LOG_VAR_MIN = -12.0
LOG_VAR_MAX = 12.0


@dataclasses.dataclass(frozen=True)
class SCoordNetConfig:
  """Architecture + output-normalization config.

  channels/strides define the trunk: stride-2 layers appear exactly three
  times so the output lands at 1/8 resolution (paper Fig. 3).
  """
  channels: Sequence[int] = (64, 64, 128, 128, 256, 256,
                             512, 512, 512, 512, 512, 512, 512, 512, 512)
  strides: Sequence[int] = (1, 2, 1, 2, 1, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1)
  head_channels: int = 512
  coord_offset: Tuple[float, float, float] = (0.0, 0.0, 0.0)
  coord_scale: float = 1.0
  compute_dtype: str = "bfloat16"
  # "group" | "none" | "ws". "none" is the reference-parity arch (the
  # TF1 net has no normalization); "ws" is the normalizer-free
  # weight-standardized variant (nn/layers.standardize_weights) — same
  # inference graph/speed class as "none", targets its transfer
  # instability. The 12-cell full-size study (DESIGN.md §8,
  # docs/NORM_STUDY*.json) measured it 1.054x faster (442 vs 420 fps)
  # and CI-better on every trained scene×seed cell, but seed-unstable on
  # held-out-scene transfer (one CI-inversion per seed). Default stays
  # "group" (transfer-stable; all shipped flagship weights pin it); for
  # in-domain serving prefer "none" + the CALIBRATION.md §7 point
  # (chi2=2.37, w_scale=2) and artifacts/pretrained_full_nonorm.
  norm: str = "group"
  # space-to-depth stem factor (1 = plain conv stem). With 2, the input is
  # patchified to (H/2, W/2, 12) and one trunk stride-2 is dropped to keep
  # the 1/8 output (the `strides` tuple is adjusted automatically). Kills
  # the C=3 full-res conv's layout-copy overhead: measured 293 -> 340 fps
  # on the full filter. Default on (TPU-first stem; same param count).
  stem_s2d: int = 2
  # "xla" (differentiable; training) | "pallas_3x3" (inference fast path
  # for the VMEM-resident 1/8-res trunk convs; ~21% faster than XLA)
  conv_impl: str = "xla"

  @property
  def dtype(self):
    return jnp.dtype(self.compute_dtype)

  @property
  def total_stride(self) -> int:
    s = 1
    for st in self.strides:
      s *= st
    return s


def _adjusted_strides(strides, stem_s2d):
  """Drop trailing stride-2 layers so stem_s2d × conv strides still = 8."""
  strides = list(strides)
  if stem_s2d > 1:
    to_drop = {2: 1, 4: 2, 8: 3}[stem_s2d]
    for i in range(len(strides) - 1, -1, -1):
      if to_drop == 0:
        break
      if strides[i] == 2:
        strides[i] = 1
        to_drop -= 1
  return strides


def _layer_list(config: SCoordNetConfig) -> list:
  if config.conv_impl == "pallas_fused" and config.norm != "group":
    # The fused trunk's Pallas prologues/epilogues ARE GroupNorm passes
    # (see _apply_fused_trunk); on a normless/ws trunk they would apply
    # normalization the weights were never trained with. Reject at build
    # time — the old inference-time `assert` is stripped under python -O.
    raise ValueError(
        f"conv_impl='pallas_fused' requires norm='group' (got "
        f"norm={config.norm!r}); use conv_impl='xla' or 'pallas_3x3'")
  strides = _adjusted_strides(config.strides, config.stem_s2d)
  impl = "xla" if config.conv_impl == "pallas_fused" else config.conv_impl
  blocks = [
      L.conv_block(c, 3, s, norm=config.norm, compute_dtype=config.dtype,
                   impl=impl)
      for c, s in zip(config.channels, strides)
  ]
  head = [
      L.conv_block(config.head_channels, 3, 1, norm=config.norm,
                   compute_dtype=config.dtype, impl=impl),
      # final 1x1 head in f32: coordinate/log-variance outputs need more
      # than bf16's ~3 significant digits (cheap — 512->4 at 1/8 res).
      L.conv(4, 1, 1, use_bias=True, compute_dtype=jnp.float32),
  ]
  return blocks + head


def build(config: SCoordNetConfig) -> L.Layer:
  """Trunk + 4-channel head as a single serial Layer.

  NOTE: the space-to-depth stem is applied in ``apply`` (outside this
  serial), so callers may pre-transform whole sequences once instead of
  per frame (filter/sequence.py hoists it out of the scan)."""
  return L.serial(*_layer_list(config))


def maybe_space_to_depth(config, image: jnp.ndarray) -> jnp.ndarray:
  """Apply the s2d stem unless the input is already transformed (callers
  like filter/sequence pre-transform whole sequences once; the 12-channel
  input is unambiguous vs raw RGB). Dtype-agnostic (pure layout op):
  uint8 camera frames stay 1 byte/channel through the hoisted stem."""
  f = config.stem_s2d
  if f > 1 and image.shape[-1] == 3:
    return L.space_to_depth(f).apply({}, image)
  return image


def ingest(image: jnp.ndarray) -> jnp.ndarray:
  """Camera-origin ingestion: uint8 frames (0..255) are accepted anywhere
  a float image is, cast+scaled to [0, 1] ON DEVICE (trace-time dtype
  dispatch — zero cost for float inputs). Hosts keep frames uint8
  end-to-end, so the host→device transfer and any HBM-resident stream is
  1 byte/channel instead of 4 — on a bandwidth-bound serving link that is
  a 4x cut of the dominant per-tick cost (the reference fed host images
  every frame, SURVEY.md §3.3; this is the TPU-native equivalent)."""
  if image.dtype == jnp.uint8:
    return image.astype(jnp.float32) * (1.0 / 255.0)
  return image


def init(key: jax.Array, config: SCoordNetConfig,
         image_shape: Tuple[int, int, int] = (480, 640, 3)):
  net = build(config)
  f = config.stem_s2d
  if f > 1:
    h, w, c = image_shape
    image_shape = (h // f, w // f, c * f * f)
  params, out_shape = net.init(key, image_shape)
  assert out_shape[-1] == 4
  return params


def _fused_suffix_start(config: SCoordNetConfig) -> int:
  """First trunk index from which every remaining conv is fused-trunk
  eligible (stride 1, cin/cout multiples of 128) — the 1/8-res 256/512
  stack. Returns len(channels)+1 (= nothing fused) if never eligible."""
  strides = _adjusted_strides(config.strides, config.stem_s2d)
  f = config.stem_s2d
  cins = [3 * f * f if f > 1 else 3] + list(config.channels)
  n = len(config.channels)
  # the fused loop in _apply_fused_trunk ALWAYS includes the head conv
  # block (index n): if that block is ineligible (head_channels or its
  # input not 128-multiples), nothing may fuse — otherwise a
  # pallas_fused config with e.g. head_channels=320 passes init and
  # crashes at inference inside conv3x3_gn_chain's tile assert.
  if config.head_channels % 128 or cins[-1] % 128:
    return n + 1
  start = n + 1
  for i in range(n - 1, -1, -1):
    if strides[i] == 1 and cins[i] % 128 == 0 and cins[i + 1] % 128 == 0:
      start = i
    else:
      break
  return start


def _apply_fused_trunk(params, config: SCoordNetConfig,
                       image: jnp.ndarray) -> jnp.ndarray:
  """Inference fast path (conv_impl="pallas_fused"): XLA prefix, then the
  1/8-res GN trunk as a chain of fused Pallas convs whose prologues apply
  the previous layer's GroupNorm+ReLU and whose epilogues emit the
  moments for the next — zero standalone normalization passes over HBM.
  Numerically equivalent to the serial path (parity-tested)."""
  from kfnet_tpu.kernels.conv3x3 import conv3x3_gn_chain, gn_scale_shift

  assert config.norm == "group", "fused trunk assumes GroupNorm blocks"
  k = _fused_suffix_start(config)
  layers_list = _layer_list(config)
  n_blocks = len(config.channels)

  x = image
  for i in range(k):  # XLA prefix (strided / narrow layers)
    x = layers_list[i].apply(params[i], x)

  h, w = x.shape[-3], x.shape[-2]
  scale = jnp.ones((x.shape[-1],), jnp.float32)
  shift = jnp.zeros((x.shape[-1],), jnp.float32)
  prologue_relu = False  # prefix output is already normalized + relu'd
  s1 = s2 = None
  # fused chocks: trunk blocks k..n-1 plus the head conv block (index n)
  for i in range(k, n_blocks + 1):
    conv_w = params[i][0]["w"]
    y, s1, s2 = conv3x3_gn_chain(x, scale, shift, conv_w,
                                 prologue_relu=prologue_relu)
    gn = params[i][1]
    scale, shift = gn_scale_shift(s1, s2, h * w, gn["scale"], gn["bias"])
    prologue_relu = True
    x = y
  # final normalize + relu (one elementwise pass), then the f32 1x1 head.
  x = jnp.maximum(x.astype(jnp.float32) * scale + shift, 0.0)
  return layers_list[n_blocks + 1].apply(params[n_blocks + 1], x)


def apply(params, config: SCoordNetConfig, image: jnp.ndarray):
  """Forward pass.

  Args:
    image: (..., H, W, 3) in [0, 1] (f32/bf16) or uint8 in [0, 255]
      (cast on device — see ``ingest``), or the pre-space-to-depth'd
      (..., H/f, W/f, 3f²) form of either.

  Returns:
    coords: (..., H/8, W/8, 3) world coordinates.
    variance: (..., H/8, W/8, 1) measurement-noise variance σ² (positive).
  """
  image = ingest(maybe_space_to_depth(config, image))
  if config.conv_impl == "pallas_fused" and image.ndim == 3:
    out = _apply_fused_trunk(params, config, image).astype(jnp.float32)
  else:
    net = build(config)
    out = net.apply(params, image).astype(jnp.float32)
  raw = out[..., :3]
  log_var = jnp.clip(out[..., 3:4], LOG_VAR_MIN, LOG_VAR_MAX)
  offset = jnp.asarray(config.coord_offset, jnp.float32)
  coords = raw * config.coord_scale + offset
  variance = jnp.exp(log_var) * (config.coord_scale ** 2)
  return coords, variance
