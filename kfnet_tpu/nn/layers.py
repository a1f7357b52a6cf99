"""Minimal functional NN toolkit (the TPU-native counterpart of the
reference's ``cnn_wrapper/network.py`` — SURVEY.md §2.2 component #1).

The reference uses the caffe-tensorflow ``Network`` base class with
``@layer``-decorated stateful graph-building methods. The TPU-native design
is the opposite: every layer is a pure (init, apply) pair, parameters are
pytrees, and composition is a combinator (``serial``), so whole models jit,
vmap, shard and differentiate as ordinary JAX functions.

TPU-first choices:
  * NHWC layout + HWIO kernels (XLA:TPU's native conv layout).
  * ``compute_dtype`` (default bfloat16 on TPU) for conv inputs/weights with
    float32 accumulation via ``preferred_element_type`` — keeps the MXU fed
    at full rate without fp32 bandwidth.
  * GroupNorm instead of BatchNorm: stateless (no running stats pytree
    plumbing through scan/pjit), batch-size independent, identical math
    under data-parallel sharding without cross-device syncs.
  * Channel counts kept multiples of 128 where it matters so XLA tiles onto
    the 128x128 MXU without padding waste.

Layer protocol: ``layer.init(key, in_shape) -> (params, out_shape)`` and
``layer.apply(params, x) -> y`` where shapes are (H, W, C) *without* the
batch dim (apply fns broadcast over any leading batch dims).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


@dataclasses.dataclass(frozen=True)
class Layer:
  init: Callable  # (key, in_shape) -> (params, out_shape)
  apply: Callable  # (params, x) -> y


def _fan_in_init(key, shape, fan_in, dtype=jnp.float32):
  """He/Kaiming normal — matches the reference family's conv init."""
  std = math.sqrt(2.0 / fan_in)
  return jax.random.normal(key, shape, dtype) * std


def _as_batched(x):
  """Reshape (..., H, W, C) -> (B, H, W, C), returning unflatten info."""
  lead = x.shape[:-3]
  xb = x.reshape((-1,) + x.shape[-3:])
  return xb, lead


def _pallas_conv_eligible(h, w, cin, cout, kernel, stride, dilation,
                          padding):
  """The Pallas 3x3 kernel applies to SAME stride-1 convs whose working
  set fits VMEM (the 1/8-res trunk layers — measured ~21% faster than
  XLA's conv there)."""
  if not (kernel == 3 and stride == 1 and dilation == 1
          and padding == "SAME"):
    return False
  if cin % 128 or cout % 128:
    return False
  pad_bytes = (h + 2) * (w + 2) * cin * 2
  acc_bytes = h * w * 128 * 4
  x_bytes = h * w * cin * 2
  return pad_bytes + acc_bytes + x_bytes < 11 * 1024 * 1024


def standardize_weights(w, gain, eps: float = 1e-8):
  """Scaled weight standardization (the NF-net / WS recipe, adapted to
  this codebase's He init): per OUTPUT channel, re-center and re-scale
  the (K, K, Cin) filter to std sqrt(2/fan_in), times a learnable gain.

  At He init (``_fan_in_init``: N(0, 2/N)) this is a near-identity, so
  training starts with plain-conv dynamics; thereafter the filter's
  direction is the only trainable degree of freedom besides ``gain`` —
  the magnitude/scale drift that free conv weights accumulate (and that
  GroupNorm would have absorbed) is structurally pinned. Pure function
  of the params: under a jitted scan it is loop-invariant (hoisted by
  XLA), and it is O(K²·Cin·Cout) — noise next to the conv itself."""
  n = w.shape[0] * w.shape[1] * w.shape[2]
  mu = w.mean(axis=(0, 1, 2), keepdims=True)
  var = jnp.square(w - mu).mean(axis=(0, 1, 2), keepdims=True)
  return (w - mu) * jax.lax.rsqrt(var * (n / 2.0) + eps) * gain


def conv(out_ch: int,
         kernel: int = 3,
         stride: int = 1,
         dilation: int = 1,
         padding: str = "SAME",
         use_bias: bool = True,
         compute_dtype=jnp.bfloat16,
         impl: str = "xla",
         weight_standardize: bool = False) -> Layer:
  """2D convolution, NHWC/HWIO, fp32 params, bf16 MXU compute.

  impl: "xla" (default; differentiable — training uses this) or
  "pallas_3x3" (inference fast path; falls back to XLA when the layer
  shape is ineligible — see _pallas_conv_eligible).
  weight_standardize: reparameterize the weights through
  ``standardize_weights`` (adds a per-output-channel ``gain`` param)."""

  def init(key, in_shape):
    h, w, c = in_shape
    wshape = (kernel, kernel, c, out_ch)
    params = {"w": _fan_in_init(key, wshape, kernel * kernel * c)}
    if weight_standardize:
      params["gain"] = jnp.ones((out_ch,), jnp.float32)
    if use_bias:
      params["b"] = jnp.zeros((out_ch,), jnp.float32)
    if padding == "SAME":
      oh, ow = -(-h // stride), -(-w // stride)
    else:  # VALID
      eff = dilation * (kernel - 1) + 1
      oh, ow = (h - eff) // stride + 1, (w - eff) // stride + 1
    return params, (oh, ow, out_ch)

  def apply(params, x):
    if weight_standardize:
      params = dict(params,
                    w=standardize_weights(params["w"], params["gain"]))
    if (impl == "pallas_3x3" and x.ndim == 3
        and _pallas_conv_eligible(x.shape[0], x.shape[1], x.shape[2],
                                  out_ch, kernel, stride, dilation,
                                  padding)):
      from kfnet_tpu.kernels.conv3x3 import conv3x3_same
      return conv3x3_same(
          x, params["w"], params.get("b"), relu=False,
          out_dtype=compute_dtype)
    if (impl == "winograd" and kernel == 3 and stride == 1
        and dilation == 1 and padding == "SAME"
        and x.shape[-3] % 2 == 0 and x.shape[-2] % 2 == 0):
      from kfnet_tpu.kernels.winograd import conv3x3_winograd
      return conv3x3_winograd(x, params["w"], params.get("b"),
                              compute_dtype=compute_dtype)
    xb, lead = _as_batched(x)
    # NOTE: no preferred_element_type here — XLA:TPU's MXU accumulates
    # bf16 matmuls in f32 internally regardless, and requesting an f32
    # OUTPUT from bf16 inputs breaks conv's gradient rule (the transpose
    # conv then mixes f32 cotangents with bf16 weights). Output rounds to
    # compute_dtype, which is also what we store.
    y = lax.conv_general_dilated(
        xb.astype(compute_dtype),
        params["w"].astype(compute_dtype),
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if use_bias:
      y = (y.astype(jnp.float32) + params["b"]).astype(compute_dtype)
    return y.reshape(lead + y.shape[1:])

  return Layer(init, apply)


def conv_transpose(out_ch: int,
                   kernel: int = 4,
                   stride: int = 2,
                   use_bias: bool = True,
                   compute_dtype=jnp.bfloat16) -> Layer:
  """2D transposed convolution (the reference's ``deconv`` upsampling)."""

  def init(key, in_shape):
    h, w, c = in_shape
    wshape = (kernel, kernel, c, out_ch)
    params = {"w": _fan_in_init(key, wshape, kernel * kernel * c)}
    if use_bias:
      params["b"] = jnp.zeros((out_ch,), jnp.float32)
    return params, (h * stride, w * stride, out_ch)

  def apply(params, x):
    xb, lead = _as_batched(x)
    y = lax.conv_transpose(
        xb.astype(compute_dtype),
        params["w"].astype(compute_dtype),
        strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if use_bias:
      y = (y.astype(jnp.float32) + params["b"]).astype(compute_dtype)
    return y.reshape(lead + y.shape[1:])

  return Layer(init, apply)


# GroupNorm defaults, shared with kernels/conv3x3.py's fused-trunk
# epilogue (gn_scale_shift): the fused path re-derives the group math
# outside this module, so these MUST be the single source of truth — a
# local literal in either file would let the two parity-locked
# implementations drift.
GN_GROUPS = 32
GN_EPS = 1e-5


def gn_group_count(c: int, groups: int = GN_GROUPS) -> int:
  """Largest divisor of ``c`` not exceeding ``groups`` — THE group-count
  derivation for every GroupNorm in the codebase."""
  g = min(groups, c)
  while c % g:
    g -= 1
  return g


def group_norm(groups: int = GN_GROUPS, eps: float = GN_EPS) -> Layer:
  """GroupNorm over channel groups (stateless BatchNorm replacement)."""

  def init(key, in_shape):
    c = in_shape[-1]
    params = {"scale": jnp.ones((c,), jnp.float32),
              "bias": jnp.zeros((c,), jnp.float32)}
    return params, in_shape

  def apply(params, x):
    c = x.shape[-1]
    g = gn_group_count(c, groups)
    cg = c // g
    in_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    # TPU-friendly formulation: reduce over the SPATIAL axes only (channels
    # stay in the lane dimension — reducing across lanes is what made the
    # naive (h,w,g,cg)-reshape GN eat 46% of the filter step). Per-channel
    # first and second moments, then a tiny (g, cg) group combine, then one
    # elementwise pass with per-channel scale/shift. One-pass E[x²]−E[x]².
    n = x.shape[-3] * x.shape[-2] * cg
    s1 = jnp.sum(x32, axis=(-3, -2))                      # (..., c)
    s2 = jnp.sum(jnp.square(x32), axis=(-3, -2))          # (..., c)
    gs1 = jnp.sum(s1.reshape(s1.shape[:-1] + (g, cg)), axis=-1)
    gs2 = jnp.sum(s2.reshape(s2.shape[:-1] + (g, cg)), axis=-1)
    mean_g = gs1 / n                                      # (..., g)
    var_g = jnp.maximum(gs2 / n - jnp.square(mean_g), 0.0)
    inv_g = lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, cg, axis=-1)              # (..., c)
    inv_c = jnp.repeat(inv_g, cg, axis=-1)
    scale = params["scale"] * inv_c
    shift = params["bias"] - mean_c * scale
    out = x32 * scale[..., None, None, :] + shift[..., None, None, :]
    return out.astype(in_dtype)

  return Layer(init, apply)


def activation(fn: Callable) -> Layer:
  # dtype-preserving: keeps bf16 chains bf16 (relu/elu are exact in bf16)
  return Layer(
      init=lambda key, in_shape: ({}, in_shape),
      apply=lambda params, x: fn(x),
  )


def relu() -> Layer:
  return activation(jax.nn.relu)


def elu() -> Layer:
  return activation(jax.nn.elu)


def max_pool(window: int = 2, stride: int = 2) -> Layer:
  def init(key, in_shape):
    h, w, c = in_shape
    return {}, (-(-h // stride), -(-w // stride), c)

  def apply(params, x):
    xb, lead = _as_batched(x)
    y = lax.reduce_window(
        xb, -jnp.inf, lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="SAME")
    return y.reshape(lead + y.shape[1:])

  return Layer(init, apply)


def avg_pool(window: int = 2, stride: int = 2) -> Layer:
  def init(key, in_shape):
    h, w, c = in_shape
    return {}, (-(-h // stride), -(-w // stride), c)

  def apply(params, x):
    xb, lead = _as_batched(x)
    s = lax.reduce_window(
        xb, 0.0, lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="SAME")
    y = s / float(window * window)
    return y.reshape(lead + y.shape[1:])

  return Layer(init, apply)


def space_to_depth(factor: int = 2) -> Layer:
  """(H, W, C) -> (H/f, W/f, C·f²). A patchify stem: removes the C=3
  full-res conv whose input layout XLA must relayout-copy every step
  (measured ~0.3 ms/step on the filter trace), and moves the stem math to
  a better-shaped conv at lower resolution."""

  def init(key, in_shape):
    h, w, c = in_shape
    assert h % factor == 0 and w % factor == 0
    return {}, (h // factor, w // factor, c * factor * factor)

  def apply(params, x):
    # reshape-transpose-reshape form: measured FASTER than f² strided
    # slices + concat (348 vs 228 fps end-to-end — lane-strided reads
    # force worse relayouts than one blocked transpose).
    lead = x.shape[:-3]
    h, w, c = x.shape[-3:]
    f = factor
    y = x.reshape(lead + (h // f, f, w // f, f, c))
    nd = len(lead)
    perm = tuple(range(nd)) + (nd, nd + 2, nd + 1, nd + 3, nd + 4)
    y = jnp.transpose(y, perm)
    return y.reshape(lead + (h // f, w // f, c * f * f))

  return Layer(init, apply)


def upsample_nearest(factor: int = 2) -> Layer:
  def init(key, in_shape):
    h, w, c = in_shape
    return {}, (h * factor, w * factor, c)

  def apply(params, x):
    x = jnp.repeat(x, factor, axis=-3)
    return jnp.repeat(x, factor, axis=-2)

  return Layer(init, apply)


def serial(*layers: Layer) -> Layer:
  """Sequential composition. Params = list of per-layer params."""

  def init(key, in_shape):
    keys = jax.random.split(key, len(layers))
    params = []
    shape = in_shape
    for k, l in zip(keys, layers):
      p, shape = l.init(k, shape)
      params.append(p)
    return params, shape

  def apply(params, x):
    for p, l in zip(params, layers):
      x = l.apply(p, x)
    return x

  return Layer(init, apply)


def conv_block(out_ch: int, kernel: int = 3, stride: int = 1,
               norm: bool | str = True, act: bool = True,
               compute_dtype=jnp.bfloat16, impl: str = "xla") -> Layer:
  """conv [+ norm] [+ ReLU] — the reference's standard unit.

  norm: "group" / True → GroupNorm; "none" / False → plain conv+bias
  (the reference's caffe-style nets use no normalization); "ws" →
  weight-standardized conv+bias, no activation norm (the normalizer-free
  middle ground: keeps norm="none"'s metric activation scale and its
  inference speed — the reparameterization folds into the weights /
  hoists out of the scan — while pinning the weight-scale drift that
  GroupNorm absorbs; round-4 transfer-stability candidate, DESIGN.md §8).
  """
  use_norm = norm is True or norm == "group"
  ls = [conv(out_ch, kernel, stride, use_bias=not use_norm,
             compute_dtype=compute_dtype, impl=impl,
             weight_standardize=norm == "ws")]
  if use_norm:
    ls.append(group_norm())
  if act:
    ls.append(relu())
  return serial(*ls)


def param_count(params) -> int:
  return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
