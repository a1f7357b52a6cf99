"""Pallas 3x3 SAME stride-1 convolution for the 1/8-resolution trunk
layers (the FLOPs hot spot: eight 512x512 convs at 60x80 = ~90 GFLOP of
the ~125 GFLOP frame).

Strategy: the whole (h, w, cin) activation fits VMEM at these sizes
(60x80x512 bf16 = 4.9 MB), so the conv is computed as NINE shifted
matmuls on VMEM-resident data:

    Y = Σ_{dy,dx ∈ 3x3}  shift(X, dy, dx) · W[dy, dx]

Each term is a (h·w, cin) @ (cin, cout_tile) MXU matmul with f32
accumulation; the shift is a static slice of a zero-padded VMEM scratch
(free — no gather, no relayout: flattening (h, w) of a channel-minor
array is a no-op). The grid tiles cout so VMEM holds X + one weight/acc
tile. Optional fused bias + ReLU epilogue.

Used by nn.layers.conv when ``impl="pallas_3x3"`` (opt-in; XLA remains
the default and the numerical reference — parity-tested both ways).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, y_ref, xpad_ref, acc_ref, *,
            h: int, w: int, cin: int, relu: bool, has_bias: bool):
  # stage the zero-padded input ONCE: the x block is grid-invariant
  # (index_map (0,0,0)) and VMEM scratch persists across the sequential
  # cout-tile grid steps, so re-staging per step would rewrite the ~5 MB
  # pad 4x for nothing.
  @pl.when(pl.program_id(0) == 0)
  def _():
    xpad_ref[:, :, :] = jnp.zeros_like(xpad_ref)
    xpad_ref[1:1 + h, 1:1 + w, :] = x_ref[:, :, :]

  ct = y_ref.shape[-1]
  acc_ref[:, :] = jnp.zeros_like(acc_ref)
  for dy in range(3):
    for dx in range(3):
      xs = xpad_ref[dy:dy + h, dx:dx + w, :].reshape(h * w, cin)
      wk = w_ref[dy, dx, :, :]
      acc_ref[:, :] += jnp.dot(xs, wk, preferred_element_type=jnp.float32)
  out = acc_ref[:, :]
  if has_bias:
    out = out + b_ref[0, :]
  if relu:
    out = jnp.maximum(out, 0.0)
  y_ref[:, :, :] = out.reshape(h, w, ct).astype(y_ref.dtype)


def _fused_kernel(x_ref, scale_ref, shift_ref, w_ref, y_ref, s1_ref,
                  s2_ref, xpad_ref, acc_ref, *,
                  h: int, w: int, cin_tile: int, n_cin: int,
                  prologue_relu: bool):
  """conv with GN chain fusion: prologue applies the PREVIOUS layer's
  per-channel normalize (+ReLU) while staging the padded input; epilogue
  emits this layer's raw output plus per-channel (Σy, Σy²) so the next
  layer can normalize in ITS prologue. Keeps the whole GN trunk free of
  standalone normalization passes over HBM.

  Grid = (cout_tiles, cin_tiles): the inner cin loop accumulates into the
  scratch; outputs are written on the last cin step. Tiling cin keeps the
  padded input + accumulator inside the 16 MB VMEM for 512-wide layers.
  """
  j = pl.program_id(1)

  def stage():
    xpad_ref[:, :, :] = jnp.zeros_like(xpad_ref)
    xn = (x_ref[:, :, :].astype(jnp.float32) * scale_ref[0, :]
          + shift_ref[0, :])
    if prologue_relu:
      xn = jnp.maximum(xn, 0.0)
    xpad_ref[1:1 + h, 1:1 + w, :] = xn.astype(jnp.bfloat16)

  if n_cin == 1:
    # single cin tile: the staged block is identical for every cout tile
    # (j is constant 0), so stage once on the first grid step — scratch
    # persists across the sequential steps.
    @pl.when(pl.program_id(0) == 0)
    def _():
      stage()
  else:
    # cin is tiled: each j needs its own block staged (j cycles within
    # every i, so the scratch never holds the right block on entry).
    stage()

  @pl.when(j == 0)
  def _():
    acc_ref[:, :] = jnp.zeros_like(acc_ref)

  for dy in range(3):
    for dx in range(3):
      xs = xpad_ref[dy:dy + h, dx:dx + w, :].reshape(h * w, cin_tile)
      acc_ref[:, :] += jnp.dot(xs, w_ref[dy, dx, :, :],
                               preferred_element_type=jnp.float32)

  @pl.when(j == n_cin - 1)
  def _():
    out = acc_ref[:, :]
    y_ref[:, :, :] = out.reshape(h, w, y_ref.shape[-1]).astype(y_ref.dtype)
    s1_ref[0, :] = jnp.sum(out, axis=0)
    s2_ref[0, :] = jnp.sum(out * out, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("prologue_relu", "cout_tile", "cin_tile", "interpret"))
def conv3x3_gn_chain(x: jnp.ndarray, scale: jnp.ndarray,
                     shift: jnp.ndarray, kernel: jnp.ndarray,
                     prologue_relu: bool = True,
                     cout_tile: int = 128,
                     cin_tile: int = 512,
                     interpret: bool = False):
  """One fused-trunk step: normalize(+ReLU) the raw input with the given
  per-channel (scale, shift), convolve 3x3 SAME, return (raw output bf16,
  Σy per channel, Σy² per channel).

  Chain usage (see models/scoordnet.fused_trunk): the caller turns
  (Σy, Σy², gamma, beta) into the next step's (scale, shift) — a (cout,)
  -sized computation XLA handles between kernels.
  """
  h, w, cin = x.shape
  _, _, _, cout = kernel.shape
  cin_tile = min(cin_tile, cin)
  assert cout % cout_tile == 0 and cin % cin_tile == 0
  n_cin = cin // cin_tile
  grid = (cout // cout_tile, n_cin)
  kern = functools.partial(_fused_kernel, h=h, w=w, cin_tile=cin_tile,
                           n_cin=n_cin, prologue_relu=prologue_relu)
  y, s1, s2 = pl.pallas_call(
      kern,
      grid=grid,
      in_specs=[
          pl.BlockSpec((h, w, cin_tile), lambda i, j: (0, 0, j),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, cin_tile), lambda i, j: (0, j),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, cin_tile), lambda i, j: (0, j),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((3, 3, cin_tile, cout_tile),
                       lambda i, j: (0, 0, j, i),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=(
          pl.BlockSpec((h, w, cout_tile), lambda i, j: (0, 0, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, cout_tile), lambda i, j: (0, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, cout_tile), lambda i, j: (0, i),
                       memory_space=pltpu.VMEM),
      ),
      out_shape=(
          jax.ShapeDtypeStruct((h, w, cout), jnp.bfloat16),
          jax.ShapeDtypeStruct((1, cout), jnp.float32),
          jax.ShapeDtypeStruct((1, cout), jnp.float32),
      ),
      scratch_shapes=[
          pltpu.VMEM((h + 2, w + 2, cin_tile), jnp.bfloat16),
          pltpu.VMEM((h * w, cout_tile), jnp.float32),
      ],
      # the default scoped limit (16M) is ~0.5M short for the 512-wide
      # layers; v5e has headroom above it.
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=24 * 1024 * 1024),
      interpret=interpret,
  )(x.astype(jnp.bfloat16),
    scale.reshape(1, cin).astype(jnp.float32),
    shift.reshape(1, cin).astype(jnp.float32),
    kernel.astype(jnp.bfloat16))
  return y, s1[0], s2[0]


def gn_scale_shift(s1: jnp.ndarray, s2: jnp.ndarray, n_spatial: int,
                   gamma: jnp.ndarray, beta: jnp.ndarray,
                   groups: int | None = None, eps: float | None = None):
  """Turn per-channel conv-output moments into the next prologue's
  per-channel (scale, shift): GroupNorm with affine params folded in.

  groups/eps default to nn.layers' canonical GN constants — the serial
  path this is parity-locked to constructs ``group_norm()`` with
  defaults, so the fused trunk must follow the same source of truth."""
  from kfnet_tpu.nn import layers as L
  groups = L.GN_GROUPS if groups is None else groups
  eps = L.GN_EPS if eps is None else eps
  c = s1.shape[0]
  g = L.gn_group_count(c, groups)
  cg = c // g
  n = n_spatial * cg
  gs1 = jnp.sum(s1.reshape(g, cg), axis=-1)
  gs2 = jnp.sum(s2.reshape(g, cg), axis=-1)
  mean_g = gs1 / n
  var_g = jnp.maximum(gs2 / n - jnp.square(mean_g), 0.0)
  inv_g = jax.lax.rsqrt(var_g + eps)
  mean_c = jnp.repeat(mean_g, cg)
  inv_c = jnp.repeat(inv_g, cg)
  scale = gamma * inv_c
  shift = beta - mean_c * scale
  return scale, shift


@functools.partial(
    jax.jit,
    static_argnames=("relu", "cout_tile", "out_dtype", "interpret"))
def conv3x3_same(x: jnp.ndarray, kernel: jnp.ndarray,
                 bias: jnp.ndarray | None = None,
                 relu: bool = False,
                 cout_tile: int = 128,
                 out_dtype=jnp.bfloat16,
                 interpret: bool = False) -> jnp.ndarray:
  """(h, w, cin) x (3, 3, cin, cout) -> (h, w, cout), SAME, stride 1.

  Inputs are cast to bf16 (f32 accumulation on the MXU); output in
  ``out_dtype``. ``cout`` must be a multiple of ``cout_tile``.
  """
  h, w, cin = x.shape
  _, _, _, cout = kernel.shape
  assert cout % cout_tile == 0, (cout, cout_tile)
  has_bias = bias is not None
  b = (bias if has_bias else jnp.zeros((cout,), jnp.float32))
  b2 = b.reshape(1, cout).astype(jnp.float32)

  grid = (cout // cout_tile,)
  kern = functools.partial(
      _kernel, h=h, w=w, cin=cin, relu=relu, has_bias=has_bias)
  return pl.pallas_call(
      kern,
      grid=grid,
      in_specs=[
          pl.BlockSpec((h, w, cin), lambda i: (0, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((3, 3, cin, cout_tile), lambda i: (0, 0, 0, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, cout_tile), lambda i: (0, i),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((h, w, cout_tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((h, w, cout), out_dtype),
      scratch_shapes=[
          pltpu.VMEM((h + 2, w + 2, cin), jnp.bfloat16),
          pltpu.VMEM((h * w, cout_tile), jnp.float32),
      ],
      interpret=interpret,
  )(x.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16), b2)
