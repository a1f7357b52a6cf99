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
  # stage zero-padded input once per grid program
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
