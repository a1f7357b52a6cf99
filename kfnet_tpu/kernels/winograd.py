"""Winograd F(2x2, 3x3) convolution as batched MXU matmuls.

The 1/8-res 512-channel 3x3 convs carry ~90% of the filter's FLOPs
(eval/flops.py) and XLA's direct conv runs them at ~49% MXU
(docs/DESIGN.md §6). Winograd F(2x2,3x3) trades 2.25x fewer MACs for
cheap elementwise tile transforms:

    Y = A^T [ (G g G^T) ⊙ (B^T d B) ] A        per 4x4 input tile,

with B/A entries in {0,±1} (pure adds) and G in {0,±1/2}. The channel
contraction in the transform domain is a 16-way *batched matmul*
(tiles x Cin) @ (Cin x Cout) — exactly the shape the MXU wants — so the
op becomes: space-to-depth tiling → VPU adds → dot_general(batch=16) →
VPU adds.

Expressed in pure jnp/lax (no Pallas): XLA fuses the transforms into the
matmul prologue/epilogue, and the form is differentiable, so it is valid
for training too. Opt-in via ``conv_impl="winograd"`` (models/*Config);
parity vs the direct conv is pinned by tests/test_winograd.py.

Numerics: tile transforms are short (≤4-term) sums — done in the compute
dtype (bf16) they add ~1 ulp on top of the direct conv's own bf16
rounding; the channel contraction accumulates in f32 like the direct
path. The weight transform G g G^T runs in f32 on the f32 params (exact:
G's entries are powers of two), then rounds to bf16 once — mirroring the
direct path's single f32→bf16 weight cast.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# A^T for F(2x2, 3x3): output transform (2x4).
_AT = np.asarray([[1, 1, 1, 0],
                  [0, 1, -1, -1]], np.float32)
# G: weight transform (4x3).
_G = np.asarray([[1, 0, 0],
                 [0.5, 0.5, 0.5],
                 [0.5, -0.5, 0.5],
                 [0, 0, 1]], np.float32)


def transform_weights(w: jnp.ndarray, compute_dtype=jnp.bfloat16):
  """(3, 3, Cin, Cout) HWIO kernel → (4, 4, Cin, Cout) Winograd domain.

  Loop-invariant given the params, so under jit the transform is hoisted
  out of any scan over frames (it only depends on weights).
  """
  g = jnp.asarray(_G)
  wt = jnp.einsum("ka,lb,abcd->klcd", g, g, w.astype(jnp.float32))
  return wt.astype(compute_dtype)


def _bt_1d(t: jnp.ndarray, axis: int) -> jnp.ndarray:
  """Apply B^T along a length-4 axis: [d0-d2, d1+d2, d2-d1, d1-d3]."""
  d0, d1, d2, d3 = (lax.index_in_dim(t, i, axis, keepdims=False)
                    for i in range(4))
  return jnp.stack([d0 - d2, d1 + d2, d2 - d1, d1 - d3], axis=axis)


def _at_1d(t: jnp.ndarray, axis: int) -> jnp.ndarray:
  """Apply A^T along a length-4 axis: [m0+m1+m2, m1-m2-m3]."""
  m0, m1, m2, m3 = (lax.index_in_dim(t, i, axis, keepdims=False)
                    for i in range(4))
  return jnp.stack([m0 + m1 + m2, m1 - m2 - m3], axis=axis)


def conv3x3_winograd(x: jnp.ndarray, w: jnp.ndarray,
                     bias: jnp.ndarray | None = None,
                     compute_dtype=jnp.bfloat16) -> jnp.ndarray:
  """SAME stride-1 3x3 conv via Winograd F(2x2,3x3).

  Args:
    x: (..., H, W, Cin) with H, W even.
    w: (3, 3, Cin, Cout) HWIO (f32 params; cast handled internally).

  Returns:
    (..., H, W, Cout) in compute_dtype (f32 bias add like nn.layers.conv).
  """
  lead = x.shape[:-3]
  h, wd, cin = x.shape[-3:]
  assert h % 2 == 0 and wd % 2 == 0, (h, wd)
  th, tw = h // 2, wd // 2
  xb = x.reshape((-1,) + x.shape[-3:]).astype(compute_dtype)
  b = xb.shape[0]

  wt = transform_weights(w, compute_dtype)  # (4, 4, Cin, Cout)

  # SAME padding, then view as non-overlapping 2x2 blocks: a 4x4 input
  # tile at (2i-1, 2j-1) is the 2x2 window of blocks (i..i+1, j..j+1) —
  # so the 16 overlapping strided slices become 4 contiguous slices of
  # the blocked view (the same reshape-transpose trick as
  # nn.layers.space_to_depth, which measured faster than strided reads).
  xp = jnp.pad(xb, ((0, 0), (1, 1), (1, 1), (0, 0)))
  blk = xp.reshape(b, th + 1, 2, tw + 1, 2, cin)
  blk = jnp.transpose(blk, (0, 1, 3, 2, 4, 5))  # (b, th+1, tw+1, 2, 2, C)

  # tiles T[..., a, b_, :] = xp[2i+a, 2j+b_]  → (b, th, tw, 4, 4, C)
  rows = []
  for a in range(4):
    cols = []
    for bb in range(4):
      cols.append(blk[:, a // 2:a // 2 + th, bb // 2:bb // 2 + tw,
                      a % 2, bb % 2, :])
    rows.append(jnp.stack(cols, axis=-2))
  tiles = jnp.stack(rows, axis=-3)  # (b, th, tw, 4, 4, C)

  # input transform B^T d B (adds only), both tile axes
  u = _bt_1d(_bt_1d(tiles, -3), -2)

  # channel contraction: 16-way batched matmul, f32 accumulation. The
  # bf16xbf16->f32 dot is the MXU's native mode; CPU's dot thunk rejects
  # it, so off-TPU the operands upcast instead (CI parity runs on CPU).
  if jnp.dtype(compute_dtype) != jnp.float32 and (
      jax.default_backend() != "tpu"):
    m = jnp.einsum("bhwklc,klcd->bhwkld", u.astype(jnp.float32),
                   wt.astype(jnp.float32))
  else:
    m = jnp.einsum("bhwklc,klcd->bhwkld", u, wt,
                   preferred_element_type=jnp.float32)

  # output transform A^T m A → (b, th, tw, 2, 2, Cout)
  y = _at_1d(_at_1d(m, -3), -2)
  if bias is not None:
    y = y + bias
  y = y.astype(compute_dtype)
  cout = y.shape[-1]
  y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))  # (b, th, 2, tw, 2, Cout)
  y = y.reshape((b, h, wd, cout))
  return y.reshape(lead + (h, wd, cout))
