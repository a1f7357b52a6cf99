"""Cost-volume construction for OFlowNet (paper §4.2; SURVEY.md §2.2 #3).

Correlates current-frame features against previous-frame features over a
local search window at 1/8 resolution. The reference expressed this as TF
ops executed by cuDNN; here it is a static unrolled set of shifted
elementwise mul-reduces, which XLA fuses into a handful of VPU loops —
each shift is a (H, W, C) product + channel reduce, no gather, no dynamic
shapes. (SURVEY.md flags a Pallas promotion if HBM-bound; at 60x80x128 the
whole problem fits VMEM so XLA fusion already runs at bandwidth.)

Convention: ``cv[..., k]`` for k = (dy+r)·(2r+1) + (dx+r) is the normalized
correlation between feat_cur at p and feat_prev at p + (dx, dy). A peak at
offset d therefore directly gives the *backward* flow used by
``core.warp`` (src = dst + flow).
"""

from __future__ import annotations

import jax.numpy as jnp


def cost_volume(feat_prev: jnp.ndarray, feat_cur: jnp.ndarray,
                radius: int = 4) -> jnp.ndarray:
  """Local correlation volume.

  Args:
    feat_prev: (..., H, W, C) previous-frame features.
    feat_cur: (..., H, W, C) current-frame features.
    radius: search radius r; window is (2r+1)².

  Returns:
    (..., H, W, (2r+1)²) normalized correlations (zero where the shifted
    window falls outside the previous frame).
  """
  h, w, c = feat_prev.shape[-3:]
  r = radius
  pad = [(0, 0)] * (feat_prev.ndim - 3) + [(r, r), (r, r), (0, 0)]
  # cast the OPERANDS to f32, not the product: bf16·bf16 evaluated in f32
  # is exact (8-bit mantissas), which is the MXU's own multiply-in-full/
  # accumulate-in-f32 semantics — computing the product in bf16 first
  # would round every term (~0.4% each) before the "f32 accumulation"
  # the docstring promises. XLA fuses the casts; no extra HBM traffic.
  prev_p = jnp.pad(feat_prev, pad).astype(jnp.float32)
  cur32 = feat_cur.astype(jnp.float32)
  scale = 1.0 / float(c)
  slabs = []
  for dy in range(-r, r + 1):
    for dx in range(-r, r + 1):
      shifted = prev_p[..., dy + r:dy + r + h, dx + r:dx + r + w, :]
      slabs.append(jnp.sum(cur32 * shifted, axis=-1) * scale)
  return jnp.stack(slabs, axis=-1)


def window_offsets(radius: int) -> jnp.ndarray:
  """((2r+1)², 2) table of (dx, dy) offsets matching cost_volume's channel
  order — used for soft-argmax flow initialization and tests."""
  r = radius
  offs = [(float(dx), float(dy))
          for dy in range(-r, r + 1) for dx in range(-r, r + 1)]
  return jnp.asarray(offs, jnp.float32)


def soft_argmax_flow(cv: jnp.ndarray, radius: int,
                     temperature: float = 1.0) -> jnp.ndarray:
  """Differentiable expected offset under softmax(cv) — (..., H, W, 2)."""
  import jax
  probs = jax.nn.softmax(cv / temperature, axis=-1)
  return probs @ window_offsets(radius)
