"""Bilinear warp (flow-guided resampling) of state / covariance maps.

The reference leans on TF's native bilinear resampler to transport the
previous posterior to the current frame (SURVEY.md §2.2 native table,
§3.2/3.3 call stacks):  x⁻ₜ = warp(x₍ₜ₋₁₎, flow), P⁻ₜ = warp(P₍ₜ₋₁₎) + W.

This is the XLA reference implementation (flat-gather based, fuses well
under jit); ``kernels/fused_filter.py`` provides the Pallas-fused version
and is tested against this one.

Flow convention (backward flow, gather-friendly): ``flow[p]`` is the
displacement from the *current*-frame pixel p to its source location in the
*previous* frame, in (u, v) = (x, y) order at map resolution:

    src = grid + flow,   out[p] = bilinear(prev, src[p]).

Samples falling outside the previous frame are invalid: the warped value is
zero-padded and a validity mask is returned so the filter can fall back to
measurement-only there (same effect as the consistency reset).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def base_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
  """(H, W, 2) grid of (u, v) map-resolution coordinates."""
  u = jnp.arange(width, dtype=dtype)
  v = jnp.arange(height, dtype=dtype)
  uu, vv = jnp.meshgrid(u, v, indexing="xy")
  return jnp.stack([uu, vv], axis=-1)


def bilinear_sample(
    img: jnp.ndarray, pos: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
  """Bilinearly sample ``img`` at continuous positions.

  Args:
    img: (H, W, C) source map.
    pos: (..., 2) sample positions in (u, v) order.

  Returns:
    values: (..., C), zero where invalid.
    valid: (..., 1) bool — True iff the full bilinear footprint lies inside.
  """
  h, w, c = img.shape
  u = pos[..., 0]
  v = pos[..., 1]
  u0 = jnp.floor(u)
  v0 = jnp.floor(v)
  du = u - u0
  dv = v - v0

  # Valid iff the sample point lies in the image domain [0, w-1]x[0, h-1]
  # (inclusive): at u == w-1 exactly the x1 corner has zero weight, so the
  # clipped gather is still exact — identity warp is valid everywhere.
  valid = (u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1)

  x0 = jnp.clip(u0.astype(jnp.int32), 0, w - 1)
  x1 = jnp.clip(x0 + 1, 0, w - 1)
  y0 = jnp.clip(v0.astype(jnp.int32), 0, h - 1)
  y1 = jnp.clip(y0 + 1, 0, h - 1)

  flat = img.reshape(h * w, c)
  def gather(yy, xx):
    return jnp.take(flat, yy * w + xx, axis=0)

  w00 = ((1 - du) * (1 - dv))[..., None]
  w01 = (du * (1 - dv))[..., None]
  w10 = ((1 - du) * dv)[..., None]
  w11 = (du * dv)[..., None]
  out = (w00 * gather(y0, x0) + w01 * gather(y0, x1) +
         w10 * gather(y1, x0) + w11 * gather(y1, x1))
  out = jnp.where(valid[..., None], out, 0.0)
  return out, valid[..., None]


def warp_by_flow(
    prev: jnp.ndarray, flow: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
  """Warp a previous-frame map to the current frame by backward flow.

  Args:
    prev: (H, W, C) previous-frame map (state, covariance, or both).
    flow: (H, W, 2) backward flow in (u, v) order.

  Returns:
    warped: (H, W, C), zero where the source sample is out of bounds.
    valid: (H, W, 1) bool mask.
  """
  h, w, _ = prev.shape
  pos = base_grid(h, w, dtype=flow.dtype) + flow
  return bilinear_sample(prev, pos)


def warp_state_cov(
    x_prev: jnp.ndarray,
    P_prev: jnp.ndarray,
    flow: jnp.ndarray,
    W_noise: jnp.ndarray,
    invalid_cov: float = 1e8,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
  """Transport (x, P) to the current frame:  x⁻ = warp(x);  P⁻ = warp(P) + W.

  Out-of-bounds pixels get ``invalid_cov`` so the Kalman gain → 1 there and
  the posterior collapses to the measurement (first-frame behaviour).

  Args:
    x_prev: (H, W, 3); P_prev: (H, W, 1); flow: (H, W, 2); W_noise: (H, W, 1).

  Returns:
    x_prior (H, W, 3), P_prior (H, W, 1), valid (H, W, 1) bool.
  """
  joint = jnp.concatenate([x_prev, P_prev], axis=-1)
  warped, valid = warp_by_flow(joint, flow)
  x_prior = warped[..., :3]
  P_prior = warped[..., 3:4] + W_noise
  P_prior = jnp.where(valid, P_prior, invalid_cov)
  return x_prior, P_prior, valid
