"""Uncertainty-weighted negative log-likelihood losses (paper §4.1–4.3;
SURVEY.md §3.1/3.2 loss lines).

All three KFNet training stages minimize the same isotropic-Gaussian NLL,
differing only in which (prediction, variance) pair is plugged in:

  * measurement loss (SCoordNet):   (z, V)        vs GT coords of frame t
  * process loss (OFlowNet):        (warp(y_{t-1}), W) vs GT coords of t
  * posterior loss (joint KFNet):   (x_post, P_post)   vs GT coords of t

With σ² the isotropic variance of a 3D Gaussian, the per-pixel NLL (up to
a constant) is  (3/2)·log σ² + ‖Δ‖²/(2σ²)  ≡  3·log σ + ‖Δ‖²/(2σ²), the
exact form quoted in SURVEY.md §1. Invalid-label pixels are masked out of
the mean.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
  """Mean of x over True-mask entries (broadcasting), safe when mask empty."""
  mask = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
  total = jnp.sum(x * mask)
  count = jnp.sum(mask)
  return total / jnp.maximum(count, 1.0)


def gaussian_nll(pred: jnp.ndarray,
                 target: jnp.ndarray,
                 variance: jnp.ndarray,
                 mask: jnp.ndarray | None = None,
                 eps: float = 1e-12) -> jnp.ndarray:
  """Masked mean isotropic-Gaussian NLL.

  Args:
    pred/target: (..., 3) coordinates.
    variance: (..., 1) isotropic variance σ².
    mask: optional (..., 1) or (...,) validity; None = all valid.
  """
  var = jnp.maximum(variance, eps)
  sq = jnp.sum(jnp.square(pred - target), axis=-1, keepdims=True)
  nll = 1.5 * jnp.log(var) + sq / (2.0 * var)
  if mask is None:
    return jnp.mean(nll)
  if mask.ndim == nll.ndim - 1:
    mask = mask[..., None]
  return masked_mean(nll, mask)


def l2_coord_error(pred: jnp.ndarray, target: jnp.ndarray,
                   mask: jnp.ndarray | None = None) -> jnp.ndarray:
  """Masked mean Euclidean coordinate error (meters) — the monitoring
  metric the reference logs alongside the NLL."""
  err = jnp.linalg.norm(pred - target, axis=-1, keepdims=True)
  if mask is None:
    return jnp.mean(err)
  if mask.ndim == err.ndim - 1:
    mask = mask[..., None]
  return masked_mean(err, mask)
