"""Fixed-budget batched PnP-RANSAC (SURVEY.md §2.2 native table: the
TPU-native replacement for OpenCV's ``solvePnPRansac``).

Everything is static-shape: confidence-based preselection is a top-k,
hypothesis generation is a vmapped 6-point DLT over a (num_hypotheses, 6)
index tensor, scoring is one (M, N) reprojection-error matrix, and the
winner gets a fixed-iteration LM polish on its soft inlier set. The whole
solve jits (and vmaps over a batch of frames).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from kfnet_tpu.core import geometry as geo
from kfnet_tpu.pose import pnp


@dataclasses.dataclass(frozen=True)
class RansacConfig:
  num_hypotheses: int = 256
  solver: str = "dlt"            # "dlt" (6-pt) | "p3p" (3-pt Grunert; up
                                 # to 4 candidates per sample — survives
                                 # much lower inlier ratios, w³ vs w⁶)
  sample_size: int = 6           # DLT minimal set (p3p uses 3)
  inlier_threshold_px: float = 10.0
  top_k: int = 2048              # confidence preselection (reference picks
                                 # lowest-σ pixels; SURVEY.md §3.4)
  refine_iters: int = 10
  refine_threshold_px: float = 10.0


def select_confident(pixels, coords, variance, valid, k):
  """Top-k lowest-variance valid correspondences (static shape).

  Args:
    pixels: (N, 2); coords: (N, 3); variance: (N,); valid: (N,) bool.

  Returns:
    (pixels_k, coords_k, weight_k) with weight 0 for slots that were
    invalid (when fewer than k valid points exist).
  """
  score = jnp.where(valid, -variance, -jnp.inf)
  _, idx = jax.lax.top_k(score, k)
  w = jnp.take(valid, idx).astype(jnp.float32)
  return jnp.take(pixels, idx, axis=0), jnp.take(coords, idx, axis=0), w


@partial(jax.jit, static_argnames=("config",))
def solve_pnp_ransac(pixels: jnp.ndarray, coords: jnp.ndarray,
                     variance: jnp.ndarray, valid: jnp.ndarray,
                     K: jnp.ndarray, rng: jax.Array,
                     config: RansacConfig = RansacConfig()):
  """Robust pose from per-pixel scene coordinates.

  Args:
    pixels: (N, 2) full-res pixel coordinates of each map cell center.
    coords: (N, 3) predicted world coordinates.
    variance: (N,) predicted variance (confidence = 1/σ²).
    valid: (N,) bool.
    K: (3, 3) intrinsics. rng: PRNG key.

  Returns:
    dict with T_wc (4x4 camera-to-world), inlier_ratio, num_inliers,
    mean_inlier_error_px.
  """
  cfg = config
  k = min(cfg.top_k, pixels.shape[0])
  uv, X, w = select_confident(pixels, coords, variance, valid, k)

  # --- hypothesize: M weighted-random minimal sets over the top-k pool.
  sample_size = 3 if cfg.solver == "p3p" else cfg.sample_size
  logits = jnp.where(w > 0, 0.0, -jnp.inf)
  # All-invalid frame (w all zero): all--inf logits would softmax to NaN
  # and make the sampling itself NaN-driven. Fall back to uniform — the
  # garbage hypotheses stay finite and score num_inliers=0, honoring the
  # degenerate-input contract.
  logits = jnp.where(jnp.any(w > 0), logits, jnp.zeros_like(logits))
  sample = lambda key: jax.random.choice(
      key, k, shape=(sample_size,), replace=False,
      p=jax.nn.softmax(logits))
  keys = jax.random.split(rng, cfg.num_hypotheses)
  idx = jax.vmap(sample)(keys)  # (M, s)

  if cfg.solver == "p3p":
    from kfnet_tpu.pose import p3p as p3p_lib

    def hypothesize(ind):
      return p3p_lib.p3p_grunert(
          jnp.take(uv, ind, 0), jnp.take(X, ind, 0), K)

    Rs4, ts4 = jax.vmap(hypothesize)(idx)   # (M, 4, 3, 3), (M, 4, 3)
    Rs = Rs4.reshape(-1, 3, 3)              # 4M candidates
    ts = ts4.reshape(-1, 3)
  else:
    def hypothesize(ind):
      return pnp.dlt_pnp(jnp.take(uv, ind, 0), jnp.take(X, ind, 0), K)

    Rs, ts = jax.vmap(hypothesize)(idx)

  # --- score: weighted inlier counts on the full pool.
  errs = jax.vmap(lambda R, t: pnp.reprojection_errors(uv, X, K, R, t))(
      Rs, ts)  # (M, N)
  inl = (errs < cfg.inlier_threshold_px).astype(jnp.float32) * w
  scores = jnp.sum(inl, axis=1)
  best = jnp.argmax(scores)
  R0, t0 = Rs[best], ts[best]

  # --- refine: LM on the winner's inliers (soft weights, fixed iters).
  w_in = inl[best]
  R, t = pnp.refine_pnp_lm(uv, X, K, R0, t0, w_in, iters=cfg.refine_iters)
  # re-score after polish with the (possibly tighter) refine threshold
  err_f = pnp.reprojection_errors(uv, X, K, R, t)
  inl_f = (err_f < cfg.refine_threshold_px).astype(jnp.float32) * w
  n_in = jnp.sum(inl_f)
  T_cw = geo.make_pose(R, t)
  return {
      "T_wc": geo.invert_pose(T_cw),
      "num_inliers": n_in,
      "inlier_ratio": n_in / jnp.maximum(jnp.sum(w), 1.0),
      "mean_inlier_error_px":
          jnp.sum(err_f * inl_f) / jnp.maximum(n_in, 1.0),
  }


def solve_pnp_from_maps(coords_map, variance_map, valid_map, K, rng,
                        stride: int = 8,
                        config: RansacConfig = RansacConfig()):
  """Convenience wrapper: (h, w, 3)/(h, w, 1) maps -> pose. Pixel
  coordinates are the stride-cell centers used in label generation."""
  h, w = coords_map.shape[:2]
  grid = geo.cell_center_grid(h, w, stride).reshape(-1, 2)
  return solve_pnp_ransac(
      grid, coords_map.reshape(-1, 3),
      variance_map.reshape(-1), valid_map.reshape(-1),
      K, rng, config)
