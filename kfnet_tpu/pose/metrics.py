"""Pose-evaluation metrics: per-scene median translation (m) / rotation
(deg), matching the reference's DSAC++-protocol eval (SURVEY.md §3.4)."""

from __future__ import annotations

import numpy as np

from kfnet_tpu.core import geometry as geo


def pose_errors(T_est, T_gt):
  """Per-frame (translation m, rotation deg) errors. Accepts (T, 4, 4)."""
  import jax.numpy as jnp
  t = np.asarray(geo.translation_error(jnp.asarray(T_est), jnp.asarray(T_gt)))
  r = np.asarray(geo.rotation_error_deg(jnp.asarray(T_est), jnp.asarray(T_gt)))
  return t, r


def median_errors(T_est, T_gt):
  """(median translation m, median rotation deg) over a sequence."""
  t, r = pose_errors(T_est, T_gt)
  return float(np.median(t)), float(np.median(r))


def accuracy_at(T_est, T_gt, t_thresh_m: float = 0.05,
                r_thresh_deg: float = 5.0) -> float:
  """Fraction of frames within (5cm, 5deg) — the standard 7-Scenes
  accuracy figure reported alongside medians."""
  t, r = pose_errors(T_est, T_gt)
  return float(np.mean((t <= t_thresh_m) & (r <= r_thresh_deg)))


def report(scene: str, T_est, T_gt) -> dict:
  """Structured JSON-able per-scene report (SURVEY.md §5 observability)."""
  med_t, med_r = median_errors(T_est, T_gt)
  return {
      "scene": scene,
      "frames": int(np.asarray(T_est).shape[0]),
      "median_translation_m": med_t,
      "median_rotation_deg": med_r,
      "accuracy_5cm_5deg": accuracy_at(T_est, T_gt),
  }
