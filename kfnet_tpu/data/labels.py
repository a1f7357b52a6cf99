"""Scene-coordinate label generation (the reference's offline ``tools/``
step — SURVEY.md §2.2 #10): depth + GT pose → 1/8-resolution coordinate
maps + validity masks, plus per-scene normalization statistics.

The reference writes label blobs to disk once per scene and the training
scripts stream them; here labels are generated on the fly by a jitted fn
(CPU or TPU) — at 60x80 the math is ~100µs, cheaper than disk IO — but a
``precompute``/``save``/``load`` path is provided for parity with the
reference workflow and for very large scenes.
"""

from __future__ import annotations

import os
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from kfnet_tpu.core import geometry as geo


def generate(depth: jnp.ndarray, K: jnp.ndarray, T_wc: jnp.ndarray,
             stride: int = 8, min_depth: float = 0.05,
             max_depth: float = 20.0):
  """(H, W) depth + pose → ((h, w, 3) coords, (h, w) valid)."""
  return geo.depth_to_world_coords(
      depth, K, T_wc, stride=stride, min_depth=min_depth,
      max_depth=max_depth)


def scene_statistics(coords_list: Iterable[np.ndarray],
                     valid_list: Iterable[np.ndarray]):
  """Weighted mean / std of valid scene coordinates — used to set
  SCoordNetConfig.coord_offset/scale so the head regresses a zero-mean,
  unit-ish target (the reference bakes the same normalization into its
  label blobs)."""
  total = np.zeros(3, np.float64)
  total_sq = np.zeros(3, np.float64)
  count = 0
  for coords, valid in zip(coords_list, valid_list):
    c = np.asarray(coords).reshape(-1, 3)
    v = np.asarray(valid).reshape(-1).astype(bool)
    c = c[v]
    total += c.sum(0)
    total_sq += (c ** 2).sum(0)
    count += c.shape[0]
  if count == 0:
    # silently returning mean=0 / std=1e-6 would bake a degenerate
    # coord_scale into the net config and its persisted meta — fail loud
    # (mis-set depth_scale or min/max_depth is the usual cause)
    raise ValueError(
        "scene_statistics: no valid label pixels in any sampled frame — "
        "check depth_scale / min_depth / max_depth against the dataset")
  mean = total / count
  var = total_sq / count - mean ** 2
  std = float(np.sqrt(np.maximum(var, 1e-12).mean()))
  return mean.astype(np.float32), std


def save(path: str, coords: np.ndarray, valid: np.ndarray):
  os.makedirs(os.path.dirname(path), exist_ok=True)
  np.savez_compressed(path, coords=np.asarray(coords, np.float32),
                      valid=np.asarray(valid, bool))


def load(path: str):
  with np.load(path) as f:
    return f["coords"], f["valid"]
