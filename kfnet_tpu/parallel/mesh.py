"""Device mesh + GSPMD sharding helpers (SURVEY.md §2.2 parallelism
checklist: DP is first-class in the rebuild; the reference is single-GPU
with no comm backend at all).

One logical axis, ``data``: batches (multi-scene training, BASELINE.json
config 5) shard over it; parameters replicate. Gradient all-reduce is
inserted by GSPMD as a psum over ICI — no hand-written collectives.
TP/PP/EP are N/A for this model family (largest layer is a 512-channel
3x3 conv that fits one chip; documented out of scope in SURVEY.md §2.2);
the temporal axis ("sequence parallelism" analog) stays sequential because
the Kalman recursion is order-dependent (SURVEY.md §5).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None,
              axis_name: str = "data") -> Mesh:
  devices = jax.devices()
  n = len(devices) if num_devices is None else num_devices
  if not 1 <= n <= len(devices):
    raise ValueError(
        f"make_mesh(num_devices={num_devices}): need 1..{len(devices)} "
        f"(visible devices: {len(devices)})")
  return Mesh(np.asarray(devices[:n]).reshape(n), (axis_name,))


def default_mesh(batch_size: int) -> Mesh | None:
  """Data mesh over as many devices as divide the batch; None if only one
  device would participate (single-device training, no sharding)."""
  n = len(jax.devices())
  while n > 1 and batch_size % n:
    n -= 1
  return make_mesh(n) if n > 1 else None


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
  """Leading-axis (batch) sharding for input batches."""
  return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
  """Place a host batch onto the mesh, sharded along axis 0."""
  sh = batch_sharding(mesh, axis_name)
  return jax.tree_util.tree_map(
      lambda x: jax.device_put(x, sh), batch)


def replicate_tree(mesh: Mesh, tree):
  sh = replicated(mesh)
  return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
