"""Device synchronization for benchmarking.

``jax.block_until_ready`` returns immediately on tunneled backends (the
axon TPU plugin used in this sandbox), making naive timings ~1000x
optimistic. Device streams execute in order, so transferring ONE scalar
derived from the last output drains the entire queue — that is the only
reliable sync. All benchmark/eval timing in this repo goes through
``sync``."""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def _checksum(leaves):
  total = jnp.zeros((), jnp.float32)
  for x in leaves:
    total = total + jnp.sum(jnp.abs(x.astype(jnp.float32)))
  return total


def sync(tree) -> float:
  """Force execution of everything enqueued up to (and including) the
  arrays in ``tree``; returns a checksum scalar (also defeats DCE)."""
  leaves = tuple(x for x in jax.tree_util.tree_leaves(tree)
                 if hasattr(x, "dtype"))
  return float(_checksum(leaves))  # scalar device->host == hard sync
