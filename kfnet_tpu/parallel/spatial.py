"""Spatial (pixel-axis) model parallelism for the filter (SURVEY.md §5
long-context row: "Spatial dim can shard over devices — coordinate pixels
are independent through the filter; only OFlowNet's cost-volume window
needs halo exchange"; VERDICT r1 item 7).

Two layers, both verified against the single-device filter on the virtual
8-device CPU mesh (tests/test_spatial_sharding.py):

1. :func:`cost_volume_spatial` — the one op whose stencil crosses shard
   boundaries, written explicitly with ``shard_map`` + ``lax.ppermute``
   halo exchange (radius r ⇒ r-column halo from each neighbor; mesh-edge
   devices receive ppermute's zero fill, which exactly matches the
   unsharded op's zero padding at image borders).

2. :func:`run_filter_spatial` — the WHOLE recursive filter under GSPMD
   with the image width sharded over the mesh: params replicate, every
   conv/shift/warp is partitioned by XLA, which inserts the halo
   exchanges (collective-permutes) itself. This is the TPU-idiomatic
   form — manual shard_map is reserved for the op where we want the
   communication pattern pinned down.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax import lax
try:
  from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
  from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _halo_exchange_w(x: jnp.ndarray, halo: int, axis_name: str,
                     n_shards: int) -> jnp.ndarray:
  """Extend a (..., H, W_local, C) block with ``halo`` columns from each
  mesh neighbor along the sharded W axis. Edge devices get zeros (the
  unsharded op's zero padding). Requires halo >= 1: the negative slice
  below would select the WHOLE block at halo == 0 (callers with a 0-wide
  stencil need no exchange at all)."""
  assert halo >= 1, "halo exchange with an empty halo — skip the call"
  # left halo of shard i = rightmost columns of shard i-1 (send right)
  send_right = [(i, i + 1) for i in range(n_shards - 1)]
  left = lax.ppermute(x[..., -halo:, :], axis_name, perm=send_right)
  # right halo of shard i = leftmost columns of shard i+1 (send left)
  send_left = [(i + 1, i) for i in range(n_shards - 1)]
  right = lax.ppermute(x[..., :halo, :], axis_name, perm=send_left)
  return jnp.concatenate([left, x, right], axis=-2)


def cost_volume_spatial(feat_prev: jnp.ndarray, feat_cur: jnp.ndarray,
                        radius: int, mesh: Mesh,
                        axis_name: str = "data") -> jnp.ndarray:
  """W-sharded local correlation volume ≡ kernels.cost_volume.

  Args:
    feat_prev/feat_cur: (H, W, C), W divisible by the mesh size.

  Returns:
    (H, W, (2r+1)²), sharded along W.
  """
  n = mesh.shape[axis_name]
  r = radius
  shard_w = feat_prev.shape[-2] // n
  if r > shard_w:
    raise ValueError(
        f"cost_volume_spatial needs radius <= W/n_shards: a single-neighbor "
        f"halo of {r} columns cannot be served by {shard_w}-column shards "
        f"(W={feat_prev.shape[-2]}, shards={n}). Use fewer shards or the "
        "GSPMD path (run_filter_spatial), which has no such limit.")

  def local(fp, fc):
    # fp/fc: (H, W/n, C) per-shard blocks
    h, wl, c = fp.shape
    # r == 0 is pointwise self-correlation: no stencil crosses a shard
    # boundary, and _halo_exchange_w's negative slicing would be wrong
    # for an empty halo (x[..., -0:, :] is the whole block).
    fp_ext = _halo_exchange_w(fp, r, axis_name, n) if r > 0 else fp
    # f32 OPERANDS before the product, matching kernels.cost_volume
    # (bf16·bf16 in f32 is exact — the parity contract between the two)
    fp_ext = jnp.pad(fp_ext, [(r, r), (0, 0), (0, 0)]).astype(jnp.float32)
    fc32 = fc.astype(jnp.float32)
    scale = 1.0 / float(c)
    slabs = []
    for dy in range(-r, r + 1):
      for dx in range(-r, r + 1):
        shifted = fp_ext[dy + r:dy + r + h, dx + r:dx + r + wl, :]
        slabs.append(jnp.sum(fc32 * shifted, axis=-1) * scale)
    return jnp.stack(slabs, axis=-1)

  fn = shard_map(local, mesh=mesh,
                 in_specs=(P(None, axis_name, None),) * 2,
                 out_specs=P(None, axis_name, None))
  return fn(feat_prev, feat_cur)


def run_filter_spatial(params, config, images: jnp.ndarray, mesh: Mesh,
                       axis_name: str = "data"):
  """The full recursive filter with the image WIDTH sharded over the mesh
  (GSPMD): one jit, params replicated, activations partitioned; XLA
  inserts conv halo exchanges and turns the cost-volume shifts into
  collective-permutes over ICI.

  Args:
    images: (T, H, W, 3); W divisible by 8 × mesh size (the stride-8 maps
      must also shard evenly).

  Returns:
    (xs, Ps) as in filter.sequence.run_filter, sharded along W.
  """
  from kfnet_tpu.filter import sequence

  if getattr(config, "use_pallas", False):
    # GSPMD cannot spatially partition a custom Pallas kernel — it would
    # fall back to replicating the op (wrong answer for the halo'd warp).
    # The XLA composition partitions correctly; use it under the mesh.
    import dataclasses
    config = dataclasses.replace(config, use_pallas=False)

  img_sharding = NamedSharding(mesh, P(None, None, axis_name, None))
  rep = NamedSharding(mesh, P())
  params = jax.device_put(params, rep)
  images = jax.device_put(images, img_sharding)
  return _spatial_jit(img_sharding, config)(params, images)


@lru_cache(maxsize=None)
def _spatial_jit(img_sharding, config):
  """Per-(sharding, config) cached jit of the W-sharded filter: a fresh
  ``jax.jit`` closure per call would recompile the whole GSPMD-partitioned
  scan on every invocation (the same serving-API hazard the fleet path
  fixed in filter/sequence.py::_fleet_jit). NamedSharding and the frozen
  config are both hashable, so one compile serves all repeat calls."""
  from kfnet_tpu.filter import sequence

  @partial(jax.jit, out_shardings=(img_sharding,) * 2)
  def run(p, im):
    return sequence.run_filter(p, config, im)[:2]

  return run
