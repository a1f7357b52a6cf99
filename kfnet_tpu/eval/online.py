"""Online (streaming) relocalization — the production serving surface.

The reference's ``KFNet/eval.py`` python loop IS its online mode: one
frame in, one pose out, state carried between calls (SURVEY.md §3.3).
This class is that loop as a product API: jitted step with donated state
(the carry never re-allocates in HBM), optional per-frame PnP solve, and
automatic filter reset via the consistency mechanism on tracking loss.

    reloc = OnlineRelocalizer(params, config, K)
    for frame in camera:
        pose, info = reloc.process(frame)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from kfnet_tpu.models import kfnet
from kfnet_tpu.pose import ransac
from kfnet_tpu.pose import smoothing


class OnlineRelocalizer:
  """Carries (x, P, features) across frames; one jitted step per frame."""

  def __init__(self, params, config: kfnet.KFNetConfig, K,
               ransac_config: ransac.RansacConfig | None = None,
               stride: int = 8, solve_pose: bool = True,
               seed: int = 0,
               smoother: smoothing.SmootherConfig | None = None):
    self._params = params
    self._config = config
    self._K = jnp.asarray(K)
    self._rcfg = ransac_config or ransac.RansacConfig()
    self._stride = stride
    self._solve = solve_pose
    self._carry = None
    self._rng = jax.random.key(seed)
    self._frames = 0
    # optional gated pose-space smoothing of the solved trajectory
    # (pose/smoothing.py; host-side, O(1) state, reset with the filter)
    self._smoother = (smoothing.PoseSmoother(smoother)
                      if smoother is not None else None)

    # One jitted dispatch and ONE small device->host transfer per frame:
    # the filter step, the RNG advance, and the PnP solve fuse into a
    # single tick returning (carry, rng, packed) where packed stacks
    # [consistent_frac, T_wc(16), num_inliers, inlier_ratio].  Separate
    # step/split/pose dispatches plus per-field np.asarray downloads cost
    # one host sync round trip EACH — on a remote/tunneled device that
    # multiplies tick latency several-fold for zero compute.
    cfg = config
    K_dev, rcfg, do_solve = self._K, self._rcfg, solve_pose

    def _solve_packed(x, P, rng):
      rng, key = jax.random.split(rng)
      out = ransac.solve_pnp_from_maps(
          x, P, jnp.ones_like(P, dtype=bool), K_dev, key,
          stride=stride, config=rcfg)
      return rng, jnp.concatenate([
          out["T_wc"].reshape(16).astype(jnp.float32),
          jnp.asarray(out["num_inliers"], jnp.float32).reshape(1),
          jnp.asarray(out["inlier_ratio"], jnp.float32).reshape(1)])

    @partial(jax.jit, donate_argnums=(2,))
    def _first(params, image, rng):
      carry = kfnet.first_step(params, cfg, image)
      frac = jnp.zeros((1,), jnp.float32)  # first frame: fresh everywhere
      if do_solve:
        rng, packed = _solve_packed(carry[0], carry[1], rng)
        return carry, rng, jnp.concatenate([frac, packed])
      return carry, rng, frac

    @partial(jax.jit, donate_argnums=(1, 3))
    def _step(params, carry, image, rng):
      x, P, feat = carry
      x1, P1, feat1, aux = kfnet.filter_step(params, cfg, x, P, feat, image)
      frac = jnp.mean(aux["consistent"].astype(jnp.float32)).reshape(1)
      carry1 = (x1, P1, feat1)
      if do_solve:
        rng, packed = _solve_packed(x1, P1, rng)
        return carry1, rng, jnp.concatenate([frac, packed])
      return carry1, rng, frac

    self._first_fn = _first
    self._step_fn = _step

  def reset(self):
    """Drop the temporal state (scene change / tracking restart)."""
    self._carry = None
    if self._smoother is not None:
      self._smoother.reset()

  def process(self, image) -> tuple[np.ndarray | None, dict]:
    """Feed one (H, W, 3) frame; returns (T_wc 4x4 or None, info dict).

    Camera-origin uint8 frames are first-class: they upload 1
    byte/channel (4x less wire than f32 — the dominant per-tick cost on
    a bandwidth-bound link) and are cast to [0, 1] on device
    (models/scoordnet.ingest). f32 frames in [0, 1] work unchanged.

    info: consistent_frac (filter health; ~0 means the prior was rejected
    everywhere, e.g. after a cut), num_inliers / inlier_ratio when pose
    solving is enabled.
    """
    image = jnp.asarray(image)
    info: dict = {"frame": self._frames}
    if self._carry is None:
      self._carry, self._rng, packed = self._first_fn(
          self._params, image, self._rng)
    else:
      self._carry, self._rng, packed = self._step_fn(
          self._params, self._carry, image, self._rng)
    self._frames += 1
    packed = np.asarray(packed)  # the tick's single host sync
    info["consistent_frac"] = float(packed[0])
    if not self._solve:
      return None, info
    pose = packed[1:17].reshape(4, 4)
    info["num_inliers"] = float(packed[17])
    info["inlier_ratio"] = float(packed[18])
    if self._smoother is not None:
      pose = self._smoother.update(pose)
    return pose, info

  @property
  def state(self):
    """Current (x, P, features) carry (device arrays).

    This is a LIVE, DONATED view: the next ``process()`` call donates
    these buffers to the jitted step, after which any array obtained here
    is deleted (uses raise a deleted-buffer error). Snapshot with
    ``jax.tree_util.tree_map(jnp.copy, reloc.state)`` if you need the
    state past the next frame.
    """
    return self._carry


class FleetRelocalizer:
  """B camera sessions filtered in lockstep — the multi-stream serving
  surface (one jitted, vmapped step per tick; state donated in HBM).

  Sessions join/leave via per-slot reset: a reset slot's frame is treated
  as its sequence's first frame (posterior = measurement, exactly
  ``kfnet.first_step`` semantics — the χ²-reset fallback formalized as an
  input). With ``mesh`` given, slots shard over the devices like
  :func:`kfnet_tpu.filter.sequence.run_filter_fleet` — streams never
  interact, so the step has zero collectives and scales linearly.

      fleet = FleetRelocalizer(params, config, K, batch_size=8)
      poses, info = fleet.process(frames)            # (B, H, W, 3)
      poses, info = fleet.process(frames, reset=[False]*7 + [True])

  ``pipeline_depth=d`` (default 0) double-buffers the tick: ``process``
  dispatches frame t and returns the results of frame t−d, so the host's
  result download overlaps the device's compute instead of serializing
  with it. Steady-state throughput becomes max(compute, download) rather
  than compute + round trip — on a remote/tunneled device that round
  trip dominates the tick (tools/profile_tick.py) and pipelining hides
  it entirely, at the cost of d ticks of result latency. The first d
  calls return ``(None, {"pending": True, ...})``; ``flush()`` drains
  the tail when the stream ends.
  """

  def __init__(self, params, config: kfnet.KFNetConfig, K,
               batch_size: int,
               ransac_config: ransac.RansacConfig | None = None,
               stride: int = 8, solve_pose: bool = True,
               seed: int = 0, mesh=None, axis_name: str = "data",
               smoother: smoothing.SmootherConfig | None = None,
               pipeline_depth: int = 0):
    self._params = params
    self._B = batch_size
    # independent per-slot pose smoothers (streams never interact)
    self._smoothers = (None if smoother is None else
                       [smoothing.PoseSmoother(smoother)
                        for _ in range(batch_size)])
    self._K = jnp.asarray(K)
    self._rcfg = ransac_config or ransac.RansacConfig()
    self._stride = stride
    self._solve = solve_pose
    self._carry = None
    self._rng = jax.random.key(seed)
    self._ticks = 0
    if pipeline_depth < 0:
      raise ValueError(f"pipeline_depth must be >= 0, got {pipeline_depth}")
    self._depth = pipeline_depth
    self._pending: list = []  # [(tick_idx, packed_dev, reset_mask)]
    self._slot_sh = None
    if mesh is not None:
      from jax.sharding import NamedSharding, PartitionSpec as P
      if batch_size % mesh.devices.size:
        raise ValueError(f"batch_size {batch_size} must be divisible by "
                         f"mesh size {mesh.devices.size}")
      self._slot_sh = NamedSharding(mesh, P(axis_name))
      self._params = jax.device_put(params, NamedSharding(mesh, P()))

    # Single-dispatch tick (same rationale as OnlineRelocalizer): filter
    # step + RNG advance + per-slot PnP in one jitted call, all small
    # outputs packed into one (B, 19) f32 array so a tick costs exactly
    # one dispatch and one device->host transfer.
    cfg = config
    B = batch_size
    K_dev, rcfg, do_solve = self._K, self._rcfg, solve_pose
    # cached all-False reset mask: the common reset=None tick uploads
    # nothing to the device
    self._zero_mask = self._put(np.zeros(B, bool))

    slot_sh = self._slot_sh

    def _solve_packed(x, P, rng):
      rng, sub = jax.random.split(rng)
      keys = jax.random.split(sub, B)
      if slot_sh is not None:
        # pin the per-slot keys to the slot sharding: generated inside the
        # jitted step, their layout is otherwise left to the GSPMD
        # partitioner, which may replicate and reshard them every tick
        keys = jax.lax.with_sharding_constraint(keys, slot_sh)
      out = jax.vmap(
          lambda c, Pc, k: ransac.solve_pnp_from_maps(
              c, Pc, jnp.ones_like(Pc, dtype=bool), K_dev, k,
              stride=stride, config=rcfg))(x, P, keys)
      return rng, jnp.concatenate([
          out["T_wc"].reshape(B, 16).astype(jnp.float32),
          # num_inliers rides the packed f32 download; f32 is integer-exact
          # only to 2^24 — safe for any plausible grid (stride-8 @ 640x480
          # = 4800 candidates) but a bound to respect if grids ever grow
          jnp.asarray(out["num_inliers"], jnp.float32)[:, None],
          jnp.asarray(out["inlier_ratio"], jnp.float32)[:, None]], axis=1)

    @partial(jax.jit, donate_argnums=(2,))
    def _first(params, images, rng):
      carry = jax.vmap(lambda im: kfnet.first_step(params, cfg, im))(images)
      frac = jnp.zeros((B, 1), jnp.float32)  # first tick: every slot fresh
      if do_solve:
        rng, packed = _solve_packed(carry[0], carry[1], rng)
        return carry, rng, jnp.concatenate([frac, packed], axis=1)
      return carry, rng, frac

    @partial(jax.jit, donate_argnums=(1, 4))
    def _step(params, carry, images, reset, rng):
      x, P, feat = carry
      x1, P1, feat1, aux = jax.vmap(
          lambda x, P, f, im: kfnet.filter_step(params, cfg, x, P, f, im))(
              x, P, feat, images)
      m = reset[:, None, None, None]
      x1 = jnp.where(m, aux["z"], x1)
      P1 = jnp.where(m, aux["V"], P1)
      frac = jnp.where(
          reset, 0.0,
          jnp.mean(aux["consistent"].astype(jnp.float32), axis=(1, 2, 3)))
      carry1 = (x1, P1, feat1)
      if do_solve:
        rng, packed = _solve_packed(x1, P1, rng)
        return carry1, rng, jnp.concatenate([frac[:, None], packed], axis=1)
      return carry1, rng, frac[:, None]

    self._first_fn = _first
    self._step_fn = _step

  def reset(self):
    """Drop ALL slots' temporal state (per-slot resets go through
    ``process(..., reset=mask)``). In-flight pipelined results are
    discarded — ``flush()`` first to retrieve them."""
    self._carry = None
    self._pending.clear()
    if self._smoothers is not None:
      for sm in self._smoothers:
        sm.reset()

  def _put(self, x):
    """One sharded transfer for host inputs (device_put straight to the
    slot sharding — never jnp.asarray first, which would commit the whole
    tick to device 0 and reshard); no-op placement without a mesh."""
    if self._slot_sh is not None:
      return jax.device_put(x, self._slot_sh)
    return x if isinstance(x, jax.Array) else jnp.asarray(x)

  def process(self, images, reset=None):
    """Feed one (B, H, W, 3) tick; returns (poses (B, 4, 4) or None, info).

    uint8 frames are first-class (uploaded 1 byte/channel, cast to
    [0, 1] on device — see ``OnlineRelocalizer.process``).

    Args:
      reset: optional (B,) bool mask — True slots start a new session at
        this frame (their posterior = this frame's measurement). On the
        FIRST tick every slot starts fresh by construction, so the mask is
        ignored there (reset=False cannot mean "continue" when no prior
        state exists).

    info: per-slot arrays — consistent_frac (B,), and num_inliers /
    inlier_ratio (B,) when pose solving is enabled.

    With ``pipeline_depth=d > 0`` the returned results are those of tick
    t−d (``info["tick"]`` says which); the first d calls return
    ``(None, {"pending": True, ...})`` while the pipeline fills.
    """
    images = self._put(np.asarray(images) if not isinstance(images, jax.Array)
                       else images)
    if images.shape[0] != self._B:
      raise ValueError(f"expected batch {self._B}, got {images.shape[0]}")
    tick = self._ticks
    mask = None
    if self._carry is None:
      self._carry, self._rng, packed = self._first_fn(
          self._params, images, self._rng)
    else:
      if reset is None:
        mask_dev = self._zero_mask
      else:
        mask = np.asarray(reset, bool)
        mask_dev = self._put(mask)
      self._carry, self._rng, packed = self._step_fn(
          self._params, self._carry, images, mask_dev, self._rng)
    self._ticks += 1
    # the sync of an older tick's packed result below overlaps with the
    # device compute of the step just dispatched (pipeline_depth > 0)
    self._pending.append((tick, packed, mask))
    if len(self._pending) <= self._depth:
      return None, {"tick": tick, "pending": True, "lag": self._depth}
    return self._finalize(*self._pending.pop(0))

  def flush(self):
    """Drain in-flight pipelined ticks -> list of (poses, info), oldest
    first (empty when ``pipeline_depth=0`` or nothing is pending)."""
    out = [self._finalize(*entry) for entry in self._pending]
    self._pending.clear()
    return out

  def _finalize(self, tick, packed, mask):
    packed = np.asarray(packed)  # the tick's single host sync
    info: dict = {"tick": tick}
    # a slot's smoother restarts at the tick whose frame carried the
    # reset — applied here so pipelined results stay order-consistent
    if mask is not None and self._smoothers is not None:
      for b in np.flatnonzero(mask):
        self._smoothers[b].reset()
    info["consistent_frac"] = np.ascontiguousarray(packed[:, 0])
    if not self._solve:
      return None, info
    poses = packed[:, 1:17].reshape(self._B, 4, 4)
    info["num_inliers"] = np.ascontiguousarray(packed[:, 17])
    info["inlier_ratio"] = np.ascontiguousarray(packed[:, 18])
    if self._smoothers is not None:
      poses = np.stack([self._smoothers[b].update(poses[b])
                        for b in range(self._B)])
    return poses, info

  @property
  def state(self):
    """Current (x, P, features) carry, batched over slots.

    LIVE, DONATED view — invalidated by the next ``process()`` call
    (see ``OnlineRelocalizer.state``); copy before storing.
    """
    return self._carry
