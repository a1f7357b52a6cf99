"""Sequence-level recursive filtering as a single ``lax.scan``
(SURVEY.md §3.3 north-star: replace the reference's per-frame
``session.run`` + host numpy round trip with one compiled scan whose
(x, P, features) carry never leaves the device).

Long sequences: memory is O(1) in T by construction (the carry is one
frame's state); ``run_filter_chunked`` additionally lets callers stream
frames from host in fixed-size chunks so arbitrarily long videos never
materialize (T, H, W, 3) in HBM — the temporal analog of the reference's
O(1) python loop (SURVEY.md §5 "long-context").
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp

from kfnet_tpu.models import kfnet


def run_filter(params, config: kfnet.KFNetConfig, images: jnp.ndarray,
               carry: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None = None,
               return_aux: bool = False):
  """Filter a whole (T, H, W, 3) sequence in one scan.

  Args:
    images: (T, H, W, 3) frames.
    carry: optional (x, P, feat) carry to resume from (chunked streaming);
      None starts a new sequence with frame 0 = measurement-only.

  Returns:
    (xs, Ps): (T, h, w, 3), (T, h, w, 1) per-frame posteriors,
    final carry, and (optionally) stacked aux dict for frames 1..T-1.
  """
  images = kfnet.preprocess_images(config, images)  # hoisted s2d stem
  if carry is None:
    x0, P0, feat0 = kfnet.first_step(params, config, images[0])
    rest = images[1:]
    lead = (x0, P0)
  else:
    x0, P0, feat0 = carry
    rest = images
    lead = None

  def step(c, image):
    x, P, feat = c
    x1, P1, feat1, aux = kfnet.filter_step(params, config, x, P, feat, image)
    out = (x1, P1, aux) if return_aux else (x1, P1)
    return (x1, P1, feat1), out

  final_carry, outs = jax.lax.scan(step, (x0, P0, feat0), rest)
  if return_aux:
    xs, Ps, auxs = outs
  else:
    xs, Ps = outs
    auxs = None
  if lead is not None:
    xs = jnp.concatenate([lead[0][None], xs], axis=0)
    Ps = jnp.concatenate([lead[1][None], Ps], axis=0)
  if return_aux:
    return xs, Ps, final_carry, auxs
  return xs, Ps, final_carry


@partial(jax.jit, static_argnames=("config", "return_aux"), donate_argnums=(3,))
def run_filter_jit(params, config, images, carry, return_aux: bool = False):
  """Jitted resumable chunk step: carry is donated so state updates in
  place in HBM between chunks."""
  return run_filter(params, config, images, carry=carry,
                    return_aux=return_aux)


@partial(jax.jit, static_argnames=("config", "return_aux"))
def run_filter_first_jit(params, config, images, return_aux: bool = False):
  """Jitted carry=None entry (first streaming chunk). Without this the
  first chunk of every streaming session would run eagerly, op-by-op —
  hundreds of ~5-10 ms dispatches on this sandbox's TPU tunnel."""
  return run_filter(params, config, images, carry=None,
                    return_aux=return_aux)


def run_filter_chunked_arrays(params, config: kfnet.KFNetConfig,
                              frame_source, chunk_size: int = 32,
                              return_aux: bool = False):
  """Stream an arbitrarily long sequence through the jitted scan in
  fixed-shape chunks (one compilation, O(chunk) HBM), yielding WHOLE
  device-resident chunks: (xs (k, h, w, 3), Ps (k, h, w, 1)).

  Chunk yields (not per-frame slices) matter on hosts with expensive
  dispatch: slicing xs[i] per frame costs ~2 dispatches/frame, which on
  this sandbox's ~5-10 ms tunnel caps streaming at ~60 fps regardless of
  kernel speed. Consumers that really want per-frame items use
  :func:`run_filter_chunked`.

  Args:
    frame_source: iterable of (H, W, 3) numpy/jnp frames. uint8 frames
      are first-class (kept 1 byte/channel through host stack, transfer,
      and the hoisted s2d stem; cast to [0, 1] f32 on device inside the
      scan) — the host-origin serving format.
    return_aux: also yield the stacked per-step aux dict (consistency
      mask, innovation stats — see ``kfnet.filter_step``) as a third
      element. Frame 0 is measurement-only and has no filter step, so in
      the FIRST yielded chunk the aux rows align with ``xs[1:]``; in
      every later chunk they align with ``xs`` 1:1.

  The generator is software-pipelined one chunk deep: chunk k's host
  stack + upload + dispatch are enqueued BEFORE chunk k−1's outputs are
  yielded, so the host→device transfer of k overlaps the device compute
  of k−1 and the consumer's sync of k−1 returns promptly (on a
  bandwidth-bound link the upload is the dominant cost — serializing it
  with compute was the round-4 streaming bottleneck). Costs one extra
  chunk of inputs+outputs resident in HBM; outputs and their order are
  identical to the unpipelined form.
  """
  import numpy as np

  def stack(chunk):
    if isinstance(chunk[0], np.ndarray):
      return jnp.asarray(np.stack(chunk))  # one host stack + one transfer
    return jnp.stack(chunk)  # already on device: stays on device

  buf = []
  carry = None
  first = True

  def flush(chunk, carry, first):
    imgs = stack(chunk)
    if first:
      # separate jitted entry (fixed chunk_size+1 shape → one compile)
      out = run_filter_first_jit(params, config, imgs,
                                 return_aux=return_aux)
    else:
      out = run_filter_jit(params, config, imgs, carry,
                           return_aux=return_aux)
    if return_aux:
      return out  # (xs, Ps, carry, auxs)
    return out + (None,)

  def emit(xs, Ps, auxs):
    return (xs, Ps, auxs) if return_aux else (xs, Ps)

  # An exception in chunk k's stack/upload/dispatch (bad frame shape,
  # device OOM) must not destroy chunk k−1's already-computed results:
  # yield them to the consumer first, THEN propagate — a generator may
  # yield from an except block; the raise resumes on the consumer's
  # next next() call, so a per-chunk logger (e.g. tools/soak.py) keeps
  # the last completed chunk of a multi-hour stream in its record.
  pending = None  # previously dispatched chunk's (not yet yielded) outputs
  for frame in frame_source:
    buf.append(frame)
    # first chunk holds one extra frame (frame 0 = measurement-only)
    if len(buf) == (chunk_size + 1 if first else chunk_size):
      try:
        xs, Ps, carry, auxs = flush(buf, carry, first)  # upload+dispatch k
      except BaseException:
        if pending is not None:
          out, pending = pending, None
          yield out  # preserve chunk k-1 for the consumer's record
        raise
      first = False
      buf = []
      if pending is not None:
        yield pending  # consumer syncs k-1 while k computes
      pending = emit(xs, Ps, auxs)
  if buf:
    # ragged tail: pad to chunk shape, then drop padded outputs.
    n = len(buf)
    try:
      if first:
        # whole sequence shorter than one chunk: single ragged compile
        xs, Ps, _, auxs = flush(buf, None, True)
        tail = emit(xs, Ps, auxs)
      else:
        pad = [buf[-1]] * (chunk_size - n)
        xs, Ps, _, auxs = flush(buf + pad, carry, False)
        tail = emit(xs[:n], Ps[:n],
                    None if auxs is None
                    else jax.tree_util.tree_map(lambda a: a[:n], auxs))
    except BaseException:
      if pending is not None:
        out, pending = pending, None
        yield out
      raise
    if pending is not None:
      yield pending
    pending = tail
  if pending is not None:
    yield pending


def run_filter_chunked(params, config: kfnet.KFNetConfig, frame_source,
                       chunk_size: int = 32):
  """Per-frame wrapper over :func:`run_filter_chunked_arrays`.

  Yields:
    (x, P) posterior per frame, in order.
  """
  for xs, Ps in run_filter_chunked_arrays(params, config, frame_source,
                                          chunk_size=chunk_size):
    for i in range(xs.shape[0]):
      yield xs[i], Ps[i]


def run_filter_batched(params, config: kfnet.KFNetConfig,
                       images: jnp.ndarray):
  """Serving mode: B independent sequences filtered in lockstep.

  Args:
    images: (T, B, H, W, 3) — time-major, so each scan step consumes a
    contiguous (B, H, W, 3) slab (a vmap over a time-major ``run_filter``
    would instead gather a strided [:, t] slice per step, which measured
    ~6x slower end-to-end).

  Returns:
    xs (T, B, h, w, 3), Ps (T, B, h, w, 1).
  """
  images = kfnet.preprocess_images(config, images)  # hoisted s2d stem
  first = jax.vmap(lambda im: kfnet.first_step(params, config, im))
  step = jax.vmap(
      lambda x, P, f, im: kfnet.filter_step(params, config, x, P, f, im)[:3])

  x0, P0, feat0 = first(images[0])

  def body(c, im):
    x, P, feat = c
    x1, P1, feat1 = step(x, P, feat, im)
    return (x1, P1, feat1), (x1, P1)

  _, (xs, Ps) = jax.lax.scan(body, (x0, P0, feat0), images[1:])
  xs = jnp.concatenate([x0[None], xs], axis=0)
  Ps = jnp.concatenate([P0[None], Ps], axis=0)
  return xs, Ps


def run_filter_fleet(params, config: kfnet.KFNetConfig,
                     images: jnp.ndarray, mesh,
                     axis_name: str = "data"):
  """Multi-chip serving: B independent sequences sharded over the mesh.

  The batched lockstep scan (:func:`run_filter_batched`) is pure data
  parallelism — streams never interact — so sharding the B axis over the
  mesh needs NO collectives inside the scan: GSPMD partitions every op
  along B and each chip filters its own B/n streams at single-chip speed.
  Aggregate throughput scales linearly with chips (SURVEY.md §2.2
  parallelism checklist, DP row; the reference is single-GPU).

  Args:
    images: (T, B, H, W, 3) time-major stack; the mesh size must divide B.
    mesh: a 1-D ``jax.sharding.Mesh`` (e.g. ``parallel.mesh.make_mesh()``).

  Returns:
    xs (T, B, h, w, 3), Ps (T, B, h, w, 1), sharded along B on the mesh.
  """
  from jax.sharding import NamedSharding, PartitionSpec as P

  n = mesh.devices.size
  B = images.shape[1]
  if B % n:
    raise ValueError(f"batch {B} must be divisible by mesh size {n}")
  seq_sh = NamedSharding(mesh, P(None, axis_name))
  images = jax.device_put(images, seq_sh)
  params = jax.device_put(params, NamedSharding(mesh, P()))
  return _fleet_jit(seq_sh)(params, config, images)


@lru_cache(maxsize=None)
def _fleet_jit(seq_sh):
  """Per-sharding cached jit of the fleet scan: a fresh ``jax.jit`` per
  call would recompile every invocation (round-2 advisor finding) — wrong
  for a serving API. NamedSharding is hashable, so one wrapper (and one
  compile) per (mesh, spec) serves all subsequent calls."""
  return jax.jit(run_filter_batched, static_argnames=("config",),
                 out_shardings=(seq_sh, seq_sh))


def run_filter_python_loop(params, config: kfnet.KFNetConfig,
                           images: jnp.ndarray):
  """Reference-shaped python loop (one step per frame, like the TF1
  eval driver) — used by the scan-equivalence numeric test (SURVEY.md §4)."""
  x, P, feat = kfnet.first_step(params, config, images[0])
  xs, Ps = [x], [P]
  for t in range(1, images.shape[0]):
    x, P, feat, _ = kfnet.filter_step(params, config, x, P, feat, images[t])
    xs.append(x)
    Ps.append(P)
  return jnp.stack(xs), jnp.stack(Ps)
