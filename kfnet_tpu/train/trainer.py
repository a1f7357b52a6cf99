"""Generic jit-compiled, mesh-sharded trainer (SURVEY.md §3.1 hot loop,
rebuilt TPU-first).

Reference: per-step ``sess.run([train_op, ...])`` with Adam + exponential
LR decay and ``tf.train.Saver`` checkpoints. Rebuild: one donated,
jit-compiled ``train_step`` under a data mesh — params replicated, batch
sharded on the leading axis, gradient psum inserted by GSPMD — plus orbax
checkpointing with resume-by-step (SURVEY.md §5 failure-recovery row) and
structured metric logging.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kfnet_tpu.parallel import mesh as mesh_lib
from kfnet_tpu.utils import checkpoint as ckpt_lib
from kfnet_tpu.utils import logging as log_lib


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
  """Adam + exponential decay — the reference recipe (SURVEY.md §3.1)."""
  learning_rate: float = 1e-4
  decay_rate: float = 0.5
  decay_steps: int = 100_000
  staircase: bool = True
  beta1: float = 0.9
  beta2: float = 0.999
  grad_clip_norm: float | None = 5.0


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
  schedule = optax.exponential_decay(
      init_value=cfg.learning_rate, transition_steps=cfg.decay_steps,
      decay_rate=cfg.decay_rate, staircase=cfg.staircase)
  chain = []
  if cfg.grad_clip_norm:
    chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
  chain.append(optax.adam(schedule, b1=cfg.beta1, b2=cfg.beta2))
  return optax.chain(*chain)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
  step: jnp.ndarray
  params: object
  opt_state: object


def create_state(params, optimizer) -> TrainState:
  return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                    opt_state=optimizer.init(params))


def _one_step(loss_fn: Callable, optimizer):
  """THE gradient-step body, shared by the single-step and K-step
  dispatchers so a change to the update semantics (new metric, EMA, ...)
  cannot silently apply to one path and not the other."""

  def one_step(state: TrainState, batch):
    (loss, metrics), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params, batch)
    updates, opt_state = optimizer.update(
        grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics = dict(metrics)
    metrics["grad_norm"] = optax.global_norm(grads)
    return TrainState(step=state.step + 1, params=params,
                      opt_state=opt_state), metrics

  return one_step


def make_train_step(loss_fn: Callable, optimizer) -> Callable:
  """Returns jitted (state, batch) -> (state, metrics). State is donated;
  under a mesh, GSPMD turns the batch-mean gradient into a psum over ICI."""
  return partial(jax.jit, donate_argnums=(0,))(_one_step(loss_fn, optimizer))


def make_multi_train_step(loss_fn: Callable, optimizer,
                          unroll: int = 1) -> Callable:
  """K training steps per dispatch: (state, batches) -> (state, metrics of
  the last step), where ``batches`` is a pytree stacked along a leading
  (K,) axis. One jit call per K steps — essential on hosts with expensive
  dispatch (this sandbox's tunnel costs ~5-10 ms per call), and a standard
  step-batching pattern on real pods too."""
  one_step = _one_step(loss_fn, optimizer)

  @partial(jax.jit, donate_argnums=(0,))
  def multi_step(state: TrainState, batches):
    state, ms = jax.lax.scan(one_step, state, batches, unroll=unroll)
    return state, jax.tree_util.tree_map(lambda x: x[-1], ms)

  return multi_step


@dataclasses.dataclass(frozen=True)
class TrainLoopConfig:
  max_steps: int = 300_000
  log_every: int = 100
  checkpoint_every: int = 5000
  checkpoint_dir: str | None = None
  keep_checkpoints: int = 3
  # >1: stack K host batches and run K optimizer steps per jit dispatch
  # (make_multi_train_step) — amortizes the per-call dispatch cost
  # (~5-10 ms on this sandbox's TPU tunnel). log/checkpoint cadence then
  # quantizes to multiples of K.
  steps_per_dispatch: int = 1


def fit(loss_fn: Callable,
        init_params,
        batches: Iterator,
        optimizer_cfg: OptimizerConfig = OptimizerConfig(),
        loop_cfg: TrainLoopConfig = TrainLoopConfig(),
        mesh=None,
        logger: log_lib.MetricLogger | None = None):
  """Run the training loop; resumes from the latest checkpoint if
  loop_cfg.checkpoint_dir holds one. Returns the final TrainState.

  Pass ``mesh`` (see parallel.mesh.default_mesh) to shard batches over
  devices; with mesh=None everything runs on the default device."""
  optimizer = make_optimizer(optimizer_cfg)
  # copy: the jitted step donates its state, which would otherwise delete
  # the caller's init_params buffers on the first step.
  init_params = jax.tree_util.tree_map(
      lambda x: jnp.array(x, copy=True), init_params)
  state = create_state(init_params, optimizer)
  logger = logger or log_lib.MetricLogger()

  ckpt = None
  if loop_cfg.checkpoint_dir:
    ckpt = ckpt_lib.Checkpointer(
        loop_cfg.checkpoint_dir, max_to_keep=loop_cfg.keep_checkpoints)
    restored = ckpt.restore_latest(state)
    if restored is not None:
      state = restored
      logger.log_text(f"resumed at step {int(state.step)}")

  if mesh is not None:
    state = mesh_lib.replicate_tree(mesh, state)

  K = max(1, loop_cfg.steps_per_dispatch)
  if K > 1:
    multi_step = make_multi_train_step(loss_fn, optimizer)
    single_iter = iter(batches)

    def grouped():
      while True:
        group = []
        try:
          for _ in range(K):
            group.append(next(single_iter))
        except StopIteration:
          pass
        if not group:
          return
        # a short tail group (stream exhausted) is still trained — one
        # extra compile for its shape, but no batches silently dropped.
        # Stack WHERE THE DATA LIVES: host batches (pipelines pass
        # to_device=False for K>1) stack with np and go up in ONE sharded
        # device_put; batches already committed to a device stay there
        # (np.asarray on them would be a D2H round trip over the slow
        # tunnel — worse than the on-device stack + reshard).
        yield jax.tree_util.tree_map(
            lambda *xs: (jnp.stack(xs) if isinstance(xs[0], jax.Array)
                         else np.stack(xs)), *group)
        if len(group) < K:
          return

    batches = grouped()
    train_step = multi_step
  else:
    train_step = make_train_step(loss_fn, optimizer)
  t0 = time.time()
  # The step counter is tracked HOST-SIDE: state.step increments
  # deterministically (+1 per dispatch, +rows for K-step groups), and an
  # int(state.step) every iteration would block on the in-flight dispatch
  # — serializing host batch prep against device compute on every step
  # (5-10 ms/dispatch on this sandbox's tunnel). We only touch device
  # values at log/checkpoint cadence, where a sync is inherent anyway.
  start_step = int(state.step)
  step = start_step
  for batch in batches:
    remaining = loop_cfg.max_steps - step
    if remaining <= 0:
      break
    k_batch = 1
    if K > 1:
      k_batch = jax.tree_util.tree_leaves(batch)[0].shape[0]
      if k_batch > remaining:
        # trim so max_steps is exact (one extra compile for the tail)
        batch = jax.tree_util.tree_map(lambda x: x[:remaining], batch)
        k_batch = remaining
    if mesh is not None:
      if K > 1:
        # stacked (K, B, ...) batches shard on the BATCH axis (axis 1)
        sh = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, "data"))
        batch = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sh), batch)
      else:
        batch = mesh_lib.shard_batch(mesh, batch)
    prev_step = step
    state, metrics = train_step(state, batch)
    step += k_batch
    # window-crossing tests (not `step % every < K`, which can double-fire
    # around a boundary when a short tail group makes k_batch < K).
    if step // loop_cfg.log_every != prev_step // loop_cfg.log_every:
      metrics = {k: float(v) for k, v in metrics.items()}
      dt = time.time() - t0
      sps = (step - start_step) / max(dt, 1e-9)
      logger.log_metrics(step, {**metrics, "steps_per_sec": sps})
    if ckpt and (step // loop_cfg.checkpoint_every
                 != prev_step // loop_cfg.checkpoint_every):
      ckpt.save(step, state)
  if ckpt:
    ckpt.save(step, state, force=True)
    ckpt.wait()
  return state
