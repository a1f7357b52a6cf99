"""Dispatch-efficient on-device training for small datasets (demo /
protocol rehearsal): the whole dataset lives in HBM; each jit call runs a
chunk of steps via lax.scan, gathering minibatches with on-device
jnp.take — one host round trip per chunk instead of per step (this
sandbox's TPU tunnel costs ~5-10 ms per dispatch; real pods also benefit).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kfnet_tpu.train import trainer


def fit_on_device(loss_fn, params, data: dict, steps: int, lr: float,
                  batch: int = 8, chunk: int = 250, seed: int = 0,
                  tag: str = "", log=print, window: int = 0):
  """Train ``steps`` optimizer steps on the device-resident ``data``.

  window: when > 0, ``data`` holds one time-contiguous sequence per key
  (leading axis = time) and each minibatch row is a WINDOW of ``window``
  consecutive frames gathered on device (idx shape (batch, window) →
  batch leading dims (batch, window, ...)) — the input contract of
  ``objectives.kfnet_window_objective``. The windows are never
  materialized host-side (a (n-T+1, T, H, W, 3) tensor would be tens of
  GB at full size); ``jnp.take`` gathers them per step in HBM.

  Returns (final TrainState, last-step metrics dict)."""
  opt = trainer.make_optimizer(trainer.OptimizerConfig(learning_rate=lr))
  # copy: run_chunk donates its state, which would otherwise delete the
  # caller's param buffers — fatal when callers share a subtree across
  # several fits (protocol.py reuses one OFlowNet for every scene).
  params = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
  state = trainer.create_state(params, opt)
  data = jax.device_put(data)
  n = next(iter(data.values())).shape[0]
  if window > n:
    raise ValueError(f"window {window} exceeds sequence length {n}")

  def one_step(data, s, idx):
    b = jax.tree_util.tree_map(lambda v: jnp.take(v, idx, axis=0), data)
    (loss, metrics), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(s.params, b)
    updates, opt_state = opt.update(grads, s.opt_state, s.params)
    new_params = optax.apply_updates(s.params, updates)
    return trainer.TrainState(step=s.step + 1, params=new_params,
                              opt_state=opt_state), metrics

  # NB: data is an explicit ARGUMENT, not a closure capture — jit embeds
  # closed-over arrays in the lowered computation, and shipping a ~GB
  # dataset through the compile path broke this sandbox's remote-compile
  # service (and bloats compiles everywhere).
  @partial(jax.jit, donate_argnums=(0,))
  def run_chunk(s, idxs, data):
    s, ms = jax.lax.scan(partial(one_step, data), s, idxs)
    return s, jax.tree_util.tree_map(lambda x: x[-1], ms)

  rng = np.random.default_rng(seed)
  done = 0
  m = {}
  while done < steps:
    k = min(chunk, steps - done)
    # k rows exactly: a short tail costs one extra compile but never
    # trains more steps than requested.
    if window > 0:
      starts = rng.integers(0, n - window + 1, size=(k, batch, 1))
      idxs = jnp.asarray(starts + np.arange(window))
    else:
      idxs = jnp.asarray(rng.integers(0, n, size=(k, batch)))
    state, m = run_chunk(state, idxs, data)
    done += k
    if log:
      log(f"{tag} step {done}: " + " ".join(
          f"{key}={float(val):.4f}" for key, val in sorted(m.items())
          if key in ("coord_err_m", "warp_err_m", "loss", "supervised_frac")))
  return state, m
