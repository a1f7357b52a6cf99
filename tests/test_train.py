import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kfnet_tpu.data import labels, synthetic
from kfnet_tpu.models import kfnet, oflownet, scoordnet
from kfnet_tpu.train import objectives, trainer
from tests import tiny_configs as tc


def synth_batch(n=4, seed=0, pairs=False):
  seq = synthetic.make_sequence(n + 1, height=48, width=64, seed=seed)
  coords, valid = jax.vmap(
      lambda d, T: labels.generate(d, seq["K"], T, stride=8))(
          seq["depths"], seq["poses"])
  batch = {
      "image": seq["images"][1:],
      "coords": coords[1:],
      "valid": valid[1:],
  }
  if pairs:
    batch["image_prev"] = seq["images"][:-1]
    batch["coords_prev"] = coords[:-1]
    batch["valid_prev"] = valid[:-1]
  return batch


def repeat_batches(batch, steps):
  for _ in range(steps):
    yield batch


def test_scoordnet_training_reduces_loss():
  cfg = tc.tiny_scoordnet()
  params = scoordnet.init(jax.random.key(0), cfg, tc.IMG)
  batch = synth_batch()
  loss_fn = objectives.scoordnet_objective(cfg)
  l0, m0 = loss_fn(params, batch)
  opt_cfg = trainer.OptimizerConfig(learning_rate=3e-3, grad_clip_norm=5.0)
  loop = trainer.TrainLoopConfig(max_steps=30, log_every=1000)
  state = trainer.fit(loss_fn, params, repeat_batches(batch, 30),
                      optimizer_cfg=opt_cfg, loop_cfg=loop, mesh=None)
  l1, m1 = loss_fn(state.params, batch)
  assert float(l1) < float(l0) - 0.5, (float(l0), float(l1))
  assert int(state.step) == 30


def test_oflownet_objective_smoke():
  cfg = tc.tiny_oflownet()
  params = oflownet.init(jax.random.key(1), cfg, tc.IMG)
  batch = synth_batch(pairs=True)
  loss_fn = objectives.oflownet_objective(cfg, flow_reg_weight=0.01)
  (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
      params, batch)
  assert np.isfinite(float(loss))
  assert float(metrics["supervised_frac"]) > 0.5
  gnorm = float(jnp.sqrt(sum(
      jnp.sum(g ** 2) for g in jax.tree_util.tree_leaves(grads))))
  assert np.isfinite(gnorm) and gnorm > 0


def test_kfnet_joint_objective_trains_both_subnets():
  cfg = tc.tiny_kfnet()
  params = kfnet.init(jax.random.key(2), cfg, tc.IMG)
  batch = synth_batch(pairs=True)
  loss_fn = objectives.kfnet_objective(cfg)
  (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
      params, batch)
  assert np.isfinite(float(loss))
  for sub in ("scoordnet", "oflownet"):
    g = float(jnp.sqrt(sum(
        jnp.sum(x ** 2) for x in jax.tree_util.tree_leaves(grads[sub]))))
    assert g > 0, f"no gradient into {sub}"


def test_kfnet_window_objective_bptt():
  cfg = tc.tiny_kfnet()
  params = kfnet.init(jax.random.key(9), cfg, tc.IMG)
  seq = synth_batch(n=4, seed=7, pairs=False)
  batch = {"images": seq["image"][None],          # (1, 4, H, W, 3)
           "coords": seq["coords"][None],
           "valid": seq["valid"][None]}
  loss_fn = objectives.kfnet_window_objective(cfg)
  (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
      params, batch)
  assert np.isfinite(float(loss))
  for sub in ("scoordnet", "oflownet"):
    g = float(jnp.sqrt(sum(
        jnp.sum(x ** 2) for x in jax.tree_util.tree_leaves(grads[sub]))))
    assert np.isfinite(g) and g > 0, f"no BPTT gradient into {sub}"

  # remat=True (O(1)-in-T activation memory) recomputes the same graph in
  # the backward sweep — loss and gradients must match up to the
  # documented compile-order variance (~1e-5; remat re-fuses the
  # recomputed forward, so summation orders differ slightly).
  loss_fn_r = objectives.kfnet_window_objective(cfg, remat=True)
  (loss_r, _), grads_r = jax.value_and_grad(loss_fn_r, has_aux=True)(
      params, batch)
  np.testing.assert_allclose(float(loss_r), float(loss), rtol=1e-6)
  for a, b in zip(jax.tree_util.tree_leaves(grads),
                  jax.tree_util.tree_leaves(grads_r)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-3, atol=1e-5)


def test_fit_on_device_window_mode():
  """device_fit window mode: minibatch rows are T-frame windows gathered
  on device from the raw sequence (the demo/protocol stage-3 BPTT path)."""
  from kfnet_tpu.train.device_fit import fit_on_device

  cfg = tc.tiny_kfnet()
  params = kfnet.init(jax.random.key(11), cfg, tc.IMG)
  seq = synth_batch(n=6, seed=13, pairs=False)
  data = {"images": seq["image"], "coords": seq["coords"],
          "valid": seq["valid"]}
  loss_fn = objectives.kfnet_window_objective(cfg, remat=True)
  state, m = fit_on_device(loss_fn, params, data, steps=3, lr=1e-3,
                           batch=2, chunk=2, window=4, log=None)
  assert int(state.step) == 3
  assert np.isfinite(float(m["loss"]))
  import pytest
  with pytest.raises(ValueError, match="window"):
    fit_on_device(loss_fn, params, data, steps=1, lr=1e-3, batch=1,
                  window=7, log=None)


def test_checkpoint_resume(tmp_path):
  cfg = tc.tiny_scoordnet()
  params = scoordnet.init(jax.random.key(3), cfg, tc.IMG)
  batch = synth_batch(seed=4)
  loss_fn = objectives.scoordnet_objective(cfg)
  ckdir = str(tmp_path / "ck")
  loop = trainer.TrainLoopConfig(max_steps=6, log_every=1000,
                                 checkpoint_every=3, checkpoint_dir=ckdir)
  s1 = trainer.fit(loss_fn, params, repeat_batches(batch, 6),
                   loop_cfg=loop, mesh=None)
  # resume: same dir, higher max_steps → continues from step 6. Feed only
  # the 3 MISSING batches: a broken resume (silent restart from step 0)
  # would then end at step 3 and fail the step assertion — with 9 batches
  # a from-scratch run would also reach step 9 and slip through.
  loop2 = trainer.TrainLoopConfig(max_steps=9, log_every=1000,
                                  checkpoint_every=3, checkpoint_dir=ckdir)
  s2 = trainer.fit(loss_fn, params, repeat_batches(batch, 3),
                   loop_cfg=loop2, mesh=None)
  assert int(s2.step) == 9
  # the resumed run must not have restarted from scratch:
  l1, _ = loss_fn(s1.params, batch)
  l2, _ = loss_fn(s2.params, batch)
  assert float(l2) <= float(l1) + 1e-3


def test_fit_multi_step_dispatch_matches_single():
  """steps_per_dispatch=3 (scan of 3 optimizer steps per jit call) must
  produce the same training trajectory as per-step dispatch."""
  cfg = tc.tiny_scoordnet()
  params = scoordnet.init(jax.random.key(2), cfg, tc.IMG)
  batch = synth_batch(seed=4)
  loss_fn = objectives.scoordnet_objective(cfg)
  opt_cfg = trainer.OptimizerConfig(learning_rate=1e-3)

  s1 = trainer.fit(loss_fn, params, repeat_batches(batch, 6),
                   optimizer_cfg=opt_cfg,
                   loop_cfg=trainer.TrainLoopConfig(max_steps=6,
                                                    log_every=1000))
  s3 = trainer.fit(loss_fn, params, repeat_batches(batch, 6),
                   optimizer_cfg=opt_cfg,
                   loop_cfg=trainer.TrainLoopConfig(
                       max_steps=6, log_every=1000, steps_per_dispatch=3))
  assert int(s1.step) == int(s3.step) == 6
  for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                  jax.tree_util.tree_leaves(s3.params)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_fit_multi_step_dispatch_dp_mesh():
  """K>1 under the 8-device mesh: stacked (K, B, ...) batches shard on the
  batch axis; loss finite, step count exact."""
  from kfnet_tpu.parallel import mesh as mesh_lib
  cfg = tc.tiny_scoordnet()
  params = scoordnet.init(jax.random.key(3), cfg, tc.IMG)
  batch = synth_batch(n=8, seed=5)
  loss_fn = objectives.scoordnet_objective(cfg)
  state = trainer.fit(loss_fn, params, repeat_batches(batch, 4),
                      optimizer_cfg=trainer.OptimizerConfig(),
                      loop_cfg=trainer.TrainLoopConfig(
                          max_steps=4, log_every=1000,
                          steps_per_dispatch=2),
                      mesh=mesh_lib.make_mesh(8))
  assert int(state.step) == 4
  l, _ = loss_fn(state.params, batch)
  assert np.isfinite(float(l))


def test_fit_multi_step_dispatch_exact_max_steps():
  """Review r2: K>1 must stop at EXACTLY max_steps (trimmed tail dispatch)
  and must not drop tail batches of a finite stream."""
  cfg = tc.tiny_scoordnet()
  params = scoordnet.init(jax.random.key(4), cfg, tc.IMG)
  batch = synth_batch(seed=6)
  loss_fn = objectives.scoordnet_objective(cfg)
  # max_steps not a multiple of K
  s = trainer.fit(loss_fn, params, repeat_batches(batch, 10),
                  optimizer_cfg=trainer.OptimizerConfig(),
                  loop_cfg=trainer.TrainLoopConfig(
                      max_steps=6, log_every=1000, steps_per_dispatch=4))
  assert int(s.step) == 6
  # finite stream shorter than max_steps, length not a multiple of K:
  # every batch must be trained (tail group included)
  s2 = trainer.fit(loss_fn, params, repeat_batches(batch, 5),
                   optimizer_cfg=trainer.OptimizerConfig(),
                   loop_cfg=trainer.TrainLoopConfig(
                       max_steps=100, log_every=1000, steps_per_dispatch=4))
  assert int(s2.step) == 5
