"""Multi-device DP tests on the virtual 8-device CPU mesh
(SURVEY.md §4 "Distributed"): pjit/GSPMD sharding of the train step and
batched eval, without TPU hardware."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kfnet_tpu.models import scoordnet
from kfnet_tpu.parallel import mesh as mesh_lib
from kfnet_tpu.train import objectives, trainer
from tests import tiny_configs as tc
from tests.test_train import synth_batch


@pytest.fixture(scope="module")
def mesh():
  assert len(jax.devices()) >= 8, "conftest must fake 8 CPU devices"
  return mesh_lib.make_mesh(8)


def test_batch_shards_over_mesh(mesh):
  batch = synth_batch(n=8)
  sharded = mesh_lib.shard_batch(mesh, batch)
  shard_shapes = [s.data.shape for s in sharded["image"].addressable_shards]
  assert len(shard_shapes) == 8
  assert all(s[0] == 1 for s in shard_shapes)


def test_dp_train_step_matches_single_device(mesh):
  cfg = tc.tiny_scoordnet()
  params = scoordnet.init(jax.random.key(0), cfg, tc.IMG)
  batch = synth_batch(n=8, seed=1)
  loss_fn = objectives.scoordnet_objective(cfg)
  optimizer = trainer.make_optimizer(trainer.OptimizerConfig())
  step_fn = trainer.make_train_step(loss_fn, optimizer)

  # device_put-replication ALIASES the source buffer on its own device, so
  # the donating train_step would delete it out from under the other run —
  # give each run an independent deep copy of the params.
  copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), t)
  s1 = mesh_lib.replicate_tree(
      mesh, trainer.create_state(copy(params), optimizer))
  sb = mesh_lib.shard_batch(mesh, batch)

  # single device
  s0 = trainer.create_state(copy(params), optimizer)
  s0, m0 = step_fn(s0, batch)

  # 8-way DP
  s1, m1 = step_fn(s1, sb)

  np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]),
                             rtol=1e-5)
  l0 = jax.tree_util.tree_leaves(s0.params)
  l1 = jax.tree_util.tree_leaves(s1.params)
  for a, b in zip(l0, l1):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dp_multi_step_loss_decreases(mesh):
  cfg = tc.tiny_scoordnet()
  params = scoordnet.init(jax.random.key(1), cfg, tc.IMG)
  batch = synth_batch(n=8, seed=2)
  loss_fn = objectives.scoordnet_objective(cfg)

  def batches(n):
    for _ in range(n):
      yield batch

  l0, _ = loss_fn(params, batch)
  state = trainer.fit(
      loss_fn, params, batches(15),
      optimizer_cfg=trainer.OptimizerConfig(learning_rate=3e-3),
      loop_cfg=trainer.TrainLoopConfig(max_steps=15, log_every=1000),
      mesh=mesh)
  l1, _ = loss_fn(state.params, batch)
  assert float(l1) < float(l0)


def test_fleet_filter_matches_single_device(mesh):
  """Multi-chip serving (run_filter_fleet): 8 independent streams sharded
  over the 8-device mesh must match the single-device batched scan."""
  from kfnet_tpu.filter import sequence
  from kfnet_tpu.models import kfnet

  cfg = tc.tiny_kfnet()
  params = kfnet.init(jax.random.key(7), cfg, tc.IMG)
  streams = [tc.random_images(4, seed=20 + b) for b in range(8)]
  batch = jnp.stack(streams, axis=1)  # (T, B=8, H, W, 3)

  xs0, Ps0 = sequence.run_filter_batched(params, cfg, batch)
  xs1, Ps1 = sequence.run_filter_fleet(params, cfg, batch, mesh)

  # each stream lives on exactly one device; no cross-stream collectives
  shards = xs1.addressable_shards
  assert len(shards) == 8
  assert all(s.data.shape[1] == 1 for s in shards)
  np.testing.assert_allclose(np.asarray(xs1), np.asarray(xs0), atol=2e-5)
  np.testing.assert_allclose(np.asarray(Ps1), np.asarray(Ps0), atol=1e-5)


def test_fleet_filter_rejects_indivisible_batch(mesh):
  from kfnet_tpu.filter import sequence
  from kfnet_tpu.models import kfnet

  cfg = tc.tiny_kfnet()
  params = kfnet.init(jax.random.key(7), cfg, tc.IMG)
  batch = jnp.stack([tc.random_images(3, seed=1)] * 3, axis=1)
  with pytest.raises(ValueError, match="divisible"):
    sequence.run_filter_fleet(params, cfg, batch, mesh)


def test_make_mesh_validates_device_count():
  """0 must not silently mean 'all devices'; too-many must say why."""
  with pytest.raises(ValueError, match="need 1"):
    mesh_lib.make_mesh(0)
  with pytest.raises(ValueError, match="visible devices"):
    mesh_lib.make_mesh(len(jax.devices()) + 1)


def test_metric_logger_coerces_numpy_scalars(tmp_path):
  """np.float32/np.int64 metrics must reach every sink (a strict
  isinstance(int, float) filter silently dropped them); text and array
  payloads stay excluded."""
  import json

  from kfnet_tpu.utils.logging import MetricLogger

  path = tmp_path / "metrics.jsonl"
  lg = MetricLogger(jsonl_path=str(path))
  lg.log_metrics(3, {"loss": np.float32(1.5), "n": np.int64(7),
                     "note": "1.25", "arr": np.ones(3)})
  lg.close()
  rec = json.loads(path.read_text().splitlines()[-1])
  assert rec["loss"] == 1.5 and rec["n"] == 7.0
  assert "note" not in rec and "arr" not in rec
