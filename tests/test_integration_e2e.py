"""End-to-end integration ladder (BASELINE.json configs 1-3, SURVEY.md §4):

  config 1: single image → SCoordNet → coordinate+uncertainty → PnP pose
  config 2: image pair → OFlowNet flow+warp
  config 3: full recursive filter over a sequence → per-frame poses

Runs on CPU with tiny nets trained briefly on a synthetic scene; the
cheap (unmarked) tests exercise every stage's plumbing, the slow-marked
one asserts accuracy after real training.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kfnet_tpu.core import geometry as geo
from kfnet_tpu.data import labels, synthetic
from kfnet_tpu.eval import eval_sequence
from kfnet_tpu.models import kfnet, oflownet, scoordnet
from kfnet_tpu.pose import ransac
from kfnet_tpu.train import objectives, trainer
from tests import tiny_configs as tc

H, W = 48, 64


def make_scene_data(n_train=24, n_test=6, seed=0):
  scene = synthetic.make_scene(seed)
  seq = synthetic.make_sequence(n_train, height=H, width=W, seed=seed)
  test_poses = synthetic.orbit_trajectory(n_test, seed=seed + 77)
  render = jax.jit(lambda T: synthetic.render(scene, T, seq["K"], H, W))
  rgbs, depths = jax.vmap(render)(test_poses)
  K = seq["K"]
  coords, valid = jax.vmap(
      lambda d, T: labels.generate(d, K, T, stride=8))(
          seq["depths"], seq["poses"])
  return {
      "K": K, "train": seq, "coords": coords, "valid": valid,
      "test_images": rgbs, "test_poses": test_poses,
  }


def train_tiny_scoordnet(data, steps=400, lr=3e-3, seed=0):
  coords, valid = data["coords"], data["valid"]
  mean, std = labels.scene_statistics([np.asarray(coords)],
                                      [np.asarray(valid)])
  cfg = dataclasses.replace(
      tc.tiny_scoordnet(), coord_offset=tuple(map(float, mean)),
      coord_scale=float(std))
  params = scoordnet.init(jax.random.key(seed), cfg, (H, W, 3))
  loss_fn = objectives.scoordnet_objective(cfg)
  opt = trainer.make_optimizer(trainer.OptimizerConfig(learning_rate=lr))
  step_fn = trainer.make_train_step(loss_fn, opt)
  state = trainer.create_state(params, opt)
  rng = np.random.default_rng(seed)
  n = data["train"]["images"].shape[0]
  batch_all = {"image": data["train"]["images"], "coords": coords,
               "valid": valid}
  for _ in range(steps):
    idx = rng.integers(0, n, size=6)
    batch = {k: v[idx] for k, v in batch_all.items()}
    state, m = step_fn(state, batch)
  return cfg, state.params, m


@pytest.fixture(scope="module")
def trained():
  data = make_scene_data()
  sc_cfg, sc_params, m = train_tiny_scoordnet(data)
  of_cfg = tc.tiny_oflownet()
  kf_cfg = kfnet.KFNetConfig(scoordnet=sc_cfg, oflownet=of_cfg)
  params = {"scoordnet": sc_params,
            "oflownet": oflownet.init(jax.random.key(1), of_cfg, (H, W, 3))}
  return data, kf_cfg, params, m


def test_config1_single_frame_to_pose(trained):
  data, cfg, params, m = trained
  assert float(m["coord_err_m"]) < 0.35, dict(m)
  z, V = kfnet.measure(params, cfg, data["test_images"][0])
  out = ransac.solve_pnp_from_maps(
      z, V, jnp.ones_like(V, bool), data["K"], jax.random.key(0), stride=8,
      config=ransac.RansacConfig(num_hypotheses=128, top_k=48))
  terr = float(geo.translation_error(out["T_wc"], data["test_poses"][0]))
  assert np.isfinite(terr)
  assert terr < 1.0, terr  # loose: 400 steps on a 6x8 map


def test_config2_pair_flow_warp(trained):
  data, cfg, params, _ = trained
  flow, Wn = oflownet.apply(params["oflownet"], cfg.oflownet,
                            data["test_images"][0], data["test_images"][1])
  assert flow.shape == (H // 8, W // 8, 2)
  assert bool((Wn > 0).all())


def test_config3_full_filter_sequence(trained):
  data, cfg, params, _ = trained
  res = eval_sequence.evaluate_sequence(
      params, cfg, data["test_images"], data["K"],
      gt_poses=np.asarray(data["test_poses"]), scene="synthetic",
      ransac_config=ransac.RansacConfig(num_hypotheses=128, top_k=48),
      stride=8)
  rep = res.report
  assert rep["frames"] == 6
  assert np.isfinite(rep["median_translation_m"])
  assert rep["median_translation_m"] < 1.5, rep
  assert res.frames_per_sec > 0
  # fused posterior variance must not exceed measurement variance on avg
  z, V = kfnet.measure(params, cfg, data["test_images"][-1])
  assert float(np.mean(res.covariance[-1])) <= float(jnp.mean(V)) + 1e-6


@pytest.mark.slow
def test_ladder_accuracy_after_longer_training():
  data = make_scene_data(n_train=48)
  sc_cfg, sc_params, m = train_tiny_scoordnet(data, steps=1500, lr=2e-3)
  assert float(m["coord_err_m"]) < 0.12, dict(m)
  of_cfg = tc.tiny_oflownet()
  cfg = kfnet.KFNetConfig(scoordnet=sc_cfg, oflownet=of_cfg)
  params = {"scoordnet": sc_params,
            "oflownet": oflownet.init(jax.random.key(1), of_cfg, (H, W, 3))}
  res = eval_sequence.evaluate_measurement_only(
      params, cfg, data["test_images"], data["K"],
      gt_poses=np.asarray(data["test_poses"]), scene="synthetic",
      ransac_config=ransac.RansacConfig(num_hypotheses=256, top_k=48))
  assert res.report["median_translation_m"] < 0.4, res.report
