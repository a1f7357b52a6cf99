"""Checkpoint-layout + normalization round-trip tests (ADVICE r1 medium #2):
load_params must understand every on-disk layout the framework writes, and
the per-scene coordinate normalization must survive train → restore → eval.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kfnet_tpu.models import scoordnet
from kfnet_tpu.train import trainer
from kfnet_tpu.utils import checkpoint as ckpt_lib
from kfnet_tpu.utils import config as config_lib
from tests import tiny_configs as tc


@pytest.fixture(scope="module")
def tiny_params():
  cfg = tc.tiny_scoordnet()
  return cfg, scoordnet.init(jax.random.key(0), cfg, tc.IMG)


def _assert_tree_equal(a, b):
  la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
  assert len(la) == len(lb)
  for x, y in zip(la, lb):
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_load_params_bare_standardcheckpointer(tmp_path, tiny_params):
  _, params = tiny_params
  p = str(tmp_path / "bare")
  ckpt_lib.save_params(p, params)
  _assert_tree_equal(ckpt_lib.load_params(p, template=params), params)


def test_load_params_export_layout_and_meta(tmp_path, tiny_params):
  _, params = tiny_params
  d = str(tmp_path / "exported")
  meta = {"coord_offset": [1.0, 2.0, 3.0], "coord_scale": 4.0}
  ckpt_lib.export_params(d, params, meta=meta)
  _assert_tree_equal(ckpt_lib.load_params(d, template=params), params)
  assert ckpt_lib.load_meta(d) == meta


def test_load_params_train_outdir_layout(tmp_path, tiny_params):
  """Pointing --scoordnet_ckpt at a training out_dir must work both via the
  CheckpointManager step dirs and (when present) the export subdir."""
  _, params = tiny_params
  out_dir = str(tmp_path / "scoordnet_chess")
  opt = trainer.make_optimizer(trainer.OptimizerConfig())
  state = trainer.create_state(params, opt)
  ck = ckpt_lib.Checkpointer(out_dir)
  ck.save(7, state, force=True)
  ck.wait()
  # manager layout only (interrupted run): latest step's params sub-tree
  _assert_tree_equal(ckpt_lib.load_params(out_dir, template=params), params)
  # finished run: export subdir takes precedence. Export PERTURBED params
  # so the precedence is pinned — identical trees would let either load
  # path pass (review r2: tautology).
  meta = {"coord_offset": [0.5, 0.5, 0.5], "coord_scale": 2.0}
  bumped = jax.tree_util.tree_map(lambda x: x + 1.0, state.params)
  ckpt_lib.export_params(os.path.join(out_dir, "export"), bumped, meta)
  _assert_tree_equal(ckpt_lib.load_params(out_dir, template=params), bumped)
  assert ckpt_lib.load_meta(out_dir)["coord_scale"] == 2.0


def test_load_params_structure_mismatch_raises(tmp_path, tiny_params):
  _, params = tiny_params
  out_dir = str(tmp_path / "ckpt")
  opt = trainer.make_optimizer(trainer.OptimizerConfig())
  ck = ckpt_lib.Checkpointer(out_dir)
  ck.save(1, trainer.create_state(params, opt), force=True)
  ck.wait()
  bad_template = {"something_else": jnp.zeros((2,))}
  with pytest.raises(ValueError, match="template structure"):
    ckpt_lib.load_params(out_dir, template=bad_template)


def test_load_pretrained_restores_normalization(tmp_path, tiny_params):
  """train-style export (params + meta) → load_pretrained must bake the
  scene normalization back into the config AND restore the weights."""
  from kfnet_tpu.train.train_kfnet import load_pretrained

  base_cfg, _ = tiny_params
  norm_cfg = dataclasses.replace(
      base_cfg, coord_offset=(1.5, -2.0, 0.25), coord_scale=3.5)
  params = scoordnet.init(jax.random.key(3), norm_cfg, tc.IMG)
  out_dir = str(tmp_path / "scoordnet_chess")
  ckpt_lib.export_params(
      out_dir, params,
      meta={"coord_offset": list(norm_cfg.coord_offset),
            "coord_scale": norm_cfg.coord_scale})

  exp = config_lib.ExperimentConfig(
      scoordnet=base_cfg, oflownet=tc.tiny_oflownet())
  cfg, joint = load_pretrained(exp, tc.IMG, out_dir, None, seed=0)
  assert cfg.scoordnet.coord_offset == (1.5, -2.0, 0.25)
  assert cfg.scoordnet.coord_scale == 3.5
  _assert_tree_equal(joint["scoordnet"], params)

  # The restored net must emit metric (de-normalized) coordinates: the
  # same weights under the default config would emit normalized ones.
  img = tc.random_images(1)[0]
  c_norm, _ = scoordnet.apply(params, cfg.scoordnet, img)
  c_plain, _ = scoordnet.apply(params, base_cfg, img)
  np.testing.assert_allclose(
      np.asarray(c_norm),
      np.asarray(c_plain) * 3.5 + np.asarray([1.5, -2.0, 0.25]), atol=1e-4)
