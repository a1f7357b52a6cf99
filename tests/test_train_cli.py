"""Smoke test of the per-scene training CLI (reference: SCoordNet/train.py
surface) on a fake on-disk scene: flags → loaders → scene stats → DP
trainer → orbax checkpoint."""

import os

import numpy as np
import pytest

from tests.test_data import make_fake_7scenes


@pytest.mark.slow
def test_train_scoordnet_cli(tmp_path):
  from kfnet_tpu.train import train_scoordnet

  root = make_fake_7scenes(str(tmp_path / "data"), n=6)
  model_dir = str(tmp_path / "models")
  state = train_scoordnet.main([
      "--input_folder", root, "--scene", "chess",
      "--model_folder", model_dir,
      "--batch_size", "2", "--max_steps", "3",
      "--learning_rate", "1e-4",
  ])
  assert int(state.step) == 3
  out_dir = os.path.join(model_dir, "scoordnet_chess")
  assert os.path.exists(os.path.join(out_dir, "metrics.jsonl"))
  # a checkpoint was written at the end
  from kfnet_tpu.utils.checkpoint import Checkpointer
  ck = Checkpointer(out_dir)
  assert ck.latest_step() == 3


@pytest.mark.slow
def test_train_oflownet_cli(tmp_path):
  from kfnet_tpu.train import train_oflownet

  root = make_fake_7scenes(str(tmp_path / "data"), n=6)
  model_dir = str(tmp_path / "models")
  state = train_oflownet.main([
      "--input_folder", root, "--scenes", "chess",
      "--model_folder", model_dir,
      "--batch_size", "2", "--max_steps", "2",
  ])
  assert int(state.step) == 2


@pytest.mark.slow
def test_train_oflownet_multiscene_dp(tmp_path):
  """BASELINE.json config 5: multi-scene data-parallel training — pairs
  drawn across scenes, batch sharded over the full 8-device mesh."""
  from kfnet_tpu.train import train_oflownet

  root = str(tmp_path / "data")
  make_fake_7scenes(root, scene="chess", n=5)
  make_fake_7scenes(root, scene="fire", n=5)
  model_dir = str(tmp_path / "models")
  state = train_oflownet.main([
      "--input_folder", root, "--scenes", "chess,fire",
      "--model_folder", model_dir,
      "--batch_size", "8",  # divisible by 8 devices -> full-mesh DP
      "--max_steps", "2",
  ])
  assert int(state.step) == 2


@pytest.mark.slow
def test_train_kfnet_cli_window_bptt(tmp_path):
  """--window_size 3: the T-frame BPTT objective through the joint CLI."""
  from kfnet_tpu.train import train_kfnet

  root = make_fake_7scenes(str(tmp_path / "data"), n=6)
  model_dir = str(tmp_path / "models")
  state = train_kfnet.main([
      "--input_folder", root, "--scene", "chess",
      "--model_folder", model_dir,
      "--batch_size", "2", "--max_steps", "2",
      "--window_size", "3",
  ])
  assert int(state.step) == 2
