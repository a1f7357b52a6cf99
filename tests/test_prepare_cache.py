"""Training-only cache builder (tools/prepare_cache.py): the norm
studies' pairing discipline — a paired-trunk cache inherits the base
cache's stage-2 OFlowNet byte-for-byte, trains only its own trunk, and
strict-loads as the trunk it was trained with."""

import os

import jax
import numpy as np
import pytest

from kfnet_tpu.tools import prepare_cache, protocol
from kfnet_tpu.utils import checkpoint as ckpt_lib

MINI = ["--height", "48", "--width", "64", "--train_frames", "6",
        "--sc_steps", "2", "--of_steps", "2", "--joint_steps", "1"]
MINI_KW = dict(H=48, W=64, train_frames=6, test_frames=4, sc_steps=2,
               of_steps=2, joint_steps=1, log=lambda *a: None)


@pytest.mark.slow
def test_prepare_cache_pairs_trunks_and_strict_loads(tmp_path):
  base = str(tmp_path / "base")
  prepare_cache.main(["--work_dir", base, "--scenes", "sceneA,heldout",
                      *MINI])
  for stage in ("stage1_sceneA", "stage1_heldout", "stage2_indoor",
                "stage3_sceneA"):
    assert os.path.isdir(os.path.join(base, stage, "params")), stage

  ws = str(tmp_path / "ws")
  prepare_cache.main(["--work_dir", ws, "--scenes", "sceneA",
                      "--scoordnet_norm", "ws",
                      "--copy_stage2_from", base, *MINI])

  # stage 2 is the base cache's weights, value-for-value
  src = ckpt_lib.load_params_values(os.path.join(base, "stage2_indoor"))
  dst = ckpt_lib.load_params_values(os.path.join(ws, "stage2_indoor"))
  for a, b in zip(jax.tree_util.tree_leaves(src),
                  jax.tree_util.tree_leaves(dst)):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

  # the ws cache strict-loads as the trunk it was trained with
  scenes = tuple(s for s in protocol.DEFAULT_SCENES if s.name == "sceneA")
  *_, joint = protocol.prepare_stages(work_dir=ws, scenes=scenes,
                                      strict_cache=True,
                                      scoordnet_norm="ws", **MINI_KW)
  assert joint["sceneA"][0].scoordnet.norm == "ws"

  # re-copy is a no-op (stage-level resume), not an overwrite
  copied = prepare_cache.copy_stage2(base, ws, log=lambda *a: None)
  assert copied == []


@pytest.mark.slow
def test_copy_stage2_requires_a_trained_source(tmp_path):
  empty = str(tmp_path / "empty")
  os.makedirs(empty)
  with pytest.raises(RuntimeError, match="no stage2"):
    prepare_cache.copy_stage2(empty, str(tmp_path / "dst"),
                              log=lambda *a: None)
