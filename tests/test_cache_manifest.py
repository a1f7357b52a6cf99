"""Durability of the evidence base (round-3 verdict item 4): checksum
manifests over protocol stage caches, bit-determinism of the regen path
at CI scale, and the bf16 release-export/load round trip."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kfnet_tpu import pretrained
from kfnet_tpu.tools import cache_manifest, export_release
from kfnet_tpu.utils import checkpoint as ckpt_lib


def _fake_stage(work_dir, name, seed):
  params = {"w": np.full((4, 3), seed, np.float32),
            "b": np.arange(3, dtype=np.float32)}
  ckpt_lib.export_params(os.path.join(work_dir, name), params,
                         meta={"seed": seed})


def test_manifest_write_verify_and_tamper(tmp_path):
  d = str(tmp_path / "cache")
  _fake_stage(d, "stage1_a", 1)
  _fake_stage(d, "stage2_x", 2)
  m = cache_manifest.build_manifest(d)
  assert set(m["stages"]) == {"stage1_a", "stage2_x"}
  assert cache_manifest.verify_manifest(d, m) == []
  # same content elsewhere → same hashes (path-independent)
  d2 = str(tmp_path / "cache2")
  _fake_stage(d2, "stage1_a", 1)
  _fake_stage(d2, "stage2_x", 2)
  m2 = cache_manifest.build_manifest(d2)
  assert m2["stages"] == m["stages"]
  # tamper with one byte of one export file → that stage flagged
  victim = None
  for root, _, files in os.walk(os.path.join(d, "stage2_x")):
    for f in files:
      p = os.path.join(root, f)
      if os.path.getsize(p) > 0:
        victim = p
        break
    if victim:
      break
  with open(victim, "r+b") as f:
    b = f.read(1)
    f.seek(0)
    f.write(bytes([b[0] ^ 0xFF]))
  problems = cache_manifest.verify_manifest(d, m)
  assert len(problems) == 1 and "stage2_x" in problems[0]
  # missing stage also flagged
  problems = cache_manifest.verify_manifest(str(tmp_path / "cache3"), m)
  assert len(problems) == 2


def test_release_export_bf16_roundtrip(tmp_path):
  """export_release casts to bf16; pretrained's loader restores and casts
  back to the template dtype, matching an explicit f32→bf16→f32 trip."""
  src_root = os.path.join(os.path.dirname(__file__), os.pardir,
                          "artifacts", "pretrained_synthetic")
  out_root = str(tmp_path / "release")
  export_release.main(["--src", src_root, "--stage", "stage3_sceneA",
                       "--out", os.path.join(out_root, "stage3_sceneA")])
  meta = ckpt_lib.load_meta(os.path.join(out_root, "stage3_sceneA"))
  assert meta["params_dtype"] == "bfloat16"
  assert meta["coord_scale"]  # original self-description carried over

  cfg_f32, params_f32 = pretrained.load(src_root)
  cfg_bf, params_bf = pretrained.load(out_root)
  assert cfg_bf == cfg_f32
  ref = jax.tree_util.tree_map(
      lambda x: jnp.asarray(x).astype(jnp.bfloat16).astype(x.dtype),
      params_f32)
  for (ka, a), (kb, b) in zip(
      jax.tree_util.tree_leaves_with_path(ref),
      jax.tree_util.tree_leaves_with_path(params_bf)):
    assert a.dtype == b.dtype, (ka, a.dtype, b.dtype)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(ka))


@pytest.mark.slow
def test_protocol_regen_is_bit_deterministic(tmp_path):
  """Two identical miniature protocol trainings produce bitwise-identical
  stage exports on a fixed host — the property that makes a committed
  cache manifest verifiable after regeneration (CLAUDE.md one-command
  regen path)."""
  from kfnet_tpu.tools import protocol

  scenes = tuple(s for s in protocol.DEFAULT_SCENES if s.name == "sceneA")
  kw = dict(H=48, W=64, train_frames=6, test_frames=4, sc_steps=4,
            of_steps=4, joint_steps=2, scenes=scenes,
            log=lambda *a: None)
  manifests = []
  for sub in ("a", "b"):
    d = str(tmp_path / sub)
    protocol.prepare_stages(work_dir=d, **kw)
    manifests.append(cache_manifest.build_manifest(d)["stages"])
  assert manifests[0] == manifests[1]
