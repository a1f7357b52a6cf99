"""End-to-end CLI test: eval over a fake on-disk 7-Scenes scene with tiny
nets (exercises the full KFNet/eval.py-equivalent surface: load frames,
filter, PnP, coord-accuracy stats, report + dump files)."""

import json
import os
from unittest import mock

import numpy as np

from tests.test_data import make_fake_7scenes


def test_eval_main_cli(tmp_path, monkeypatch):
  from kfnet_tpu.eval import main as eval_main
  from kfnet_tpu.models import kfnet
  from tests import tiny_configs as tc

  root = make_fake_7scenes(str(tmp_path / "data"), n=4)
  report_path = str(tmp_path / "report.json")
  dump_dir = str(tmp_path / "dump")

  # patch the full-size model init to tiny configs (CLI flags select
  # dataset/scene; the test swaps in the tiny architecture).
  def tiny_load(exp, image_shape, sc, of, seed=0):
    cfg = tc.tiny_kfnet()
    import jax
    return cfg, kfnet.init(jax.random.key(0), cfg, image_shape)

  monkeypatch.setattr(eval_main, "load_pretrained", tiny_load)
  reports = eval_main.main([
      "--input_folder", root, "--scene", "chess",
      "--report", report_path, "--dump_dir", dump_dir,
  ])
  assert len(reports) == 1
  rep = reports[0]
  assert rep["frames"] == 4
  assert np.isfinite(rep["median_translation_m"])
  assert "median_coord_err_m" in rep  # depth present -> accuracy stats
  assert os.path.exists(report_path)
  with open(report_path) as f:
    saved = json.load(f)
  assert saved["scenes"][0]["scene"] == "chess/seq-01"
  # dumped per-frame maps
  d = np.load(os.path.join(dump_dir, "seq-01", "frame-000002.npz"))
  assert d["coords"].shape == (6, 8, 3)
  assert d["pose"].shape == (4, 4)


def test_eval_main_cli_streaming(tmp_path, monkeypatch):
  """--streaming: same CLI surface through the chunked O(chunk)-memory
  evaluator, with a chunk smaller than the sequence so the resumable-carry
  path runs; results must agree with the batch scan to compile-order
  tolerance."""
  from kfnet_tpu.eval import main as eval_main
  from kfnet_tpu.models import kfnet
  from tests import tiny_configs as tc

  root = make_fake_7scenes(str(tmp_path / "data"), n=6)

  def tiny_load(exp, image_shape, sc, of, seed=0):
    cfg = tc.tiny_kfnet()
    import jax
    return cfg, kfnet.init(jax.random.key(0), cfg, image_shape)

  monkeypatch.setattr(eval_main, "load_pretrained", tiny_load)
  common = ["--input_folder", root, "--scene", "chess"]
  rep_s = eval_main.main(common + ["--streaming", "--chunk_size", "2"])[0]
  rep_b = eval_main.main(common)[0]
  assert rep_s["frames"] == 6
  np.testing.assert_allclose(rep_s["median_coord_err_m"],
                             rep_b["median_coord_err_m"], atol=1e-4)


def test_eval_main_cli_streaming_uint8(tmp_path, monkeypatch):
  """--uint8_stream: host frames cross to the device as uint8 (cast on
  device); for 8-bit sources the re-quantization is lossless, so results
  match the batch f32 eval to compile-order tolerance."""
  from kfnet_tpu.eval import main as eval_main
  from kfnet_tpu.models import kfnet
  from tests import tiny_configs as tc

  root = make_fake_7scenes(str(tmp_path / "data"), n=6)

  def tiny_load(exp, image_shape, sc, of, seed=0):
    cfg = tc.tiny_kfnet()
    import jax
    return cfg, kfnet.init(jax.random.key(0), cfg, image_shape)

  monkeypatch.setattr(eval_main, "load_pretrained", tiny_load)
  common = ["--input_folder", root, "--scene", "chess"]
  rep_u = eval_main.main(common + ["--streaming", "--chunk_size", "2",
                                   "--uint8_stream"])[0]
  rep_b = eval_main.main(common)[0]
  assert rep_u["frames"] == 6
  np.testing.assert_allclose(rep_u["median_coord_err_m"],
                             rep_b["median_coord_err_m"], atol=1e-4)


def test_eval_main_cli_chi2_override(tmp_path, monkeypatch):
  from kfnet_tpu.eval import main as eval_main
  from kfnet_tpu.models import kfnet
  from tests import tiny_configs as tc

  root = make_fake_7scenes(str(tmp_path / "data"), n=3)
  captured = {}

  def tiny_load(exp, image_shape, sc, of, seed=0):
    cfg = tc.tiny_kfnet()
    import jax
    return cfg, kfnet.init(jax.random.key(0), cfg, image_shape)

  monkeypatch.setattr(eval_main, "load_pretrained", tiny_load)
  orig = eval_main.eval_sequence.evaluate_sequence

  def spy(params, cfg, *a, **kw):
    captured["threshold"] = cfg.chi2_threshold
    return orig(params, cfg, *a, **kw)

  monkeypatch.setattr(eval_main.eval_sequence, "evaluate_sequence", spy)
  eval_main.main(["--input_folder", root, "--scene", "chess",
                  "--chi2_threshold", "11.34"])
  assert captured["threshold"] == 11.34


def test_eval_main_kfnet_ckpt_serving_meta(tmp_path, monkeypatch):
  """--kfnet_ckpt applies the export meta's calibrated serving point
  (serving_w_scale / serving_chi2_threshold) exactly like
  pretrained.load — the shipped nonorm release serves at w_scale=2 and
  must not silently evaluate at the GN default 16. Explicit CLI flags
  still win (round-4 advisor finding)."""
  import dataclasses

  import jax

  from kfnet_tpu.eval import main as eval_main
  from kfnet_tpu.models import kfnet
  from kfnet_tpu.utils import checkpoint as ckpt_lib
  from tests import tiny_configs as tc

  root = make_fake_7scenes(str(tmp_path / "data"), n=3)
  tiny = tc.tiny_kfnet()

  orig_from_args = eval_main.config_lib.from_args

  def tiny_exp(args):
    exp = orig_from_args(args)
    return dataclasses.replace(exp, scoordnet=tiny.scoordnet,
                               oflownet=tiny.oflownet)

  monkeypatch.setattr(eval_main.config_lib, "from_args", tiny_exp)

  # a real tiny export carrying a serving point in its meta
  cfg = kfnet.KFNetConfig(scoordnet=tiny.scoordnet, oflownet=tiny.oflownet)
  params = kfnet.init(jax.random.key(0), cfg, tc.IMG)
  ckpt_dir = str(tmp_path / "kf_export")
  ckpt_lib.export_params(ckpt_dir, params,
                         meta={"serving_w_scale": 2.0,
                               "serving_chi2_threshold": 2.37})

  captured = {}
  orig_eval = eval_main.eval_sequence.evaluate_sequence

  def spy(params, cfg, *a, **kw):
    captured["w"] = cfg.w_scale
    captured["chi2"] = cfg.chi2_threshold
    return orig_eval(params, cfg, *a, **kw)

  monkeypatch.setattr(eval_main.eval_sequence, "evaluate_sequence", spy)
  base = ["--input_folder", root, "--scene", "chess",
          "--kfnet_ckpt", ckpt_dir]
  eval_main.main(base)
  assert captured == {"w": 2.0, "chi2": 2.37}
  eval_main.main(base + ["--w_scale", "5"])  # explicit flag wins
  assert captured == {"w": 5.0, "chi2": 2.37}


def test_eval_main_cli_pose_smoothing(tmp_path, monkeypatch):
  """--pose_smooth_beta: the report is recomputed from the smoothed
  trajectory (and labeled), and the dumped poses are the smoothed ones."""
  from kfnet_tpu.eval import main as eval_main
  from kfnet_tpu.models import kfnet
  from tests import tiny_configs as tc

  root = make_fake_7scenes(str(tmp_path / "data"), n=4)
  dump_raw = str(tmp_path / "dump_raw")
  dump_sm = str(tmp_path / "dump_sm")

  def tiny_load(exp, image_shape, sc, of, seed=0):
    cfg = tc.tiny_kfnet()
    import jax
    return cfg, kfnet.init(jax.random.key(0), cfg, image_shape)

  monkeypatch.setattr(eval_main, "load_pretrained", tiny_load)
  base = ["--input_folder", root, "--scene", "chess"]
  raw = eval_main.main(base + ["--dump_dir", dump_raw])
  # tiny-net poses are near-random, so the relock gate would trip every
  # frame and pass measurements through unchanged; force engagement with
  # a huge gate to test the CLI plumbing (smoothing quality itself is
  # pinned in test_pose_smoothing.py)
  sm = eval_main.main(base + ["--dump_dir", dump_sm,
                              "--pose_smooth_beta", "0.4",
                              "--pose_smooth_gate_factor", "1e9",
                              "--pose_smooth_rot_gate_deg", "1e9"])
  assert sm[0]["pose_smooth_beta"] == 0.4
  assert "pose_smooth_beta" not in raw[0]
  assert np.isfinite(sm[0]["median_translation_m"])
  assert sm[0]["frames"] == raw[0]["frames"] == 4
  # coord-accuracy stats still attach after the pose-report swap
  assert "median_coord_err_m" in sm[0]
  # dumped pose for a non-first frame differs between runs (smoothing
  # moved it), while the fused maps are identical
  p_raw = np.load(os.path.join(dump_raw, "seq-01", "frame-000002.npz"))
  p_sm = np.load(os.path.join(dump_sm, "seq-01", "frame-000002.npz"))
  np.testing.assert_allclose(p_raw["coords"], p_sm["coords"], atol=0.0)
  assert not np.allclose(p_raw["pose"], p_sm["pose"])
