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
  # family, different rng stream: loose band, not exact equality). The
  # band actually compares the two numbers (review r2: the old check
  # only asserted the online value was finite).
  on = float(online[0]["median_translation_m"])
  off = float(rep["median_translation_m"])
  assert np.isfinite(on) and np.isfinite(off)
  band = max(5.0 * on, 0.05)  # 5x or 5 cm, whichever is looser
  assert abs(off - on) <= band, (off, on)
  with open(report_path) as f:
    saved = json.load(f)
  assert saved["scenes"][0]["frames"] == 4


def test_eval_poses_exact_recovery_from_synthetic_dump(tmp_path):
  """Ground truth end-to-end: a dump whose coordinate maps are EXACT
  backprojections of known camera poses must be re-solved to those poses
  (sub-mm / milli-degree) by the offline tool."""
  import jax.numpy as jnp

  from kfnet_tpu.core import geometry as geo
  from kfnet_tpu.tools import eval_poses

  h, w, stride = 6, 8, 8
  K = np.asarray(geo.make_intrinsics(60.0, 60.0, 31.5, 23.5))
  grid = np.asarray(geo.cell_center_grid(h, w, stride)).reshape(-1, 2)
  rng = np.random.default_rng(7)
  dump = tmp_path / "dump"
  (dump / "seq-01").mkdir(parents=True)
  with open(dump / "meta.json", "w") as f:
    json.dump({"intrinsics": K.tolist(), "stride": stride,
               "scene": "synth"}, f)
  gts = []
  for t in range(3):
    R_wc = np.asarray(geo.axis_angle_to_matrix(
        jnp.asarray(rng.normal(size=3) * 0.2, jnp.float32)))
    t_wc = rng.normal(size=3).astype(np.float32)
    T_wc = np.asarray(geo.make_pose(jnp.asarray(R_wc), jnp.asarray(t_wc)))
    z = rng.uniform(1.0, 5.0, (h * w, 1)).astype(np.float32)
    rays = np.concatenate([(grid - K[:2, 2]) / np.diag(K)[:2],
                           np.ones((h * w, 1), np.float32)], -1)
    X = (rays * z) @ R_wc.T + t_wc  # exact world coords per cell center
    np.savez(dump / "seq-01" / f"frame-{t:06d}.npz",
             coords=X.reshape(h, w, 3).astype(np.float32),
             covariance=np.full((h, w, 1), 1e-4, np.float32),
             pose=np.eye(4, dtype=np.float32), pose_gt=T_wc)
    gts.append(T_wc)
  rep = eval_poses.main(["--dump_dir", str(dump)])[0]
  assert rep["median_translation_m"] < 1e-3, rep
  assert rep["median_rotation_deg"] < 0.05, rep
  assert rep["accuracy_5cm_5deg"] == 1.0


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


def test_eval_poses_pose_smoothing_flag(tmp_path, monkeypatch):
  """--pose_smooth_beta: the offline re-solve applies the serving
  smoother and labels the report."""
  from kfnet_tpu.tools import eval_poses

  dump_dir, _ = _make_dump(tmp_path, monkeypatch, n=4)
  raw = eval_poses.main(["--dump_dir", dump_dir])
  sm = eval_poses.main(["--dump_dir", dump_dir,
                        "--pose_smooth_beta", "0.4"])
  assert "pose_smooth_beta" not in raw[0]
  assert sm[0]["pose_smooth_beta"] == 0.4
  assert sm[0]["frames"] == raw[0]["frames"] == 4
  assert np.isfinite(sm[0]["median_translation_m"])
