"""tools/norm_summary.py — aggregation of NORM_STUDY_*.json artifacts.

The GN-vs-none doc table (docs/DESIGN.md §8 / docs/ROUND4.md) must be
mechanically derivable from the checked-in JSONs; these tests pin the
conventions: CI win/harm classification on the paired-mean CI, outdoor
20x world-scale normalization, seed labeling from ``seed_offset``, and
the fail-loud rule for scenes missing a world scale.
"""

import json

import pytest

from kfnet_tpu.tools import norm_summary


def _stat(mean, lo, hi):
  return {"delta_mean": mean, "delta_mean_ci95": [lo, hi],
          "delta_median": mean, "delta_median_ci95": [lo, hi],
          "win_frac": 0.7, "frames": 480}


def _artifact(tmp_path, name, scene, sign=-1.0, seed_offset=0, **extra):
  paired = {
      "meas_translation_none_minus_group": _stat(sign * 0.010,
                                                 sign * 0.015, sign * 0.005),
      "filt_translation_none_minus_group": _stat(sign * 0.008,
                                                 sign * 0.012, sign * 0.004),
      "meas_rotation_none_minus_group": _stat(sign * 0.30,
                                              sign * 0.40, sign * 0.20),
      "filt_rotation_none_minus_group": _stat(sign * 0.20,
                                              sign * 0.30, sign * 0.10),
  }
  art = {"scene": scene, "seed_offset": seed_offset, "test_frames": 480,
         "eval_traj_offset": 7, "paired": paired, **extra}
  path = tmp_path / name
  path.write_text(json.dumps(art))
  return str(path)


def test_rows_verdicts_and_scale(tmp_path):
  indoor = _artifact(tmp_path, "NORM_STUDY.json", "sceneA")
  outdoor = _artifact(tmp_path, "NORM_STUDY_OUTDOOR.json", "outdoor_train")
  rows = norm_summary.load_rows([indoor, outdoor])
  by_scene = {r["scene"]: r for r in rows}
  a = by_scene["sceneA"]
  assert a["seed"] == 1
  assert all(v == "win" for v in a["verdicts"].values())
  # translation cell in mm: -0.010 m -> -10.0 mm
  assert a["cells"]["meas ΔT mm"].startswith("-10.0 [")
  assert a["cells"]["meas ΔT mm"].endswith("*")
  # outdoor: same raw deltas divided by the 20x world scale -> -0.5 mm
  o = by_scene["outdoor_train"]
  assert o["cells"]["meas ΔT mm"].startswith("-0.5 [")
  # rotation is never scale-normalized
  assert o["cells"]["meas Δrot°"].startswith("-0.3 [")


def test_harm_and_seed2_labeling(tmp_path):
  f = _artifact(tmp_path, "NORM_STUDY_SCENEA_S2.json", "sceneA",
                sign=+1.0, seed_offset=1000)
  (row,) = norm_summary.load_rows([f])
  assert row["seed"] == 2
  assert all(v == "harm" for v in row["verdicts"].values())
  assert row["cells"]["filt ΔT mm"].endswith("!")


def test_neutral_straddles_zero(tmp_path):
  f = _artifact(tmp_path, "n.json", "sceneB")
  art = json.loads(open(f).read())
  art["paired"]["meas_translation_none_minus_group"] = _stat(
      0.001, -0.002, 0.004)
  open(f, "w").write(json.dumps(art))
  (row,) = norm_summary.load_rows([f])
  assert row["verdicts"]["meas ΔT mm"] == "~"
  assert row["cells"]["meas ΔT mm"].endswith("~")


def test_unknown_scene_fails_loud(tmp_path):
  f = _artifact(tmp_path, "x.json", "atrium")
  with pytest.raises(SystemExit, match="atrium"):
    norm_summary.load_rows([f])


def test_main_markdown_smoke(tmp_path, capsys):
  f = _artifact(tmp_path, "NORM_STUDY.json", "sceneA",
                perf={"group": {"fps": 419.6, "mfu": 0.515},
                      "none": {"fps": 442.4, "mfu": 0.543},
                      "none_over_group_speedup": 1.0543})
  norm_summary.main([f, "--markdown"])
  out = capsys.readouterr().out
  assert out.splitlines()[0].startswith("| scene | seed |")
  assert "4 win / 0 neutral / 0 harm of 1" not in out  # per-metric lines
  assert "meas ΔT mm: 1 win / 0 neutral / 0 harm of 1" in out
  assert "1.0543" in out


def _ws_artifact(tmp_path, name, scene, sign=-1.0, seed_offset=0):
  paired = {f"{p}_ws_minus_group": _stat(sign * 0.010, sign * 0.015,
                                         sign * 0.005)
            for p in ("meas_translation", "filt_translation",
                      "meas_rotation", "filt_rotation")}
  art = {"scene": scene, "seed_offset": seed_offset, "alt_norm": "ws",
         "test_frames": 480, "paired": paired}
  path = tmp_path / name
  path.write_text(json.dumps(art))
  return str(path)


def test_mixed_alts_rejected_without_three_way(tmp_path):
  a = _artifact(tmp_path, "NORM_STUDY.json", "sceneA")
  b = _ws_artifact(tmp_path, "NORM_STUDY_WS.json", "sceneA")
  with pytest.raises(SystemExit, match="three_way"):
    norm_summary.load_rows([a, b])


def test_three_way_merges_shared_baseline(tmp_path, capsys):
  a = _artifact(tmp_path, "NORM_STUDY.json", "sceneA")          # none wins
  b = _ws_artifact(tmp_path, "NORM_STUDY_WS.json", "sceneA",
                   sign=+1.0)                                   # ws harms
  norm_summary.main([a, b, "--three_way"])
  out = capsys.readouterr().out
  head, row = out.splitlines()[0], out.splitlines()[1]
  assert "none−group meas ΔT mm" in head and "ws−group meas ΔT mm" in head
  assert row.startswith("sceneA | 1 | -10.0 [")
  assert "+10.0 [" in row and row.rstrip().endswith("!")
  assert "none meas ΔT mm: 1 win / 0 neutral / 0 harm of 1" in out
  assert "ws meas ΔT mm: 0 win / 0 neutral / 1 harm of 1" in out


def test_three_way_missing_cell_renders_dash(tmp_path, capsys):
  a = _artifact(tmp_path, "NORM_STUDY.json", "sceneA")
  b = _ws_artifact(tmp_path, "NORM_STUDY_WS.json", "sceneB")
  norm_summary.main([a, b, "--three_way"])
  out = capsys.readouterr().out
  assert any("sceneA | 1" in l and "—" in l for l in out.splitlines())


def test_three_way_duplicate_cell_fails_loud(tmp_path):
  a = _ws_artifact(tmp_path, "a.json", "sceneA")
  b = _ws_artifact(tmp_path, "b.json", "sceneA")
  rows = norm_summary.load_rows([a, b], allow_mixed=True)
  with pytest.raises(SystemExit, match="duplicate"):
    norm_summary.three_way(rows)
