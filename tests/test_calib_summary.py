"""tools/calib_summary.py — aggregation of calibration artifacts.

The CALIBRATION.md tables (CI-wins / harms / sum-delta per grid point
over the 24-cell design) must be mechanically derivable from the
checked-in JSONs; these tests pin the aggregation conventions: CI
classification, outdoor 20x scale normalization, and the merging of
artifacts written by calibrate.py generations that record different
no-op knob keys (alpha_max=0 / smooth_beta=0).
"""

import json

from kfnet_tpu.tools import calib_summary


def _pt(dt, lo, hi, rot=-0.01, rlo=-0.02, rhi=-0.005, **extra):
  return {"delta_translation_mean": dt,
          "delta_translation_mean_ci95": [lo, hi],
          "delta_rotation_mean": rot,
          "delta_rotation_mean_ci95": [rlo, rhi],
          "chi2_threshold": 2.37, "w_scale": 16.0, **extra}


def _artifact(tmp_path, name, scenes):
  path = tmp_path / name
  path.write_text(json.dumps({"scenes": scenes}))
  return str(path)


def test_ci_classification_and_scale_normalization(tmp_path):
  f = _artifact(tmp_path, "CALIBRATION_SWEEP_S1.json", [
      # win: CI entirely below 0
      {"scene": "sceneA", "points": [_pt(-0.010, -0.015, -0.005)]},
      # harm: CI entirely above 0
      {"scene": "heldout", "points": [_pt(0.009, 0.004, 0.014)]},
      # neutral + outdoor scale normalization (0.4 m / 20 = 20 mm)
      {"scene": "outdoor", "points": [_pt(0.400, -0.100, 0.900)]},
  ])
  rows = calib_summary.summarize(calib_summary.load_cells([f]))
  assert len(rows) == 1
  row = rows[0]
  assert (row["ci_wins"], row["neutral"], row["ci_harms"]) == (1, 1, 1)
  assert row["worst_harm_mm"] == 9.0
  assert row["worst_harm_cell"] == "SWEEP_S1/heldout"
  # sum: -10 + 9 + 20 mm
  assert abs(row["sum_delta_mm"] - 19.0) < 1e-6
  assert row["rot_wins"] == 3 and row["rot_harms"] == 0


def test_noop_knob_keys_merge_across_generations(tmp_path):
  old = _artifact(tmp_path, "old.json", [
      {"scene": "sceneA", "points": [_pt(-0.010, -0.015, -0.005)]}])
  new = _artifact(tmp_path, "new.json", [
      {"scene": "sceneA", "points": [
          _pt(-0.010, -0.015, -0.005, alpha_max=0.0, adaptive_stat="s",
              smooth_beta=0.0, base="filtered")]}])
  rows = calib_summary.summarize(calib_summary.load_cells([old, new]))
  assert len(rows) == 1 and rows[0]["cells"] == 2
  # a real smoothing point stays distinct
  sm = _artifact(tmp_path, "sm.json", [
      {"scene": "sceneA", "points": [
          _pt(-0.011, -0.016, -0.006, smooth_beta=0.4, base="filtered")]}])
  rows = calib_summary.summarize(calib_summary.load_cells([old, sm]))
  assert len(rows) == 2


def test_markdown_tables(tmp_path):
  f = _artifact(tmp_path, "CALIBRATION_SWEEP_S1.json", [
      {"scene": "sceneA", "points": [_pt(-0.010, -0.015, -0.005)]},
      {"scene": "heldout", "points": [_pt(0.009, 0.004, 0.014)]},
  ])
  cells = calib_summary.load_cells([f])
  rows = calib_summary.summarize(cells)
  md = calib_summary.summary_markdown(rows)
  assert md[0].startswith("| point |") and md[1].startswith("|---|")
  assert len(md) == 3
  # worst harm formatted as +mm; sum delta signed; rot wins/harms paired
  assert "+9.0 mm" in md[2] and "| 2 / 0 |" in md[2]
  conds, grid = calib_summary.per_cell_table(cells, "chi2=2.37,w=16")
  gmd = calib_summary.per_cell_markdown(conds, grid)
  assert gmd[0] == "| scene | SWEEP_S1 |"
  assert any(line.startswith("| heldout | +9.0!") for line in gmd)


def test_per_cell_table_marks(tmp_path):
  f = _artifact(tmp_path, "CALIBRATION_SWEEP_S2_STRESS.json", [
      {"scene": "sceneB", "points": [_pt(-0.0062, -0.013, 0.001)]}])
  cells = calib_summary.load_cells(f for f in [f])
  conds, rows = calib_summary.per_cell_table(cells, "chi2=2.37,w=16")
  assert conds == ["SWEEP_S2_STRESS"]
  assert rows["sceneB"]["SWEEP_S2_STRESS"] == "-6.2~"


def test_per_cell_point_spec_is_exact_not_subset(tmp_path):
  """'chi2=4.64,w=1' must select ONLY the plain grid point — subset
  matching used to also match every adaptive alpha_max row sharing those
  two knobs, and the table silently kept whichever iterated last."""
  scenes = [{"scene": "sceneA", "points": [
      _pt(-0.010, -0.015, -0.005) | {"chi2_threshold": 4.64, "w_scale": 1.0},
      _pt(-0.099, -0.100, -0.098, alpha_max=32.0, adaptive_stat="s")
      | {"chi2_threshold": 4.64, "w_scale": 1.0},
  ]}]
  f = _artifact(tmp_path, "CALIBRATION_ADAPTIVE_S1.json", scenes)
  cells = calib_summary.load_cells([f])
  _, rows = calib_summary.per_cell_table(cells, "chi2=4.64,w=1")
  assert rows["sceneA"]["ADAPTIVE_S1"] == "-10.0*"
  _, rows = calib_summary.per_cell_table(
      cells, "chi2=4.64,w=1,amax=32.0,stat=s")
  assert rows["sceneA"]["ADAPTIVE_S1"] == "-99.0*"
