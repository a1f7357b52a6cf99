"""Real-dataset acceptance path, exercised end-to-end against a
generated on-disk fixture in the EXACT 7-Scenes layout (real PNGs,
16-bit depth, split files, pose txt) — VERDICT r2 item 4: the one
command that must stand ready the day a dataset mount appears."""

import json
import os

import numpy as np
import pytest

from kfnet_tpu.data import fixture as fixture_lib
from kfnet_tpu.data import seven_scenes as s7


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
  root = str(tmp_path_factory.mktemp("sevenscenes"))
  gt = fixture_lib.write_seven_scenes_fixture(
      root, scenes=("chess",), train_frames=7, test_frames=6)
  return root, gt


def test_fixture_layout_and_loaders(fixture_root):
  """Split files, frame triplets, pose IO, invalid-depth sentinel — read
  back through the SAME loader stack the train/eval CLIs use."""
  root, gt = fixture_root
  train = s7.load_split(root, "chess", "train")
  test = s7.load_split(root, "chess", "test")
  assert [f.seq for f in train.frames] == ["seq-01"] * 7
  assert [f.seq for f in test.frames] == ["seq-02"] * 6
  np.testing.assert_allclose(
      train.intrinsics, gt["chess"]["seq-01"]["K"], atol=1e-5)
  fr = s7.load_frame(train.frames[3])
  assert fr["image"].shape == (480, 640, 3)
  np.testing.assert_allclose(
      fr["image"], gt["chess"]["seq-01"]["images"][3], atol=1.0 / 255)
  np.testing.assert_allclose(
      fr["pose"], gt["chess"]["seq-01"]["poses"][3], atol=1e-6)
  # depth: mm-quantized roundtrip; sentinel pixels land at exactly 0
  assert fr["depth"][0, 0] == 0.0
  valid = gt["chess"]["seq-01"]["depths"][3][2:, 2:]
  np.testing.assert_allclose(fr["depth"][2:, 2:], valid, atol=2e-3)


def test_fixture_native_loader_parity(fixture_root):
  """The native C++ PNG decoder must read the fixture files bit-exactly
  (8-bit color) / value-exactly (16-bit depth) vs the PIL path."""
  from kfnet_tpu.data import native_io
  if not native_io.available():
    pytest.skip("native library unavailable")
  root, _ = fixture_root
  split = s7.load_split(root, "chess", "train")
  fr = split.frames[0]
  a = native_io.read_color(fr.color_path)
  b = s7.read_color(fr.color_path)
  # decoded BYTES must match exactly; the [0,1] normalization differs by
  # one f32 ulp (native multiplies by 1/255, the PIL path divides)
  np.testing.assert_array_equal(np.round(a * 255).astype(np.uint8),
                                np.round(b * 255).astype(np.uint8))
  assert float(np.abs(a - b).max()) < 1e-7
  from PIL import Image
  pil_raw = np.asarray(Image.open(fr.depth_path), np.uint16)
  np.testing.assert_array_equal(
      native_io.read_depth_raw(fr.depth_path), pil_raw)


@pytest.mark.slow
def test_acceptance_runner_end_to_end(fixture_root, tmp_path):
  """tools/acceptance.py: stages 1→2→3 + filtered & measurement-only
  eval over the fixture tree, through the real CLIs, one command."""
  from kfnet_tpu.tools import acceptance

  root, _ = fixture_root
  work = str(tmp_path / "work")
  report = str(tmp_path / "ACCEPTANCE.json")
  results = acceptance.main([
      "--dataset", "7scenes", "--root", root, "--scenes", "chess",
      "--work_dir", work, "--report", report, "--net_scale", "tiny",
      "--batch_size", "2", "--sc_steps", "3", "--of_steps", "2",
      "--joint_steps", "2", "--learning_rate", "1e-4",
  ])
  row = results["scenes"]["chess"]
  for mode in ("filtered", "measurement_only"):
    assert np.isfinite(row[mode]["median_translation_m"])
    assert np.isfinite(row[mode]["median_rotation_deg"])
    assert row[mode]["sequences"][0]["frames"] == 6
  assert results["baseline"]["kfnet_paper"]["median_translation_m"] == 0.027
  with open(report) as f:
    on_disk = json.load(f)
  assert on_disk["scenes"]["chess"]["filtered"]["sequences"]
  # every stage export landed and is reusable (stage caching contract)
  for stage in ("scoordnet_chess", "oflownet_7scenes", "kfnet_chess"):
    assert os.path.isdir(os.path.join(work, stage, "export", "params"))
  # a re-run skips training (caches) and still evaluates
  results2 = acceptance.main([
      "--dataset", "7scenes", "--root", root, "--scenes", "chess",
      "--work_dir", work, "--net_scale", "tiny", "--batch_size", "2",
      "--sc_steps", "3", "--of_steps", "2", "--joint_steps", "2",
  ])
  assert np.isfinite(
      results2["scenes"]["chess"]["filtered"]["median_translation_m"])
