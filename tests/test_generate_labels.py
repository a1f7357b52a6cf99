"""CLI tests for tools/generate_labels — the reference's offline label
step (SURVEY.md §2.2 #10). Covers the 7-Scenes layout AND the Cambridge
layout (registry dispatch; labels at the resized working resolution)."""

import glob
import json
import os

import numpy as np

from kfnet_tpu.data import labels
from kfnet_tpu.tools import generate_labels


def test_generate_labels_7scenes(tmp_path):
  from tests.test_data import make_fake_7scenes
  root = make_fake_7scenes(str(tmp_path / "data"))
  out = str(tmp_path / "labels")
  generate_labels.main([
      "--input_folder", root, "--output_folder", out,
      "--scene", "chess", "--split", "train"])
  with open(os.path.join(out, "stats.json")) as f:
    stats = json.load(f)
  assert stats["frames"] == 4
  files = sorted(glob.glob(os.path.join(out, "seq-01", "*.npz")))
  assert len(files) == 4
  c, v = labels.load(files[0])
  assert c.shape == (6, 8, 3) and v.shape == (6, 8)  # 48x64 / stride 8
  assert v.any()


def test_generate_labels_cambridge(tmp_path):
  """--dataset cambridge used to crash (hardwired 7-Scenes loader); it
  must go through the registry and emit labels on the (272, 480)/8 grid
  with the working-resolution intrinsics."""
  from PIL import Image
  scene = tmp_path / "KingsCollege"
  (scene / "seq1").mkdir(parents=True)
  with open(scene / "dataset_train.txt", "w") as f:
    f.write("Visual Landmark Dataset\n"
            "ImageFile, Camera Position [X Y Z W P Q R]\n\n"
            "seq1/frame00001.png 0.0 0.0 0.0 1.0 0.0 0.0 0.0\n")
  rng = np.random.default_rng(0)
  img = rng.integers(0, 255, (54, 96, 3), dtype=np.uint8)
  Image.fromarray(img).save(scene / "seq1" / "frame00001.png")
  d = rng.integers(3000, 60000, (54, 96)).astype(np.uint16)  # 3-60 m
  Image.fromarray(d).save(
      scene / "seq1" / "frame00001.depth.png")

  out = str(tmp_path / "labels")
  generate_labels.main([
      "--input_folder", str(tmp_path), "--output_folder", out,
      "--dataset", "cambridge", "--scene", "KingsCollege",
      "--split", "train"])
  with open(os.path.join(out, "stats.json")) as f:
    stats = json.load(f)
  assert stats["frames"] == 1
  files = glob.glob(os.path.join(out, "seq1", "*.npz"))
  assert len(files) == 1
  c, v = labels.load(files[0])
  # (272, 480) working res / stride 8 — BOTH dims divide exactly (the
  # old 480x270 resize left a 33-vs-34-row grid mismatch)
  assert c.shape == (34, 60, 3) and v.shape == (34, 60)
  assert v.any()
