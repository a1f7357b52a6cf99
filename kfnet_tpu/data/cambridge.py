"""Cambridge Landmarks loader (outdoor; SURVEY.md §1 "Datasets",
BASELINE.json config 4).

Disk layout (the public PoseNet release):

    <root>/<scene>/dataset_train.txt   header lines then
                                       "seqN/frameNNNNN.png tx ty tz qw qx qy qz"
    <root>/<scene>/dataset_test.txt
    <root>/<scene>/seqN/frameNNNNN.png

The pose line gives the camera **position** (center, world frame) plus a
**world-to-camera** quaternion — the file's own header reads
"ImageFile, Camera Position [X Y Z W P Q R]" (NVM/VisualSFM export), so
T_wc = [R(q)ᵀ | t] with the position used as-is, NOT -R(q)ᵀt.
Cambridge has no sensor depth; coordinate
labels come from SfM-rendered depth maps (``<stem>.depth.png``, 16-bit,
millimeters — produced by the label-generation tool) when present, mirroring
the reference's rendered-depth label workflow. Frames with no depth file are
usable for eval only.

Depth range is ~3-80 m (vs 7-Scenes' 0.5-5 m), the uncertainty-scaling
stress case called out in BASELINE.json config 4 — handled by per-scene
coord normalization (labels.scene_statistics), not special-cased code.
"""

from __future__ import annotations

import os

import numpy as np

from kfnet_tpu.data.seven_scenes import Frame, SceneSplit

CAMBRIDGE_SCENES = ("KingsCollege", "OldHospital", "ShopFacade",
                    "StMarysChurch", "GreatCourt", "Street")

# Cambridge images are 1920x1080, commonly resized so the short side is 480.
# Focal length from the SfM reconstruction, ~1670px at full res.
CAMBRIDGE_K_FULLRES = (1670.0, 1670.0, 960.0, 540.0)
CAMBRIDGE_FULLRES = (1080, 1920)  # (h, w)

# Working resolution (h, w). A plain 0.25 scale gives 480x270 — but 270
# is NOT divisible by the 8x label stride, so the 1/8-res label grid
# (floor: 33 rows) would mismatch the net's SAME-padded output grid
# (ceil: 34 rows) and crash every Cambridge train/eval path. Resize to
# 272 instead (matches utils/config.py's preset); the 0.7% vertical
# stretch is absorbed by per-axis intrinsics scaling below.
CAMBRIDGE_IMAGE_SIZE = (272, 480)


def quat_to_matrix(q: np.ndarray) -> np.ndarray:
  """(w, x, y, z) unit quaternion → 3x3 rotation."""
  w, x, y, z = q / np.linalg.norm(q)
  return np.asarray([
      [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
      [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
      [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
  ], np.float32)


def parse_dataset_file(path: str):
  """Yield (relative image path, T_wc 4x4) per entry."""
  with open(path) as f:
    lines = f.readlines()
  for line in lines:
    parts = line.strip().split()
    if len(parts) != 8 or not parts[0].lower().endswith((".png", ".jpg")):
      continue  # header / comments
    rel = parts[0]
    vals = np.asarray([float(v) for v in parts[1:]], np.float32)
    # (X Y Z) is the camera CENTER (world frame), (W P Q R) the
    # world-to-camera quaternion — see module docstring.
    center, q = vals[:3], vals[3:]
    R_w2c = quat_to_matrix(q)
    T_wc = np.eye(4, dtype=np.float32)
    T_wc[:3, :3] = R_w2c.T
    T_wc[:3, 3] = center
    yield rel, T_wc


def load_split(root: str, scene: str, split: str = "train",
               image_size: tuple[int, int] = CAMBRIDGE_IMAGE_SIZE
               ) -> tuple[SceneSplit, dict]:
  """Returns (SceneSplit, poses dict rel_path → T_wc).

  ``image_size`` is the working (h, w); intrinsics are scaled per-axis
  from the 1920x1080 originals (see CAMBRIDGE_IMAGE_SIZE).
  """
  scene_dir = os.path.join(root, scene)
  fname = "dataset_train.txt" if split == "train" else "dataset_test.txt"
  frames = []
  poses = {}
  for i, (rel, T_wc) in enumerate(
      parse_dataset_file(os.path.join(scene_dir, fname))):
    img = os.path.join(scene_dir, rel)
    stem = os.path.splitext(img)[0]
    depth = stem + ".depth.png"
    frames.append(Frame(
        color_path=img,
        depth_path=depth if os.path.exists(depth) else None,
        pose_path="",  # poses come from the dataset file, not per-frame txt
        seq=rel.split("/")[0], index=i))
    poses[img] = T_wc
  fx, fy, cx, cy = CAMBRIDGE_K_FULLRES
  th, tw = image_size
  sx = tw / CAMBRIDGE_FULLRES[1]
  sy = th / CAMBRIDGE_FULLRES[0]
  K = np.asarray([[fx * sx, 0, cx * sx], [0, fy * sy, cy * sy], [0, 0, 1]],
                 np.float32)
  return SceneSplit(scene=scene, frames=frames, intrinsics=K), poses


def load_frame(frame: Frame, poses: dict,
               image_size: tuple[int, int] = CAMBRIDGE_IMAGE_SIZE) -> dict:
  from PIL import Image
  th, tw = image_size
  img = Image.open(frame.color_path).convert("RGB")
  if (img.height, img.width) != (th, tw):
    img = img.resize((tw, th), Image.BILINEAR)
  out = {
      "image": np.asarray(img, np.float32) / 255.0,
      "pose": poses[frame.color_path],
      "seq": frame.seq,
      "index": frame.index,
  }
  if frame.depth_path:
    from kfnet_tpu.data.seven_scenes import read_depth
    d = read_depth(frame.depth_path)
    if d.shape != (th, tw):
      dd = Image.fromarray(d)
      dd = dd.resize((tw, th), Image.NEAREST)
      d = np.asarray(dd)
    out["depth"] = d
  return out
