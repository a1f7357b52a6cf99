"""Write procedural synthetic scenes to disk in the EXACT on-disk
layouts of the three supported datasets (SURVEY.md §1 "Datasets"):

7-Scenes (data/seven_scenes.py docstring):

    <root>/<scene>/TrainSplit.txt                 "sequence1"
    <root>/<scene>/TestSplit.txt                  "sequence2"
    <root>/<scene>/seq-01/frame-000000.color.png  8-bit RGB
    <root>/<scene>/seq-01/frame-000000.depth.png  16-bit mm (65535 invalid)
    <root>/<scene>/seq-01/frame-000000.pose.txt   4x4 camera-to-world

12-Scenes (data/twelve_scenes.py): the same frame triplets with JPEG
color, nested scene names (<building>/<room>) and the triplets one level
down under <seq>/data/.

Cambridge Landmarks (data/cambridge.py): dataset_{train,test}.txt files
with "seqN/frameNNNNN.png tx ty tz qw qx qy qz" pose lines (camera
CENTER + world-to-camera quaternion, the NVM export convention), plus
rendered-depth <stem>.depth.png label files for train frames only (test
frames are eval-only, exercising the no-depth path).

Purpose: the real-dataset acceptance path (tools/acceptance.py → train
CLIs → eval.main) must be exercisable end-to-end in CI — split parsing,
real PNG/JPEG decode (incl. the native C++ loader), pose IO — before any
real dataset exists on this machine. Frames render under the TRUE preset
camera of each dataset (7-Scenes 585/585/320/240 at 640x480, 12-Scenes
572/572/320/240, Cambridge's 1670-px-fullres intrinsics scaled to the
272x480 working resolution) so the CLIs' preset cameras are
geometrically consistent with the labels on disk.
"""

from __future__ import annotations

import os

import numpy as np

from kfnet_tpu.core import geometry as geo
from kfnet_tpu.data import synthetic

SEVEN_SCENES_HW = (480, 640)


def write_seven_scenes_fixture(root: str, scenes=("chess",),
                               train_frames: int = 8,
                               test_frames: int = 6,
                               height: int = SEVEN_SCENES_HW[0],
                               width: int = SEVEN_SCENES_HW[1],
                               seed: int = 0) -> dict:
  """Render and write one or more fixture scenes; returns the ground
  truth arrays per scene (for assertions against what loaders read back).

  seq-01 is the train split, seq-02 the test split. Depth is written in
  millimeters as 16-bit PNG; a handful of pixels are stamped 65535 to
  exercise the invalid-depth path.
  """
  from PIL import Image

  out = {}
  for si, scene in enumerate(scenes):
    scene_seed = seed + 37 * si
    sdir = os.path.join(root, scene)
    os.makedirs(sdir, exist_ok=True)
    with open(os.path.join(sdir, "TrainSplit.txt"), "w") as f:
      f.write("sequence1\n")
    with open(os.path.join(sdir, "TestSplit.txt"), "w") as f:
      f.write("sequence2\n")
    gt = {}
    for seq, n, traj_seed in (("seq-01", train_frames, scene_seed + 1),
                              ("seq-02", test_frames, scene_seed + 99)):
      # render under the exact CLI-preset camera, scaled if the fixture
      # is below full size (geometry stays consistent with the preset)
      K = np.asarray(geo.make_intrinsics(*geo.SEVEN_SCENES_K), np.float32)
      K = K * np.asarray([[width / 640.0], [height / 480.0], [1.0]],
                         np.float32)
      data = synthetic.make_sequence(
          n, height=height, width=width, seed=scene_seed,
          traj_seed=traj_seed, K=K)
      seq_dir = os.path.join(sdir, seq)
      os.makedirs(seq_dir, exist_ok=True)
      images = np.asarray(data["images"])
      depths = np.asarray(data["depths"])
      poses = np.asarray(data["poses"])
      for t in range(n):
        base = os.path.join(seq_dir, f"frame-{t:06d}")
        rgb = np.clip(images[t] * 255.0 + 0.5, 0, 255).astype(np.uint8)
        Image.fromarray(rgb).save(base + ".color.png")
        mm = np.clip(depths[t] * 1000.0 + 0.5, 0, 65000).astype(np.uint16)
        mm[:2, :2] = 65535  # invalid-depth sentinel pixels
        Image.fromarray(mm).save(base + ".depth.png")
        np.savetxt(base + ".pose.txt", poses[t], fmt="%.9f")
      gt[seq] = {"images": images, "depths": depths, "poses": poses,
                 "K": np.asarray(data["K"])}
    out[scene] = gt
  return out


def write_twelve_scenes_fixture(root: str, scenes=("apt1/kitchen",),
                                train_frames: int = 8,
                                test_frames: int = 6,
                                height: int = SEVEN_SCENES_HW[0],
                                width: int = SEVEN_SCENES_HW[1],
                                seed: int = 0) -> dict:
  """12-Scenes layout: nested <building>/<room> scene dirs, the frame
  triplets one level down under <seq>/data/, JPEG color (quality 95 —
  the returned gt images are pre-compression; compare with a lossy
  tolerance), 16-bit mm depth PNGs, per-frame pose txt. Renders under
  the 12-Scenes preset camera (572, 572, 320, 240), scaled if below
  full size."""
  from PIL import Image

  from kfnet_tpu.data import twelve_scenes as s12

  out = {}
  for si, scene in enumerate(scenes):
    scene_seed = seed + 37 * si
    sdir = os.path.join(root, scene)
    os.makedirs(sdir, exist_ok=True)
    with open(os.path.join(sdir, "TrainSplit.txt"), "w") as f:
      f.write("sequence1\n")
    with open(os.path.join(sdir, "TestSplit.txt"), "w") as f:
      f.write("sequence2\n")
    gt = {}
    for seq, n, traj_seed in (("seq-01", train_frames, scene_seed + 1),
                              ("seq-02", test_frames, scene_seed + 99)):
      K = np.asarray(geo.make_intrinsics(*s12.TWELVE_SCENES_K), np.float32)
      K = K * np.asarray([[width / 640.0], [height / 480.0], [1.0]],
                         np.float32)
      data = synthetic.make_sequence(
          n, height=height, width=width, seed=scene_seed,
          traj_seed=traj_seed, K=K)
      seq_dir = os.path.join(sdir, seq, "data")
      os.makedirs(seq_dir, exist_ok=True)
      images = np.asarray(data["images"])
      depths = np.asarray(data["depths"])
      poses = np.asarray(data["poses"])
      for t in range(n):
        base = os.path.join(seq_dir, f"frame-{t:06d}")
        rgb = np.clip(images[t] * 255.0 + 0.5, 0, 255).astype(np.uint8)
        # 4:4:4 — default 4:2:0 chroma subsampling costs ~0.75 max abs
        # error on the synthetic high-frequency texture
        Image.fromarray(rgb).save(base + ".color.jpg", quality=95,
                                  subsampling=0)
        mm = np.clip(depths[t] * 1000.0 + 0.5, 0, 65000).astype(np.uint16)
        Image.fromarray(mm).save(base + ".depth.png")
        np.savetxt(base + ".pose.txt", poses[t], fmt="%.9f")
      gt[seq] = {"images": images, "depths": depths, "poses": poses,
                 "K": np.asarray(data["K"])}
    out[scene] = gt
  return out


def _matrix_to_quat(R: np.ndarray) -> np.ndarray:
  """3x3 rotation → (w, x, y, z) unit quaternion (Shepperd's method;
  inverse of cambridge.quat_to_matrix)."""
  t = float(np.trace(R))
  if t > 0:
    s = np.sqrt(t + 1.0) * 2.0
    q = np.asarray([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                    (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
  else:
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(1.0 + R[i, i] - R[j, j] - R[k, k], 0.0)) * 2.0
    q = np.empty(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
  return (q / np.linalg.norm(q)).astype(np.float64)


def write_cambridge_fixture(root: str, scenes=("KingsCollege",),
                            train_frames: int = 8,
                            test_frames: int = 6,
                            world_scale: float = 12.0,
                            seed: int = 0) -> dict:
  """Cambridge Landmarks layout: dataset_{train,test}.txt with NVM-style
  pose lines (camera CENTER + world-to-camera quaternion), frames as
  plain PNGs under seqN/, rendered-depth <stem>.depth.png labels for
  TRAIN frames only (test frames exercise the depth-less eval-only
  path). Renders an outdoor-scale world (``world_scale``; depths stay
  under the 16-bit-mm ceiling) at the loader's 272x480 working
  resolution under its exact scaled intrinsics, so no resize happens on
  load and geometry matches the labels bit-for-bit."""
  from PIL import Image

  from kfnet_tpu.data import cambridge as cb

  height, width = cb.CAMBRIDGE_IMAGE_SIZE
  fx, fy, cx, cy = cb.CAMBRIDGE_K_FULLRES
  sx = width / cb.CAMBRIDGE_FULLRES[1]
  sy = height / cb.CAMBRIDGE_FULLRES[0]
  K = np.asarray([[fx * sx, 0, cx * sx], [0, fy * sy, cy * sy],
                  [0, 0, 1]], np.float32)

  out = {}
  for si, scene in enumerate(scenes):
    scene_seed = seed + 37 * si
    sdir = os.path.join(root, scene)
    os.makedirs(os.path.join(sdir, "seq1"), exist_ok=True)
    gt = {}
    for split, n, traj_seed in (("train", train_frames, scene_seed + 1),
                                ("test", test_frames, scene_seed + 99)):
      data = synthetic.make_sequence(
          n, height=height, width=width, seed=scene_seed,
          traj_seed=traj_seed, K=K, scale=world_scale)
      images = np.asarray(data["images"])
      depths = np.asarray(data["depths"])
      poses = np.asarray(data["poses"])
      lines = ["Visual Landmark Dataset V1",
               "ImageFile, Camera Position [X Y Z W P Q R]", ""]
      for t in range(n):
        # train/test share seq1/: test frames continue the numbering
        idx = t + (train_frames if split == "test" else 0)
        rel = f"seq1/frame{idx + 1:05d}.png"
        base = os.path.join(sdir, rel)
        rgb = np.clip(images[t] * 255.0 + 0.5, 0, 255).astype(np.uint8)
        Image.fromarray(rgb).save(base)
        if split == "train":
          mm = np.clip(depths[t] * 1000.0 + 0.5, 0,
                       65000).astype(np.uint16)
          Image.fromarray(mm).save(
              os.path.splitext(base)[0] + ".depth.png")
        center = poses[t][:3, 3]
        q = _matrix_to_quat(poses[t][:3, :3].T)  # world-to-camera
        lines.append(rel + " " + " ".join(
            f"{v:.9f}" for v in (*center, *q)))
      with open(os.path.join(sdir, f"dataset_{split}.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
      gt[split] = {"images": images, "depths": depths, "poses": poses,
                   "K": K}
    out[scene] = gt
  return out
