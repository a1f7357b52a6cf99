"""Write a procedural synthetic scene to disk in the EXACT 7-Scenes
layout (SURVEY.md §1 "Datasets"; data/seven_scenes.py docstring):

    <root>/<scene>/TrainSplit.txt                 "sequence1"
    <root>/<scene>/TestSplit.txt                  "sequence2"
    <root>/<scene>/seq-01/frame-000000.color.png  8-bit RGB
    <root>/<scene>/seq-01/frame-000000.depth.png  16-bit mm (65535 invalid)
    <root>/<scene>/seq-01/frame-000000.pose.txt   4x4 camera-to-world

Purpose: the real-dataset acceptance path (tools/acceptance.py → train
CLIs → eval.main) must be exercisable end-to-end in CI — split parsing,
real PNG decode (incl. the native C++ loader), pose IO — before any real
dataset exists on this machine. Frames render at TRUE 640x480 with the
TRUE 7-Scenes intrinsics (585, 585, 320, 240) so the preset camera used
by the CLIs is geometrically consistent with the labels on disk.
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
        Image.fromarray(mm, mode="I;16").save(base + ".depth.png")
        np.savetxt(base + ".pose.txt", poses[t], fmt="%.9f")
      gt[seq] = {"images": images, "depths": depths, "poses": poses,
                 "K": np.asarray(data["K"])}
    out[scene] = gt
  return out
