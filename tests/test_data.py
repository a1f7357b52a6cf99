import os

import jax.numpy as jnp
import numpy as np
import pytest

from kfnet_tpu.core import geometry as geo
from kfnet_tpu.data import labels, pipeline, synthetic
from kfnet_tpu.data import seven_scenes as s7


def test_synthetic_sequence_geometry_consistent():
  """Labels from rendered depth must reproject onto the pixel grid, and the
  same world point must land on matching coords across frames."""
  seq = synthetic.make_sequence(3, height=48, width=64, seed=0)
  K, poses = seq["K"], seq["poses"]
  coords, valid = labels.generate(seq["depths"][0], K, poses[0], stride=8)
  assert coords.shape == (6, 8, 3) and bool(valid.all())
  pix, z = geo.project(coords, K, poses[0])
  grid = geo.cell_center_grid(6, 8, 8)
  np.testing.assert_allclose(np.asarray(pix), np.asarray(grid), atol=1e-2)
  assert bool((z > 0).all())


def test_synthetic_multiview_consistency():
  """A scene point visible in two frames has (nearly) the same world
  coords in both frames' label maps (sphere field is static)."""
  seq = synthetic.make_sequence(2, height=96, width=128, seed=1)
  K = seq["K"]
  c0, v0 = labels.generate(seq["depths"][0], K, seq["poses"][0], stride=1)
  # project frame-0 world points into frame 1 and sample its label map.
  pix1, z1 = geo.project(c0, K, seq["poses"][1])
  c1, v1 = labels.generate(seq["depths"][1], K, seq["poses"][1], stride=1)
  ui = np.round(np.asarray(pix1[..., 0])).astype(int)
  vi = np.round(np.asarray(pix1[..., 1])).astype(int)
  ok = (ui >= 0) & (ui < 128) & (vi >= 0) & (vi < 96) & np.asarray(z1 > 0)
  a = np.asarray(c0)[ok]
  b = np.asarray(c1)[vi[ok], ui[ok]]
  # occlusion changes some matches; median agreement must be tight.
  med = np.median(np.linalg.norm(a - b, axis=-1))
  assert med < 0.05, med


def test_scene_statistics():
  coords = [np.ones((4, 4, 3), np.float32) * 2.0]
  valid = [np.ones((4, 4), bool)]
  mean, std = labels.scene_statistics(coords, valid)
  np.testing.assert_allclose(mean, [2, 2, 2], atol=1e-6)
  assert std < 1e-5


def test_labels_save_load(tmp_path):
  c = np.random.default_rng(0).normal(size=(6, 8, 3)).astype(np.float32)
  v = np.ones((6, 8), bool)
  p = str(tmp_path / "lab" / "000000.npz")
  labels.save(p, c, v)
  c2, v2 = labels.load(p)
  np.testing.assert_array_equal(c, c2)
  np.testing.assert_array_equal(v, v2)


def make_fake_7scenes(root, scene="chess", n=4):
  from PIL import Image
  rng = np.random.default_rng(0)
  sdir = os.path.join(root, scene, "seq-01")
  os.makedirs(sdir, exist_ok=True)
  with open(os.path.join(root, scene, "TrainSplit.txt"), "w") as f:
    f.write("sequence1\n")
  with open(os.path.join(root, scene, "TestSplit.txt"), "w") as f:
    f.write("sequence1\n")
  for i in range(n):
    img = (rng.uniform(0, 255, (48, 64, 3))).astype(np.uint8)
    Image.fromarray(img).save(os.path.join(sdir, f"frame-{i:06d}.color.png"))
    d = (rng.uniform(500, 4000, (48, 64))).astype(np.uint16)
    d[0, 0] = 65535
    Image.fromarray(d).save(
        os.path.join(sdir, f"frame-{i:06d}.depth.png"))
    np.savetxt(os.path.join(sdir, f"frame-{i:06d}.pose.txt"),
               np.eye(4, dtype=np.float32))
  return root


def test_seven_scenes_loader(tmp_path):
  root = make_fake_7scenes(str(tmp_path))
  split = s7.load_split(root, "chess", "train")
  assert len(split.frames) == 4
  fr = s7.load_frame(split.frames[0])
  assert fr["image"].shape == (48, 64, 3)
  assert fr["image"].max() <= 1.0
  assert fr["depth"].shape == (48, 64)
  assert fr["depth"][0, 0] == 0.0  # invalid sentinel mapped to 0
  assert 0.4 < fr["depth"][1:].max() <= 4.0  # mm → m
  seqs = list(s7.iter_sequences(split))
  assert len(seqs) == 1 and [f.index for f in seqs[0]] == [0, 1, 2, 3]


def test_pipeline_batching_and_augment(tmp_path):
  root = make_fake_7scenes(str(tmp_path), n=6)
  split = s7.load_split(root, "chess", "train")
  load_fns = [lambda fr=fr: s7.load_frame(fr) for fr in split.frames]
  aug = pipeline.AugmentConfig(crop=(32, 48), brightness=0.1, contrast=0.1)
  it = pipeline.batched(load_fns, batch_size=2, augment=aug, epochs=2,
                        to_device=False)
  batches = list(it)
  assert len(batches) == 6  # 6 examples / bs2 * 2 epochs
  b = batches[0]
  assert b["image"].shape == (2, 32, 48, 3)
  assert b["depth"].shape == (2, 32, 48)
  assert b["crop_offset"].shape == (2, 2)
  assert (b["crop_offset"] % 8 == 0).all()


def test_pipeline_propagates_worker_errors():
  def boom():
    raise RuntimeError("decode failed")
  with pytest.raises(RuntimeError, match="decode failed"):
    list(pipeline.batched([boom], batch_size=1, epochs=1, to_device=False))


def test_twelve_scenes_loader_jpg(tmp_path):
  """12-Scenes layout: nested scene dir, JPEG color, same frame triplets."""
  from PIL import Image
  from kfnet_tpu.data import twelve_scenes as s12
  rng = np.random.default_rng(0)
  sdir = os.path.join(str(tmp_path), "apt1", "kitchen", "seq-01")
  os.makedirs(sdir)
  with open(os.path.join(str(tmp_path), "apt1", "kitchen",
                         "TrainSplit.txt"), "w") as f:
    f.write("sequence1\n")
  with open(os.path.join(str(tmp_path), "apt1", "kitchen",
                         "TestSplit.txt"), "w") as f:
    f.write("sequence1\n")
  for i in range(2):
    img = rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)
    Image.fromarray(img).save(os.path.join(sdir, f"frame-{i:06d}.color.jpg"))
    d = rng.integers(500, 4000, (48, 64)).astype(np.uint16)
    Image.fromarray(d).save(
        os.path.join(sdir, f"frame-{i:06d}.depth.png"))
    np.savetxt(os.path.join(sdir, f"frame-{i:06d}.pose.txt"), np.eye(4))
  split = s12.load_split(str(tmp_path), "apt1/kitchen", "train")
  assert len(split.frames) == 2
  assert split.intrinsics[0, 0] == 572.0
  fr = s12.load_frame(split.frames[0])
  assert fr["image"].shape == (48, 64, 3)
  assert fr["depth"].shape == (48, 64)


def test_cambridge_pose_parsing(tmp_path):
  from kfnet_tpu.data import cambridge
  scene_dir = tmp_path / "KingsCollege"
  (scene_dir / "seq1").mkdir(parents=True)
  # identity w2c rotation, camera CENTER at (1, 2, 3) — the dataset file
  # stores the camera position directly (NVM export; see loader docstring)
  with open(scene_dir / "dataset_train.txt", "w") as f:
    f.write("Visual Landmark Dataset\nImageFile, Camera Position [X Y Z W P Q R]\n\n")
    f.write("seq1/frame00001.png 1.0 2.0 3.0 1.0 0.0 0.0 0.0\n")
  from PIL import Image
  Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
      scene_dir / "seq1" / "frame00001.png")
  split, poses = cambridge.load_split(str(tmp_path), "KingsCollege", "train")
  assert len(split.frames) == 1
  T = poses[split.frames[0].color_path]
  # camera-to-world translation IS the stored position
  np.testing.assert_allclose(T[:3, 3], [1, 2, 3], atol=1e-6)
  np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)


def test_cambridge_pose_rotated(tmp_path):
  """Rotated case pins the convention: T_wc[:3,3] is the raw stored
  position (the wrong -R(q)^T t reading would give a different value)."""
  from kfnet_tpu.data import cambridge
  scene_dir = tmp_path / "ShopFacade"
  (scene_dir / "seq1").mkdir(parents=True)
  # 90 deg about +z as world-to-camera: q = (cos45, 0, 0, sin45)
  s2 = np.sqrt(0.5)
  with open(scene_dir / "dataset_train.txt", "w") as f:
    f.write("header\nheader\n\n")
    f.write(f"seq1/frame00001.png 4.0 5.0 6.0 {s2} 0.0 0.0 {s2}\n")
  from PIL import Image
  Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
      scene_dir / "seq1" / "frame00001.png")
  _, poses = cambridge.load_split(str(tmp_path), "ShopFacade", "train")
  T = next(iter(poses.values()))
  np.testing.assert_allclose(T[:3, 3], [4, 5, 6], atol=1e-6)
  R_w2c = cambridge.quat_to_matrix(np.asarray([s2, 0, 0, s2]))
  np.testing.assert_allclose(T[:3, :3], R_w2c.T, atol=1e-6)
  # a world point expressed in camera frame then mapped back must match
  pw = np.asarray([1.0, -2.0, 3.0])
  pc = R_w2c @ (pw - np.asarray([4, 5, 6]))
  np.testing.assert_allclose(T[:3, :3] @ pc + T[:3, 3], pw, atol=1e-5)


def test_augment_crop_with_label_maps():
  """ADVICE r1: crop must also slice pre-generated strided label maps so
  loaders that ship coords/valid in the example stay shape-consistent."""
  rng = np.random.default_rng(3)
  H, W, s = 48, 64, 8
  img = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
  # encode the strided cell index in the label value to verify alignment
  gy, gx = np.mgrid[0:H // s, 0:W // s]
  coords = np.stack([gx, gy, gx + gy], -1).astype(np.float32)
  valid = (gx + gy) % 2 == 0
  ex = {"image": img, "coords": coords, "valid": valid,
        "image_prev": img.copy(), "coords_prev": coords.copy(),
        "valid_prev": valid.copy()}
  cfg = pipeline.AugmentConfig(crop=(32, 48), brightness=0.0, contrast=0.0)
  out = pipeline.augment_example(rng, ex, cfg, stride=s)
  assert out["image"].shape == (32, 48, 3)
  assert out["coords"].shape == (4, 6, 3)
  assert out["valid"].shape == (4, 6)
  x, y = (int(v) for v in out["crop_offset"])
  assert x % s == 0 and y % s == 0
  np.testing.assert_array_equal(
      out["coords"], coords[y // s:y // s + 4, x // s:x // s + 6])
  np.testing.assert_array_equal(
      out["valid"], valid[y // s:y // s + 4, x // s:x // s + 6])
  np.testing.assert_array_equal(out["coords_prev"], out["coords"])


def test_scene_statistics_no_valid_pixels_raises():
  with pytest.raises(ValueError, match="no valid label pixels"):
    labels.scene_statistics([np.zeros((4, 4, 3), np.float32)],
                            [np.zeros((4, 4), bool)])


def test_prefetcher_close_unblocks_producer():
  """close() must retire a producer blocked on a full queue (the normal
  early-stop case: trainer.fit breaks out of an infinite stream)."""

  def forever():
    while True:
      yield np.zeros(8, np.float32)

  pf = pipeline.Prefetcher(forever(), depth=2)
  it = iter(pf)
  next(it)
  pf.close()
  assert not pf._thread.is_alive()


def test_batched_consumer_break_retires_prefetch_thread():
  import threading

  load_fns = [lambda: {"x": np.zeros(3, np.float32)}] * 6
  before = set(threading.enumerate())
  gen = pipeline.batched(load_fns, 2, epochs=None, to_device=False)
  assert next(gen)["x"].shape == (2, 3)
  gen.close()  # finally-block must close the Prefetcher deterministically
  assert set(threading.enumerate()) == before


def test_registry_default_scenes_and_cambridge_intrinsics_guard(tmp_path):
  from kfnet_tpu.data import registry
  from kfnet_tpu.data.cambridge import CAMBRIDGE_SCENES

  assert "chess" in registry.default_scenes("7scenes")
  assert registry.default_scenes("cambridge") == list(CAMBRIDGE_SCENES)
  with pytest.raises(KeyError):
    registry.default_scenes("nope")
  adapter = registry.get("cambridge")
  with pytest.raises(ValueError, match="must not pass intrinsics"):
    adapter.load_split(str(tmp_path), "KingsCollege", "train",
                       intrinsics=np.eye(3, dtype=np.float32))


def test_window_loaders_skip_depthless_frames(tmp_path):
  """BPTT windows touching a depth-less frame (Cambridge ships many)
  must be skipped like make_pair_loaders does — not KeyError('depth')
  inside the prefetch thread."""
  import glob

  from kfnet_tpu import configs
  from kfnet_tpu.data import fixture
  from kfnet_tpu.train import train_kfnet

  fixture.write_cambridge_fixture(str(tmp_path), scenes=("KingsCollege",),
                                  train_frames=6, test_frames=2)
  exp = configs.get("cambridge", "KingsCollege",
                    input_folder=str(tmp_path))
  fns = train_kfnet.make_window_loaders(exp, ["KingsCollege"], window=3)
  assert len(fns) == 4  # 6 depth-complete frames -> 4 windows
  ex = fns[0]()
  assert ex["images"].shape[0] == 3 and ex["coords"].shape[0] == 3

  depths = sorted(glob.glob(
      os.path.join(str(tmp_path), "KingsCollege", "seq1", "*.depth.png")))
  os.remove(depths[2])  # frame 2 becomes eval-only
  fns = train_kfnet.make_window_loaders(exp, ["KingsCollege"], window=3)
  assert len(fns) == 1  # only frames 3..5 remain depth-complete

  for d in depths[:2] + depths[3:]:
    os.remove(d)
  with pytest.raises(ValueError, match="windows with depth"):
    train_kfnet.make_window_loaders(exp, ["KingsCollege"], window=3)
