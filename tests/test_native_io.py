"""Native C++ data path vs the PIL/numpy reference path."""

import numpy as np
import pytest

from kfnet_tpu.data import native_io


pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native library not built")
# NB: a broken native BUILD does not silently skip CI — see
# tests/test_native_build.py, which fails (not skips) whenever a C++
# toolchain is present but the library won't build.


def write_pngs(tmp_path):
  from PIL import Image
  rng = np.random.default_rng(0)
  color = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
  cpath = str(tmp_path / "c.png")
  Image.fromarray(color).save(cpath)
  depth = rng.integers(300, 5000, (48, 64)).astype(np.uint16)
  depth[0, :4] = 65535
  depth[1, 0] = 0
  dpath = str(tmp_path / "d.png")
  Image.fromarray(depth).save(dpath)
  return cpath, dpath, color, depth


def test_color_decode_matches_pil(tmp_path):
  cpath, _, color, _ = write_pngs(tmp_path)
  out = native_io.read_color(cpath)
  np.testing.assert_allclose(out, color.astype(np.float32) / 255.0,
                             atol=1e-7)


def test_depth_decode_matches_pil(tmp_path):
  _, dpath, _, depth = write_pngs(tmp_path)
  out = native_io.read_depth_raw(dpath)
  np.testing.assert_array_equal(out, depth)


def test_fused_labels_match_reference_path(tmp_path):
  import jax.numpy as jnp
  from kfnet_tpu.core import geometry as geo
  from kfnet_tpu.data import labels
  from kfnet_tpu.data.seven_scenes import read_depth

  _, dpath, _, _ = write_pngs(tmp_path)
  K = np.asarray(geo.make_intrinsics(*geo.SEVEN_SCENES_K))
  rngp = np.random.default_rng(1)
  w = jnp.asarray(rngp.normal(size=3).astype(np.float32)) * 0.3
  T = np.asarray(geo.make_pose(
      geo.axis_angle_to_matrix(w),
      jnp.asarray(rngp.normal(size=3).astype(np.float32))))
  c_nat, v_nat = native_io.depth_png_to_labels(dpath, K, T, stride=8)
  c_ref, v_ref = labels.generate(
      jnp.asarray(read_depth(dpath)), jnp.asarray(K), jnp.asarray(T),
      stride=8, min_depth=0.05, max_depth=20.0)
  np.testing.assert_array_equal(v_nat, np.asarray(v_ref))
  np.testing.assert_allclose(c_nat, np.asarray(c_ref), rtol=1e-5, atol=1e-5)


def _write_scene(tmp_path, n=5):
  from PIL import Image
  rng = np.random.default_rng(1)
  cpaths, dpaths, poses = [], [], []
  for i in range(n):
    color = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    cp = str(tmp_path / f"c{i}.png")
    Image.fromarray(color).save(cp)
    depth = rng.integers(300, 5000, (48, 64)).astype(np.uint16)
    depth[i % 4, :3] = 65535
    dp = str(tmp_path / f"d{i}.png")
    Image.fromarray(depth).save(dp)
    w = rng.normal(size=3) * 0.2
    import jax.numpy as jnp
    from kfnet_tpu.core import geometry as geo
    T = np.asarray(geo.make_pose(
        geo.axis_angle_to_matrix(jnp.asarray(w, jnp.float32)),
        jnp.asarray(rng.normal(size=3), jnp.float32)))
    cpaths.append(cp)
    dpaths.append(dp)
    poses.append(T)
  K = np.asarray([[60., 0, 31.5], [0, 60., 23.5], [0, 0, 1]], np.float32)
  return cpaths, dpaths, np.stack(poses), K


def test_load_batch_matches_per_frame(tmp_path):
  """kfn_load_batch (multi-threaded) ≡ per-frame native path; thread-count
  invariant; frames without depth get zeroed labels."""
  cpaths, dpaths, poses, K = _write_scene(tmp_path)
  dpaths2 = list(dpaths)
  dpaths2[2] = None  # no depth for frame 2
  out4 = native_io.load_batch(cpaths, dpaths2, poses, K,
                              width=64, height=48, num_threads=4)
  out1 = native_io.load_batch(cpaths, dpaths2, poses, K,
                              width=64, height=48, num_threads=1)
  for k in ("image", "coords", "valid"):
    np.testing.assert_array_equal(out4[k], out1[k])
  assert out4["image"].shape == (5, 48, 64, 3)
  assert out4["coords"].shape == (5, 6, 8, 3)
  assert not out4["valid"][2].any()
  for i in (0, 1, 3, 4):
    img_ref = native_io.read_color(cpaths[i])
    np.testing.assert_array_equal(out4["image"][i], img_ref)
    c_ref, v_ref = native_io.depth_png_to_labels(dpaths[i], K, poses[i])
    np.testing.assert_array_equal(out4["coords"][i], c_ref)
    np.testing.assert_array_equal(out4["valid"][i], v_ref)


def test_load_batch_error_names_frame(tmp_path):
  cpaths, dpaths, poses, K = _write_scene(tmp_path, n=3)
  cpaths[1] = str(tmp_path / "missing.png")
  with pytest.raises(ValueError, match="frame 1.*color"):
    native_io.load_batch(cpaths, dpaths, poses, K, width=64, height=48)


def test_load_batch_error_names_depth_file(tmp_path):
  """A depth-side failure must point at the DEPTH file, not the (fine)
  color file of the same frame."""
  cpaths, dpaths, poses, K = _write_scene(tmp_path, n=3)
  bad = str(tmp_path / "missing-depth.png")
  dpaths[2] = bad
  with pytest.raises(ValueError, match="frame 2.*depth"):
    native_io.load_batch(cpaths, dpaths, poses, K, width=64, height=48)


def test_batched_native_pipeline_matches_python(tmp_path):
  """pipeline.batched_native ≡ pipeline.batched over the same frames (same
  seed ⇒ same shuffle ⇒ identical batches up to f32 label math)."""
  from kfnet_tpu.data import labels, pipeline

  cpaths, dpaths, poses, K = _write_scene(tmp_path, n=6)

  def load(i):
    img = native_io.read_color(cpaths[i])
    d = native_io.read_depth_raw(dpaths[i]).astype(np.float32) * 1e-3
    d[native_io.read_depth_raw(dpaths[i]) == 65535] = 0.0
    import jax.numpy as jnp
    c, v = labels.generate(jnp.asarray(d), jnp.asarray(K),
                           jnp.asarray(poses[i]), stride=8)
    return {"image": img, "coords": np.asarray(c), "valid": np.asarray(v)}

  it_py = pipeline.batched([lambda i=i: load(i) for i in range(6)],
                           batch_size=2, seed=3, epochs=1, to_device=False)
  it_nat = pipeline.batched_native(
      cpaths, dpaths, poses, K, image_size=(48, 64), batch_size=2, seed=3,
      epochs=1, to_device=False)
  n = 0
  for b_py, b_nat in zip(it_py, it_nat):
    np.testing.assert_array_equal(b_nat["image"], b_py["image"])
    np.testing.assert_allclose(b_nat["coords"], b_py["coords"], atol=1e-5)
    np.testing.assert_array_equal(b_nat["valid"], b_py["valid"])
    n += 1
  assert n == 3
