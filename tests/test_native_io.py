"""Native C++ data path vs the PIL/numpy reference path."""

import numpy as np
import pytest

from kfnet_tpu.data import native_io


pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native library not built")


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
  Image.fromarray(depth, mode="I;16").save(dpath)
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
