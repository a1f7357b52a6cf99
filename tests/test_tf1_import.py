import jax
import numpy as np
import pytest

from kfnet_tpu.models import scoordnet
from kfnet_tpu.utils import tf1_import
from tests import tiny_configs as tc


def tiny_noname_cfg():
  import dataclasses
  # parity imports target the reference architecture: no norm layer (so
  # every conv has a bias) and a plain conv stem (stem_s2d=1), matching
  # scoordnet_mapping's name table and block indexing.
  return dataclasses.replace(tc.tiny_scoordnet(), norm="none", stem_s2d=1)


def test_import_flat_roundtrip():
  cfg = tiny_noname_cfg()  # 6 blocks
  params = scoordnet.init(jax.random.key(0), cfg, tc.IMG)
  mapping = tf1_import.scoordnet_mapping(num_blocks=6)
  rng = np.random.default_rng(0)
  # fabricate a TF1-style flat checkpoint with the right shapes
  flat = {}
  for name, path in mapping.items():
    node = params
    for k in path[:-1]:
      node = node[k]
    flat[name] = rng.normal(size=np.asarray(node[path[-1]]).shape).astype(
        np.float32)
  out, report = tf1_import.import_flat(flat, mapping, params)
  assert not report["missing"] and not report["mismatched"]
  np.testing.assert_array_equal(
      np.asarray(out[0][0]["w"]), flat["scoordnet/conv1/weights"])
  # original untouched (deep copy)
  assert not np.array_equal(np.asarray(params[0][0]["w"]),
                            flat["scoordnet/conv1/weights"])


def test_import_flat_strict_errors():
  cfg = tiny_noname_cfg()
  params = scoordnet.init(jax.random.key(0), cfg, tc.IMG)
  mapping = tf1_import.scoordnet_mapping(num_blocks=6)
  with pytest.raises(ValueError, match="missing"):
    tf1_import.import_flat({}, mapping, params)
  flat = {"scoordnet/conv1/weights": np.zeros((1, 1, 1, 1), np.float32)}
  with pytest.raises(ValueError, match="mismatched"):
    tf1_import.import_flat(
        flat, {"scoordnet/conv1/weights": (0, 0, "w")}, params)
