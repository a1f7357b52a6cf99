import jax
import jax.numpy as jnp
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


def _fabricate_flat(mapping, template, seed=0):
  """TF1-style flat ckpt with shapes read off the template pytree."""
  rng = np.random.default_rng(seed)
  flat = {}
  for name, path in mapping.items():
    node = template
    for k in path[:-1]:
      node = node[k]
    flat[name] = (rng.normal(size=np.asarray(node[path[-1]]).shape)
                  .astype(np.float32) * 0.05)
  return flat


def _parity_kfnet_cfg():
  """FULL reference-parity architecture (VERDICT r1 item 5): norm="none",
  stem_s2d=1, full channel widths — the shapes a real released checkpoint
  would carry."""
  import dataclasses

  from kfnet_tpu.models import kfnet, oflownet
  return kfnet.KFNetConfig(
      scoordnet=dataclasses.replace(
          scoordnet.SCoordNetConfig(), norm="none", stem_s2d=1,
          compute_dtype="float32"),
      oflownet=dataclasses.replace(
          oflownet.OFlowNetConfig(), norm="none", stem_s2d=1,
          compute_dtype="float32"),
  )


@pytest.mark.slow
def test_import_full_parity_arch_end_to_end():
  """Synthesize a TF1-style npz for the full-width reference arch, import
  all three subsystems with the one-call helpers, and run a forward pass
  of the imported joint model — the complete import surface exercised at
  released-checkpoint scale (SURVEY.md §5 checkpoint row)."""
  from kfnet_tpu.models import kfnet

  cfg = _parity_kfnet_cfg()
  img_shape = (48, 64, 3)  # conv param shapes don't depend on resolution
  params = kfnet.init(jax.random.key(0), cfg, img_shape)

  n_blocks = len(cfg.scoordnet.channels)
  flat = _fabricate_flat(
      tf1_import.kfnet_mapping(n_blocks, len(cfg.oflownet.encoder_channels)),
      params)

  # subsystem imports (strict: every name must land)
  sc, rep = tf1_import.import_scoordnet(flat, params["scoordnet"])
  assert not rep["missing"] and not rep["mismatched"]
  of, rep = tf1_import.import_oflownet(flat, params["oflownet"])
  assert not rep["missing"] and not rep["mismatched"]
  # joint import equals the two subsystem imports
  joint, rep = tf1_import.import_kfnet(flat, params)
  assert not rep["missing"] and not rep["mismatched"]
  for a, b in zip(jax.tree_util.tree_leaves({"scoordnet": sc, "oflownet": of}),
                  jax.tree_util.tree_leaves(joint)):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
  # every mapped leaf actually changed
  changed = sum(
      not np.array_equal(np.asarray(a), np.asarray(b))
      for a, b in zip(jax.tree_util.tree_leaves(params),
                      jax.tree_util.tree_leaves(joint)))
  assert changed == len(flat)

  # forward pass of the imported model: one full filter step, finite out
  rng = np.random.default_rng(1)
  imgs = jnp.asarray(rng.uniform(0, 1, (2,) + img_shape).astype(np.float32))
  x0, P0, f0 = kfnet.first_step(joint, cfg, imgs[0])
  x1, P1, _, _ = kfnet.filter_step(joint, cfg, x0, P0, f0, imgs[1])
  assert np.isfinite(np.asarray(x1)).all()
  assert (np.asarray(P1) > 0).all()


def test_import_oflownet_tiny_roundtrip():
  """Fast-path coverage of the OFlowNet map (tiny widths)."""
  import dataclasses

  from kfnet_tpu.models import oflownet
  cfg = dataclasses.replace(tc.tiny_oflownet(), norm="none", stem_s2d=1)
  params = oflownet.init(jax.random.key(0), cfg, tc.IMG)
  mapping = tf1_import.oflownet_mapping(len(cfg.encoder_channels))
  flat = _fabricate_flat(mapping, params)
  out, rep = tf1_import.import_oflownet(flat, params)
  assert not rep["missing"] and not rep["mismatched"]
  np.testing.assert_array_equal(
      np.asarray(out["encoder"][0][0]["w"]), flat["oflownet/conv1/weights"])
  np.testing.assert_array_equal(
      np.asarray(out["head"]["b"]), flat["oflownet/flow/biases"])


def test_import_flat_unmapped_path_reported_separately():
  """A checkpoint variable whose mapped path is absent from the template
  (model-structure mismatch, e.g. biased-conv mapping vs bias-free net)
  must be reported as 'unmapped', not conflated with 'missing' (which
  means the CHECKPOINT lacks the variable)."""
  params = {"a": [{"w": np.zeros((2, 2), np.float32)}]}
  mapping = {"x/w": ("a", 0, "w"), "x/b": ("a", 0, "b")}
  flat = {"x/w": np.ones((2, 2), np.float32),
          "x/b": np.ones((2,), np.float32)}
  with pytest.raises(ValueError, match="unmapped"):
    tf1_import.import_flat(flat, mapping, params)
  out, rep = tf1_import.import_flat(flat, mapping, params, strict=False)
  assert rep["unmapped"] and not rep["missing"] and not rep["mismatched"]
  assert rep["imported"] == ["x/w"]
  np.testing.assert_array_equal(out["a"][0]["w"], flat["x/w"])
