"""Loading shipped pretrained exports (SURVEY.md §2.2 #13: the reference
publishes per-scene SCoordNet / per-dataset OFlowNet / joint KFNet
checkpoints; this repo ships a protocol-trained synthetic-scene set under
``artifacts/`` and this module is the one-call loader):

    from kfnet_tpu import pretrained
    cfg, params = pretrained.load("artifacts/pretrained_synthetic")
    xs, Ps, _ = filter.sequence.run_filter(params, cfg, images)

Exports are orbax param trees plus a self-describing ``meta.json``
(scene, seed, resolution, coordinate normalization) written by
``tools/protocol.py``; nothing here regenerates training data.
"""

from __future__ import annotations

import os

import jax

from kfnet_tpu import configs
from kfnet_tpu.models import kfnet, oflownet, scoordnet
from kfnet_tpu.utils import checkpoint as ckpt_lib


def _scoordnet_config(meta) -> scoordnet.SCoordNetConfig:
  fn = (configs.full_scoordnet if meta.get("full_size")
        else configs.small_scoordnet)
  cfg = fn(tuple(meta["coord_offset"]), float(meta["coord_scale"]))
  # Pin the trunk normalization from the export's meta rather than the
  # current SCoordNetConfig default: exports written before the field
  # existed (artifacts/pretrained_synthetic) were all GroupNorm-trained,
  # so a missing field means "group" — NOT "whatever the default is now".
  import dataclasses
  return dataclasses.replace(cfg, norm=meta.get("scoordnet_norm", "group"))


def _oflownet_config(meta) -> oflownet.OFlowNetConfig:
  return (configs.full_oflownet() if meta.get("full_size")
          else configs.small_oflownet())


def _apply_serving(cfg: kfnet.KFNetConfig, meta) -> kfnet.KFNetConfig:
  """Apply the serving point recorded in the export's meta (written by
  ``tools/export_release.py --serving_*``). Weights whose calibration
  differs from the KFNetConfig defaults — e.g. ``norm="none"`` trunks
  serve at w_scale=2, not the GN default 16 (CALIBRATION.md §7) — ship
  the right point instead of relying on the user to remember it."""
  import dataclasses
  kw = {}
  if meta.get("serving_w_scale") is not None:
    kw["w_scale"] = float(meta["serving_w_scale"])
  if meta.get("serving_chi2_threshold") is not None:
    kw["chi2_threshold"] = float(meta["serving_chi2_threshold"])
  return dataclasses.replace(cfg, **kw) if kw else cfg


def _load_params_cast(path: str, template):
  """load_params honoring a release export's ``params_dtype`` (the bf16
  compact format of tools/export_release.py): restore as-saved, check the
  tree structure, cast each leaf back to the template's dtype."""
  meta = ckpt_lib.load_meta(path) or {}
  if meta.get("params_dtype") in (None, "float32"):
    return ckpt_lib.load_params(path, template=template)
  import jax.numpy as jnp
  raw = ckpt_lib.load_params_values(path)
  ref = jax.tree_util.tree_structure(template)
  got = jax.tree_util.tree_structure(raw)
  if ref != got:
    raise ValueError(f"release export at {path} does not match the "
                     f"config's param structure:\n saved: {got}\n "
                     f"want:  {ref}")
  # shape check too: an export from a different-geometry stage has the
  # SAME tree structure, and without this it would load silently and
  # fail much later inside apply with an opaque conv shape error.
  t_leaves = jax.tree_util.tree_leaves_with_path(template)
  r_leaves = jax.tree_util.tree_leaves(raw)
  bad = [f"  {jax.tree_util.keystr(kp)}: saved {tuple(x.shape)}, "
         f"want {tuple(t.shape)}"
         for (kp, t), x in zip(t_leaves, r_leaves)
         if tuple(t.shape) != tuple(x.shape)]
  if bad:
    raise ValueError(
        f"release export at {path} does not match the config's param "
        "shapes (wrong-geometry export?):\n" + "\n".join(bad[:8]) +
        ("" if len(bad) <= 8 else f"\n  … and {len(bad) - 8} more"))
  return jax.tree_util.tree_map(
      lambda t, x: jnp.asarray(x, t.dtype), template, raw)


def load(root: str, scene: str = "sceneA"):
  """Load a (KFNetConfig, params) pair from a protocol export directory.

  Prefers the joint fine-tuned ``stage3_<scene>`` export; otherwise
  composes ``stage1_<scene>`` (SCoordNet) with the ``stage2_*`` OFlowNet
  whose training-scene list covers the scene's dataset.
  """
  stage3 = os.path.join(root, f"stage3_{scene}")
  if os.path.isdir(os.path.join(stage3, "params")):
    meta = ckpt_lib.load_meta(stage3)
    if not meta or "coord_scale" not in meta:
      raise ValueError(f"{stage3}: export has no self-describing meta "
                       "(regenerate with a current tools/protocol.py)")
    cfg = _apply_serving(
        kfnet.KFNetConfig(scoordnet=_scoordnet_config(meta),
                          oflownet=_oflownet_config(meta)), meta)
    shape = (int(meta["height"]), int(meta["width"]), 3)
    template = kfnet.init(jax.random.key(0), cfg, shape)
    return cfg, _load_params_cast(stage3, template)
  return load_stage12(root, scene)


def load_stage12(root: str, scene: str = "sceneA"):
  """Compose ``stage1_<scene>`` (SCoordNet) with the matching
  ``stage2_*`` OFlowNet — the pre-fine-tune pair (also the fallback when
  no joint export exists)."""
  stage1 = os.path.join(root, f"stage1_{scene}")
  if not os.path.isdir(os.path.join(stage1, "params")):
    raise FileNotFoundError(
        f"no stage3_{scene} or stage1_{scene} export under {root!r}")
  meta1 = ckpt_lib.load_meta(stage1)
  if not meta1 or "coord_scale" not in meta1:
    raise ValueError(f"{stage1}: export has no self-describing meta")
  stage2 = None
  for name in sorted(os.listdir(root)):
    if name.startswith("stage2_") and os.path.isdir(
        os.path.join(root, name, "params")):
      stage2 = os.path.join(root, name)
      m2 = ckpt_lib.load_meta(stage2) or {}
      if scene in m2.get("scenes", []):
        break  # the OFlowNet actually trained on this scene's dataset
  if stage2 is None:
    raise FileNotFoundError(f"no stage2_* export under {root!r}")
  cfg = _apply_serving(
      kfnet.KFNetConfig(scoordnet=_scoordnet_config(meta1),
                        oflownet=_oflownet_config(meta1)), meta1)
  shape = (int(meta1["height"]), int(meta1["width"]), 3)
  template = kfnet.init(jax.random.key(0), cfg, shape)
  return cfg, {
      "scoordnet": _load_params_cast(stage1, template["scoordnet"]),
      "oflownet": _load_params_cast(stage2, template["oflownet"]),
  }
