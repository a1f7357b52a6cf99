"""TF1 → JAX weight import (SURVEY.md §5 checkpoint row: "TF1→JAX
weight-name mapping table for parity runs against released ckpts").

The reference ships TF1 checkpoints (per-scene SCoordNet, per-dataset
OFlowNet — SURVEY.md §2.2 #13). TF1 conv kernels are already HWIO (same
as ours), so importing is pure name mapping + shape checking, no
transposes. The mount was empty this round, so the concrete variable
names below are the caffe-tensorflow convention this codebase family uses
(``<scope>/<layer>/weights`` / ``biases``) and are marked PROVISIONAL —
verify against the real checkpoint reader when available; the mechanism
(``import_flat``) is exact and fully tested either way.

Usage:
    flat = np.load("tf1_ckpt_as_npz.npz")        # name -> np.ndarray
    params = import_flat(flat, mapping, params_template)
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def scoordnet_mapping(num_blocks: int = 14) -> dict:
  """PROVISIONAL name map: TF1 variable name -> our param path.

  Assumes the reference-parity architecture: ``norm="none"`` (biased
  convs) and ``stem_s2d=1`` (plain conv stem, so block i is param index i).

  Our SCoordNet params are ``[block_0, ..., block_{n-1}, head_block,
  head_conv]`` with each conv block = [conv, (norm), act] sublists.
  The reference trunk convs are expected at ``scoordnet/convN/weights``.
  """
  mapping = {}
  for i in range(num_blocks):
    mapping[f"scoordnet/conv{i+1}/weights"] = (i, 0, "w")
    mapping[f"scoordnet/conv{i+1}/biases"] = (i, 0, "b")
  mapping["scoordnet/head/weights"] = (num_blocks, 0, "w")
  mapping["scoordnet/head/biases"] = (num_blocks, 0, "b")
  mapping["scoordnet/output/weights"] = (num_blocks + 1, "w")
  mapping["scoordnet/output/biases"] = (num_blocks + 1, "b")
  return mapping


def oflownet_mapping(num_encoder: int = 6) -> dict:
  """PROVISIONAL name map for OFlowNet (reference-parity arch:
  ``norm="none"``, ``stem_s2d=1``).

  Our OFlowNet params: ``encoder`` = list of conv blocks; U-Net stages
  ``enc0/down1/down2`` = serial of two conv blocks; ``up1/up0`` =
  transpose convs; ``fuse1/fuse0`` = one conv block; ``head`` = plain
  conv. TF1 names follow the same caffe-tensorflow convention as
  :func:`scoordnet_mapping` (``oflownet/<layer>/weights|biases``).
  """
  mapping = {}
  for i in range(num_encoder):
    mapping[f"oflownet/conv{i+1}/weights"] = ("encoder", i, 0, "w")
    mapping[f"oflownet/conv{i+1}/biases"] = ("encoder", i, 0, "b")
  for stage in ("enc0", "down1", "down2"):
    for j in range(2):
      mapping[f"oflownet/{stage}_{j+1}/weights"] = (stage, j, 0, "w")
      mapping[f"oflownet/{stage}_{j+1}/biases"] = (stage, j, 0, "b")
  for stage in ("up1", "up0"):  # deconv upsampling
    mapping[f"oflownet/{stage}/weights"] = (stage, "w")
    mapping[f"oflownet/{stage}/biases"] = (stage, "b")
  for stage in ("fuse1", "fuse0"):  # single conv block: conv at index 0
    mapping[f"oflownet/{stage}/weights"] = (stage, 0, "w")
    mapping[f"oflownet/{stage}/biases"] = (stage, 0, "b")
  mapping["oflownet/flow/weights"] = ("head", "w")
  mapping["oflownet/flow/biases"] = ("head", "b")
  return mapping


def kfnet_mapping(num_blocks: int = 14, num_encoder: int = 6) -> dict:
  """Joint-model map: both subsystem maps re-rooted under the combined
  pytree's ``scoordnet``/``oflownet`` keys (the reference's KFNet ckpt
  holds both subgraphs — SURVEY.md §3.5 'loads both pretrained ckpts')."""
  mapping = {}
  for name, path in scoordnet_mapping(num_blocks).items():
    mapping[name] = ("scoordnet",) + path
  for name, path in oflownet_mapping(num_encoder).items():
    mapping[name] = ("oflownet",) + path
  return mapping


def import_scoordnet(flat, template, strict: bool = True):
  """One-call import of a TF1 SCoordNet checkpoint (flat npz dict)."""
  n_blocks = _count_trunk_blocks(template)
  return import_flat(flat, scoordnet_mapping(n_blocks), template,
                     strict=strict)


def import_oflownet(flat, template, strict: bool = True):
  """One-call import of a TF1 OFlowNet checkpoint (flat npz dict)."""
  return import_flat(flat, oflownet_mapping(len(template["encoder"])),
                     template, strict=strict)


def import_kfnet(flat, template, strict: bool = True):
  """One-call import of a TF1 joint-KFNet checkpoint (flat npz dict)."""
  n_blocks = _count_trunk_blocks(template["scoordnet"])
  return import_flat(
      flat,
      kfnet_mapping(n_blocks, len(template["oflownet"]["encoder"])),
      template, strict=strict)


def _count_trunk_blocks(scoordnet_template) -> int:
  """Trunk blocks = total serial entries minus head block + head conv."""
  return len(scoordnet_template) - 2


def import_flat(flat: Mapping[str, np.ndarray], mapping: Mapping[str, tuple],
                template, strict: bool = True):
  """Copy TF1 variables into (a deep copy of) our param pytree.

  Args:
    flat: TF1 variable name -> array.
    mapping: TF1 name -> path tuple into the pytree.
    template: our params pytree (shapes define the contract).
    strict: raise on missing names or shape mismatches.

  Returns:
    new params pytree with mapped leaves replaced.
  """
  import copy
  out = copy.deepcopy(template)
  imported, missing, mismatched, unmapped = [], [], [], []
  for name, path in mapping.items():
    if name not in flat:
      missing.append(name)
      continue
    src = np.asarray(flat[name])
    node = out
    try:
      for k in path[:-1]:
        node = node[k]
      dst = node[path[-1]]
    except (KeyError, IndexError, TypeError):
      # the variable EXISTS in the checkpoint — the MODEL has no leaf at
      # the mapped path (e.g. a biased-conv mapping applied to a
      # bias-free norm="group" template). Reporting this as "missing"
      # would point the operator at the wrong artifact.
      unmapped.append(f"{name} -> {path} (no such path in template)")
      continue
    if tuple(dst.shape) != tuple(src.shape):
      mismatched.append(f"{name}: ckpt {src.shape} vs model {dst.shape}")
      continue
    node[path[-1]] = src.astype(np.asarray(dst).dtype)
    imported.append(name)
  if strict and (missing or mismatched or unmapped):
    raise ValueError(
        f"TF1 import failed: missing(ckpt lacks variable)={missing} "
        f"mismatched={mismatched} "
        f"unmapped(model lacks mapped path — wrong net config, e.g. "
        f"norm/stem mismatch)={unmapped}")
  return out, {"imported": imported, "missing": missing,
               "mismatched": mismatched, "unmapped": unmapped}
