"""Orbax checkpoint wrapper (SURVEY.md §5 checkpoint/resume row): periodic
saves + restore-latest resume-by-step, replacing ``tf.train.Saver``.

Layouts understood by :func:`load_params` (so ``--scoordnet_ckpt`` can point
at any of them):

  1. ``<path>/params`` + ``<path>/meta.json`` — an *export* written by
     :func:`export_params` (params-only, the released-weights format,
     SURVEY.md §2.2 #13).
  2. ``<path>/export/params`` — a training out_dir whose run finished and
     wrote an export subdir.
  3. ``<path>/<step>/...`` — the trainer's CheckpointManager layout
     (full TrainState); the latest step is restored template-free and its
     ``params`` sub-tree extracted.
  4. anything else — a bare ``StandardCheckpointer`` path as written by
     :func:`save_params`.

Side-band metadata (per-scene coordinate normalization etc.) travels in
``meta.json`` next to the checkpoint — see :func:`save_meta`/:func:`load_meta`.
"""

from __future__ import annotations

import json
import os

import orbax.checkpoint as ocp


class Checkpointer:
  def __init__(self, directory: str, max_to_keep: int = 3):
    self._dir = os.path.abspath(directory)
    os.makedirs(self._dir, exist_ok=True)
    options = ocp.CheckpointManagerOptions(
        max_to_keep=max_to_keep, create=True)
    self._mgr = ocp.CheckpointManager(self._dir, options=options)
    self._last_saved = -1

  def save(self, step: int, state, force: bool = False):
    # never re-save an existing step (orbax raises StepAlreadyExistsError);
    # `force` only overrides the save-interval policy, not dedup.
    if step == self._last_saved or step in self._mgr.all_steps():
      return
    self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)
    self._last_saved = step

  def restore_latest(self, template):
    step = self._mgr.latest_step()
    if step is None:
      return None
    return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

  def restore(self, step: int, template):
    return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

  def latest_step(self):
    return self._mgr.latest_step()

  def wait(self):
    self._mgr.wait_until_finished()


def save_params(path: str, params):
  """One-shot params-only save (for releasing pretrained weights, mirroring
  the reference's released per-scene checkpoints — SURVEY.md §2.2 #13)."""
  ckptr = ocp.StandardCheckpointer()
  ckptr.save(os.path.abspath(path), params)
  ckptr.wait_until_finished()


def save_meta(directory: str, meta: dict):
  """Write side-band metadata (e.g. coord_offset/coord_scale — the scene
  normalization train_scoordnet bakes into the net config) next to the
  checkpoints, so eval/fine-tune can rebuild the exact config."""
  os.makedirs(directory, exist_ok=True)
  with open(os.path.join(directory, "meta.json"), "w") as f:
    json.dump(meta, f, indent=2)


def load_meta(path: str) -> dict | None:
  """Find meta.json at ``<path>`` or ``<path>/export``; None if absent."""
  for d in (path, os.path.join(path, "export")):
    p = os.path.join(d, "meta.json")
    if os.path.exists(p):
      with open(p) as f:
        return json.load(f)
  return None


def export_params(directory: str, params, meta: dict | None = None):
  """Release-format export: params under ``<dir>/params`` + meta.json."""
  directory = os.path.abspath(directory)
  save_params(os.path.join(directory, "params"), params)
  if meta is not None:
    save_meta(directory, meta)


def load_params_values(path: str, dtype=None):
  """Template-free restore of an export's params via the checkpoint's own
  saved metadata (shape/dtype), as plain host arrays.

  Unlike ``load_params(path, template=None)`` this works across backends:
  a TPU-saved checkpoint carries device names in its saved shardings, and
  a raw template-free restore on a CPU-only host fails looking them up;
  restoring against abstract ``ShapeDtypeStruct`` targets does not.
  Used by the value-level cache manifest (tools/cache_manifest.py — the
  raw OCDBT files embed per-write UUIDs, so file hashes can never match
  across identical re-exports) and the release exporter."""
  import jax

  path = os.path.abspath(path)
  for sub in ("params", os.path.join("export", "params"), ""):
    p = os.path.join(path, sub) if sub else path
    if os.path.isdir(p) and os.path.exists(
        os.path.join(p, "_CHECKPOINT_METADATA")):
      ckptr = ocp.StandardCheckpointer()
      md = ckptr.metadata(p).item_metadata
      tree = getattr(md, "tree", md)
      # a CONCRETE local sharding (deserialization requires one; the
      # saved sharding may name devices of another backend entirely)
      sh = jax.sharding.SingleDeviceSharding(jax.devices()[0])
      target = jax.tree_util.tree_map(
          lambda m: jax.ShapeDtypeStruct(tuple(m.shape), dtype or m.dtype,
                                         sharding=sh),
          tree)
      return ckptr.restore(p, target=target)
  raise FileNotFoundError(f"no orbax export under {path!r}")


def _manager_steps(path: str):
  try:
    return sorted(int(d) for d in os.listdir(path) if d.isdigit())
  except FileNotFoundError:
    return []


def load_params(path: str, template=None):
  """Restore a params pytree from any layout in the module docstring."""
  path = os.path.abspath(path)
  for sub in ("params", os.path.join("export", "params")):
    p = os.path.join(path, sub)
    if os.path.isdir(p):
      return ocp.StandardCheckpointer().restore(p, target=template)
  steps = _manager_steps(path)
  if steps:
    mgr = ocp.CheckpointManager(path)
    # template-free: the saved item is a full TrainState whose opt_state
    # structure we don't know here; extract just the params sub-tree.
    raw = mgr.restore(steps[-1], args=ocp.args.StandardRestore())
    params = raw["params"]
    if template is not None:
      import jax
      ref = jax.tree_util.tree_structure(template)
      got = jax.tree_util.tree_structure(params)
      if ref != got:
        raise ValueError(
            f"checkpoint params at {path} (step {steps[-1]}) do not match "
            f"the template structure:\n saved: {got}\n want:  {ref}")
    return params
  return ocp.StandardCheckpointer().restore(path, target=template)
