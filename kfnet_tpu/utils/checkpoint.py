"""Orbax checkpoint wrapper (SURVEY.md §5 checkpoint/resume row): periodic
saves + restore-latest resume-by-step, replacing ``tf.train.Saver``."""

from __future__ import annotations

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


def load_params(path: str, template=None):
  ckptr = ocp.StandardCheckpointer()
  return ckptr.restore(os.path.abspath(path), target=template)
