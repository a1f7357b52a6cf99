"""Dataset dispatch: one interface over 7-Scenes / 12-Scenes / Cambridge
so the train/eval CLIs take ``--dataset`` and work unchanged
(SURVEY.md §1: same per-scene train/eval surface across all three).

Each adapter yields SceneSplit-compatible objects and frame dicts with
keys image/pose[/depth].
"""

from __future__ import annotations

from typing import Callable


class DatasetAdapter:
  def __init__(self, name: str, load_split: Callable,
               load_frame: Callable, iter_sequences: Callable):
    self.name = name
    self.load_split = load_split
    self.load_frame = load_frame
    self.iter_sequences = iter_sequences


def _seven():
  from kfnet_tpu.data import seven_scenes as s7
  return DatasetAdapter("7scenes", s7.load_split, s7.load_frame,
                        s7.iter_sequences)


def _twelve():
  from kfnet_tpu.data import twelve_scenes as s12
  return DatasetAdapter("12scenes", s12.load_split, s12.load_frame,
                        s12.iter_sequences)


def _cambridge():
  from kfnet_tpu.data import cambridge as cb
  from kfnet_tpu.data import seven_scenes as s7

  def load_split(root, scene, split="train", intrinsics=None):
    if intrinsics is not None:
      raise ValueError(
          "the cambridge loader derives its working-resolution "
          "intrinsics from the full-res camera (data/cambridge.py); an "
          "override would silently disagree with the resized images — "
          "callers must not pass intrinsics for this dataset")
    sp, poses = cb.load_split(root, scene, split)
    sp._cambridge_poses = poses  # stashed for load_frame
    return sp

  def load_frame(frame, _poses_holder=[None]):
    raise RuntimeError(
        "cambridge frames need the split context; use "
        "adapter.load_frame_with_split(split, frame)")

  adapter = DatasetAdapter("cambridge", load_split, load_frame,
                           s7.iter_sequences)

  def load_frame_with_split(split_obj, frame):
    return cb.load_frame(frame, split_obj._cambridge_poses)

  adapter.load_frame_with_split = load_frame_with_split
  return adapter


_REGISTRY = {"7scenes": _seven, "12scenes": _twelve, "cambridge": _cambridge}


def get(name: str) -> DatasetAdapter:
  adapter = _REGISTRY[name]()

  if not hasattr(adapter, "load_frame_with_split"):
    adapter.load_frame_with_split = (
        lambda split_obj, frame: adapter.load_frame(frame))
  return adapter


def default_scenes(name: str) -> list[str]:
  """The dataset's canonical scene list — the correct default for any
  CLI whose --scenes flag is unset (a hard-coded 7-Scenes list would
  crash 12-Scenes/Cambridge runs on TrainSplit.txt lookups)."""
  if name == "7scenes":
    from kfnet_tpu.data.seven_scenes import SEVEN_SCENES
    return list(SEVEN_SCENES)
  if name == "12scenes":
    from kfnet_tpu.data.twelve_scenes import TWELVE_SCENES
    return list(TWELVE_SCENES)
  if name == "cambridge":
    from kfnet_tpu.data.cambridge import CAMBRIDGE_SCENES
    return list(CAMBRIDGE_SCENES)
  raise KeyError(name)
