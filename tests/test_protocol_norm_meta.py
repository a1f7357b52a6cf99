"""Stage caches are self-describing about their trunk norm.

`prepare_stages` must trust a cache's recorded `scoordnet_norm` over the
config default (honor it when no norm is requested, refuse loudly on an
explicit mismatch) — otherwise a `norm="none"`-trained cache loaded
without the flag, or any cache evaluated after a default change, would
rebuild the wrong graph around the stored weights (flip-checklist hazard,
docs/ROUND4.md norm verdict).
"""

import pytest

from kfnet_tpu.tools import protocol

MINI = dict(H=48, W=64, train_frames=6, test_frames=4, sc_steps=2,
            of_steps=2, joint_steps=1, log=lambda *a: None)
SCENES = tuple(s for s in protocol.DEFAULT_SCENES if s.name == "sceneA")


@pytest.mark.slow
def test_cache_norm_meta_is_honored_and_guarded(tmp_path):
  d = str(tmp_path / "nonorm_cache")
  protocol.prepare_stages(work_dir=d, scenes=SCENES,
                          scoordnet_norm="none", **MINI)

  # explicit match: loads fine
  *_, joint = protocol.prepare_stages(work_dir=d, scenes=SCENES,
                                      strict_cache=True,
                                      scoordnet_norm="none", **MINI)
  assert joint["sceneA"][0].scoordnet.norm == "none"

  # no explicit request: the cache's meta wins over the config default
  *_, joint = protocol.prepare_stages(work_dir=d, scenes=SCENES,
                                      strict_cache=True, **MINI)
  assert joint["sceneA"][0].scoordnet.norm == "none"

  # explicit mismatch: refuse instead of rebuilding a different graph
  with pytest.raises(RuntimeError, match="trained with norm='none'"):
    protocol.prepare_stages(work_dir=d, scenes=SCENES, strict_cache=True,
                            scoordnet_norm="group", **MINI)
