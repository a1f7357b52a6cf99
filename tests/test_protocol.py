"""Miniature CI run of the full 3-stage protocol dress rehearsal
(VERDICT r1 items 3+8): multi-scene, held-out-scene OFlowNet transfer,
and outdoor (20x world scale) rows — the full-size artifact is produced
on TPU by `python -m kfnet_tpu.tools.protocol` (docs/PROTOCOL_REPORT.json).
"""

import numpy as np
import pytest

from kfnet_tpu.tools import protocol


@pytest.mark.slow
def test_protocol_miniature_end_to_end():
  scenes = (
      protocol.SceneSpec("sceneA", seed=0),
      protocol.SceneSpec("sceneB", seed=10),
      protocol.SceneSpec("heldout", seed=30, held_out=True),
      protocol.SceneSpec("outdoor_train", seed=50, scale=20.0,
                         dataset="outdoor"),
      protocol.SceneSpec("outdoor", seed=40, scale=20.0, dataset="outdoor",
                         held_out=True),
  )
  # joint_steps > 0 so stage 3 (joint BPTT wiring) actually executes —
  # with 0 the "3-stage" test silently covered only two stages (review r2)
  reports = protocol.run_protocol(
      H=48, W=64, train_frames=20, test_frames=12,
      sc_steps=250, of_steps=200, joint_steps=20,
      scenes=scenes, log=None, stress=0.05)
  by_name = {r["scene"]: r for r in reports}
  assert set(by_name) == {s.name for s in scenes}
  assert all(r["stress"] == 0.05 for r in reports)

  # every row is complete and finite
  for r in reports:
    for k in ("median_translation_m", "median_rotation_deg",
              "measurement_only_translation_m", "median_coord_err_m",
              "stage2_final_loss"):
      assert np.isfinite(r[k]), (r["scene"], k, r[k])

  # transfer claim: the held-out scene is filtered with an OFlowNet that
  # never saw it — and the dataset bookkeeping proves the exclusion
  ho = by_name["heldout"]
  assert ho["held_out"] and "heldout" not in ho["oflownet_trained_on"]
  out = by_name["outdoor"]
  assert "outdoor" not in out["oflownet_trained_on"]

  # outdoor rows run at ~20x coordinate scale with finite stage-2 NLL
  # (BASELINE config 4's uncertainty-scaling stress)
  assert out["world_scale"] == 20.0
  assert out["coord_scale"] > 5.0 * by_name["sceneA"]["coord_scale"]
  assert np.isfinite(out["stage2_final_loss"])
