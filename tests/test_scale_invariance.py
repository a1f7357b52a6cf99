"""Cambridge-scale stress property (BASELINE.json config 4): outdoor
scenes have ~30x the coordinate range of 7-Scenes. The per-scene
normalization (coord_offset/coord_scale from labels.scene_statistics)
must make training *exactly* scale-invariant: NLL(s·labels | s-scaled
config) = NLL(labels | unit config) + const, so parameter gradients are
identical. No special-cased outdoor code needed (SURVEY.md §7 hard
part 4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from kfnet_tpu.models import scoordnet
from kfnet_tpu.train import objectives
from tests import tiny_configs as tc
from tests.test_train import synth_batch


def test_gradients_invariant_to_scene_scale():
  s = 30.0
  cfg1 = tc.tiny_scoordnet()
  cfg2 = dataclasses.replace(cfg1, coord_scale=s,
                             coord_offset=(3.0 * s, -2.0 * s, 10.0 * s))
  params = scoordnet.init(jax.random.key(0), cfg1, tc.IMG)
  batch1 = synth_batch(n=2, seed=3)
  offset = jnp.asarray([3.0 * s, -2.0 * s, 10.0 * s])
  batch2 = dict(batch1)
  batch2["coords"] = batch1["coords"] * s + offset

  g1 = jax.grad(lambda p: objectives.scoordnet_objective(cfg1)(p, batch1)[0])(
      params)
  g2 = jax.grad(lambda p: objectives.scoordnet_objective(cfg2)(p, batch2)[0])(
      params)
  for a, b in zip(jax.tree_util.tree_leaves(g1),
                  jax.tree_util.tree_leaves(g2)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-6)

  # and the losses differ by exactly the 1.5·log(s²) constant
  l1 = float(objectives.scoordnet_objective(cfg1)(params, batch1)[0])
  l2 = float(objectives.scoordnet_objective(cfg2)(params, batch2)[0])
  np.testing.assert_allclose(l2 - l1, 1.5 * np.log(s * s), rtol=1e-3)
