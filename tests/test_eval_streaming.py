import jax
import numpy as np

from kfnet_tpu.eval import eval_sequence
from kfnet_tpu.models import kfnet
from kfnet_tpu.pose import ransac
from tests import tiny_configs as tc


def test_streaming_eval_matches_batch_eval():
  cfg = tc.tiny_kfnet()
  params = kfnet.init(jax.random.key(3), cfg, tc.IMG)
  imgs = tc.random_images(7, seed=9)
  K = np.asarray([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32)
  gt = np.broadcast_to(np.eye(4, dtype=np.float32), (7, 4, 4))
  rcfg = ransac.RansacConfig(num_hypotheses=16, top_k=32)

  res_b = eval_sequence.evaluate_sequence(
      params, cfg, imgs, K, gt_poses=gt, scene="s", ransac_config=rcfg,
      rng=jax.random.key(0))
  res_s = eval_sequence.evaluate_sequence_streaming(
      params, cfg, [np.asarray(im) for im in imgs], K, gt_poses=gt,
      scene="s", ransac_config=rcfg, chunk_size=3, rng=jax.random.key(0))
  assert res_s.coords.shape == res_b.coords.shape
  # filter outputs identical (PnP rngs differ, so poses may not be)
  # chunked vs one-shot scans compile differently: last-ulp tolerance
  np.testing.assert_allclose(res_s.coords, res_b.coords, atol=2e-5)
  np.testing.assert_allclose(res_s.covariance, res_b.covariance,
                             rtol=1e-5, atol=2e-5)
  assert res_s.poses.shape == (7, 4, 4)
  assert np.isfinite(res_s.report["median_translation_m"])
