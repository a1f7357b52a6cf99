import jax
import numpy as np

from kfnet_tpu.eval.online import OnlineRelocalizer
from kfnet_tpu.filter import sequence
from kfnet_tpu.models import kfnet
from kfnet_tpu.pose import ransac
from tests import tiny_configs as tc


def test_online_matches_offline_filter_state():
  cfg = tc.tiny_kfnet()
  params = kfnet.init(jax.random.key(5), cfg, tc.IMG)
  imgs = tc.random_images(4, seed=6)
  xs, Ps, _ = sequence.run_filter(params, cfg, imgs)

  K = np.asarray([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32)
  reloc = OnlineRelocalizer(params, cfg, K, solve_pose=False)
  for t in range(4):
    pose, info = reloc.process(np.asarray(imgs[t]))
    assert pose is None
    x, P, _ = reloc.state
    # per-frame jit vs scanned compile fuse differently: last-ulp tolerance
    np.testing.assert_allclose(np.asarray(x), np.asarray(xs[t]),
                               rtol=1e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(P), np.asarray(Ps[t]),
                               rtol=1e-5, atol=2e-5)
  assert info["frame"] == 3


def test_online_pose_and_reset():
  cfg = tc.tiny_kfnet()
  params = kfnet.init(jax.random.key(7), cfg, tc.IMG)
  imgs = tc.random_images(2, seed=8)
  K = np.asarray([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32)
  reloc = OnlineRelocalizer(
      params, cfg, K, solve_pose=True,
      ransac_config=ransac.RansacConfig(num_hypotheses=16, top_k=32))
  pose, info = reloc.process(np.asarray(imgs[0]))
  assert pose.shape == (4, 4)
  assert "inlier_ratio" in info
  reloc.reset()
  pose2, info2 = reloc.process(np.asarray(imgs[1]))
  assert info2["consistent_frac"] == 0.0  # measurement-only after reset
