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


def test_measure_chunked_matches_whole_vmap():
  """Chunked measurement (incl. padded ragged tail and a host-numpy
  input) must equal the one-shot vmap it replaced for OOM safety."""
  cfg = tc.tiny_kfnet()
  params = kfnet.init(jax.random.key(5), cfg, tc.IMG)
  imgs = tc.random_images(7, seed=11)
  ref_z, ref_V = jax.vmap(lambda i: kfnet.measure(params, cfg, i))(imgs)
  # chunk-shape vs whole-batch conv scheduling is the documented
  # compile-order variance class (~1e-5; see CLAUDE.md conventions)
  tol = dict(rtol=2e-5, atol=2e-5)
  z, V = eval_sequence.measure_chunked(params, cfg, imgs, chunk_size=3)
  np.testing.assert_allclose(np.asarray(z), np.asarray(ref_z), **tol)
  np.testing.assert_allclose(np.asarray(V), np.asarray(ref_V), **tol)
  z2, V2 = eval_sequence.measure_chunked(
      params, cfg, np.asarray(imgs), chunk_size=4)
  np.testing.assert_allclose(np.asarray(z2), np.asarray(ref_z), **tol)


def test_pose_solver_and_filter_jits_are_cached():
  """Per-sequence eval must reuse one compiled solver/filter (a fresh
  jax.jit wrapper per call recompiles every sequence)."""
  cfg = tc.tiny_kfnet()
  K = np.asarray([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32)
  rcfg = ransac.RansacConfig(num_hypotheses=16, top_k=32)
  s1 = eval_sequence.make_pose_solver(K, config=rcfg)
  s2 = eval_sequence.make_pose_solver(np.asarray(K, np.float64), config=rcfg)
  assert s1 is s2
  assert (eval_sequence._filter_run_jit(cfg)
          is eval_sequence._filter_run_jit(cfg))
