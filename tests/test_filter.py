import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kfnet_tpu.filter import sequence
from kfnet_tpu.models import kfnet
from tests import tiny_configs as tc


def _setup(T=5, seed=3):
  cfg = tc.tiny_kfnet()
  params = kfnet.init(jax.random.key(7), cfg, tc.IMG)
  imgs = tc.random_images(T, seed=seed)
  return cfg, params, imgs


def test_scan_matches_python_loop():
  cfg, params, imgs = _setup()
  xs_l, Ps_l = sequence.run_filter_python_loop(params, cfg, imgs)
  xs_s, Ps_s, _ = sequence.run_filter(params, cfg, imgs)
  # scan and unrolled graphs fuse differently; tolerance covers the
  # resulting last-ulp accumulation differences.
  np.testing.assert_allclose(np.asarray(xs_s), np.asarray(xs_l), atol=2e-5)
  np.testing.assert_allclose(np.asarray(Ps_s), np.asarray(Ps_l), atol=1e-5)


def test_scan_jit_compiles_and_matches():
  cfg, params, imgs = _setup()
  f = jax.jit(lambda p, im: sequence.run_filter(p, cfg, im)[:2])
  xs_j, Ps_j = f(params, imgs)
  xs_s, Ps_s, _ = sequence.run_filter(params, cfg, imgs)
  np.testing.assert_allclose(np.asarray(xs_j), np.asarray(xs_s), atol=1e-5)


def test_chunked_streaming_matches_full():
  cfg, params, imgs = _setup(T=9)
  xs_s, Ps_s, _ = sequence.run_filter(params, cfg, imgs)
  outs = list(sequence.run_filter_chunked(
      params, cfg, [np.asarray(im) for im in imgs], chunk_size=3))
  assert len(outs) == 9
  xs_c = np.stack([np.asarray(x) for x, _ in outs])
  Ps_c = np.stack([np.asarray(P) for _, P in outs])
  # 1e-5: the chunked path compiles each chunk separately (incl. the
  # first, since r2) — documented compile-order variance vs the one-scan
  # reference (CLAUDE.md conventions).
  np.testing.assert_allclose(xs_c, np.asarray(xs_s), atol=1e-5)
  np.testing.assert_allclose(Ps_c, np.asarray(Ps_s), atol=1e-5)


def test_resume_carry_matches_unbroken():
  cfg, params, imgs = _setup(T=6)
  xs_full, _, _ = sequence.run_filter(params, cfg, imgs)
  xs_a, Ps_a, carry = sequence.run_filter(params, cfg, imgs[:3])
  xs_b, _, _ = sequence.run_filter(params, cfg, imgs[3:], carry=carry)
  np.testing.assert_allclose(
      np.asarray(jnp.concatenate([xs_a, xs_b])), np.asarray(xs_full),
      atol=1e-5)


def test_batched_filter_matches_per_sequence():
  cfg, params, _ = _setup()
  imgs_a = tc.random_images(4, seed=11)
  imgs_b = tc.random_images(4, seed=12)
  xs_a, Ps_a, _ = sequence.run_filter(params, cfg, imgs_a)
  xs_b, Ps_b, _ = sequence.run_filter(params, cfg, imgs_b)
  batch = jnp.stack([imgs_a, imgs_b], axis=1)  # (T, B, H, W, 3)
  xs, Ps = sequence.run_filter_batched(params, cfg, batch)
  np.testing.assert_allclose(np.asarray(xs[:, 0]), np.asarray(xs_a),
                             atol=2e-5)
  np.testing.assert_allclose(np.asarray(xs[:, 1]), np.asarray(xs_b),
                             atol=2e-5)
  np.testing.assert_allclose(np.asarray(Ps[:, 0]), np.asarray(Ps_a),
                             atol=1e-5)


def test_filter_reduces_noise_toy():
  # With a static scene (identical frames) and zero flow the filter must
  # shrink posterior variance monotonically vs the per-frame measurement.
  cfg, params, _ = _setup()
  img = tc.random_images(1, seed=5)[0]
  imgs = jnp.stack([img] * 6)
  xs, Ps, _ = sequence.run_filter(params, cfg, imgs)
  _, V = kfnet.measure(params, cfg, img)
  # last-frame posterior var strictly below single-frame measurement var
  # wherever the consistency test kept fusing (static scene -> everywhere).
  assert float(jnp.mean(Ps[-1])) < float(jnp.mean(V))
  assert float(jnp.mean(Ps[3])) <= float(jnp.mean(Ps[1])) + 1e-6


@pytest.mark.slow
def test_long_sequence_streaming_soak():
  """O(1)-memory long-context proof (SURVEY.md §5): stream a sequence two
  orders of magnitude longer than a chunk through the chunked filter; only
  fixed-shape chunk compiles may exist, state must stay finite, and the
  posterior variance must stay in a sane band (no drift/blow-up)."""
  cfg, params, _ = _setup(T=2)
  T = 1500
  rng = np.random.default_rng(0)

  def frames():
    for _ in range(T):
      yield rng.uniform(0, 1, tc.IMG).astype(np.float32)

  n = 0
  last_P = None
  for xs, Ps in sequence.run_filter_chunked_arrays(
      params, cfg, frames(), chunk_size=16):
    n += xs.shape[0]
    last_P = Ps
  assert n == T
  P = np.asarray(last_P[-1])
  assert np.isfinite(P).all() and (P > 0).all()
  assert P.max() < 1e6  # covariance bounded after 1500 recursions
