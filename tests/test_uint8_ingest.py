"""Camera-origin uint8 ingestion (the host-origin serving path, SURVEY.md
§3.3: the reference fed host images every frame). uint8 frames must be
accepted by every filtering surface — one-shot scan, pipelined chunked
streamer, OnlineRelocalizer, FleetRelocalizer — kept 1 byte/channel
through the hoisted s2d stem, cast+scaled on device
(models/scoordnet.ingest), and match the equivalent f32 stream."""

import jax
import jax.numpy as jnp
import numpy as np

from kfnet_tpu.eval.online import FleetRelocalizer, OnlineRelocalizer
from kfnet_tpu.filter import sequence
from kfnet_tpu.models import kfnet, scoordnet
from tests import tiny_configs as tc


def _streams(T=6, seed=0):
  rng = np.random.default_rng(seed)
  u8 = rng.integers(0, 256, (T,) + tc.IMG, dtype=np.uint8)
  # exactly the device-side ingest arithmetic (cast, then *1/255 — NOT
  # /255, which rounds differently) so the parity check is last-ulp tight
  f32 = u8.astype(np.float32) * np.float32(1.0 / 255.0)
  return u8, f32


def test_ingest_semantics():
  u8 = jnp.arange(0, 256, 5, dtype=jnp.uint8).reshape(-1, 1)
  out = scoordnet.ingest(u8)
  assert out.dtype == jnp.float32
  assert float(out.max()) <= 1.0
  f = jnp.ones((2, 2), jnp.float32)
  assert scoordnet.ingest(f) is f  # float inputs pass through untouched


def test_run_filter_uint8_matches_f32():
  cfg = tc.tiny_kfnet()
  params = kfnet.init(jax.random.key(0), cfg, tc.IMG)
  u8, f32 = _streams()
  xs_u, Ps_u, _ = sequence.run_filter(params, cfg, jnp.asarray(u8))
  xs_f, Ps_f, _ = sequence.run_filter(params, cfg, jnp.asarray(f32))
  # same math modulo the on-device cast; documented compile-order class
  np.testing.assert_allclose(np.asarray(xs_u), np.asarray(xs_f),
                             rtol=1e-5, atol=2e-5)
  np.testing.assert_allclose(np.asarray(Ps_u), np.asarray(Ps_f),
                             rtol=1e-5, atol=2e-5)


def test_chunked_stream_uint8_and_pipelining():
  """uint8 host frames through the (software-pipelined) chunked streamer
  == the f32 one-shot scan; chunk shapes and order are unchanged by the
  one-chunk-lookahead dispatch."""
  cfg = tc.tiny_kfnet()
  params = kfnet.init(jax.random.key(1), cfg, tc.IMG)
  u8, f32 = _streams(T=11, seed=2)
  xs_ref, Ps_ref, _ = sequence.run_filter(params, cfg, jnp.asarray(f32))
  outs = list(sequence.run_filter_chunked_arrays(
      params, cfg, list(u8), chunk_size=4))
  assert [o[0].shape[0] for o in outs] == [5, 4, 2]
  xs = np.concatenate([np.asarray(o[0]) for o in outs])
  Ps = np.concatenate([np.asarray(o[1]) for o in outs])
  np.testing.assert_allclose(xs, np.asarray(xs_ref), rtol=1e-5, atol=2e-5)
  np.testing.assert_allclose(Ps, np.asarray(Ps_ref), rtol=1e-5, atol=2e-5)


def test_chunked_stream_yields_completed_chunks_before_failure():
  """The one-chunk-lookahead pipeline must not lose an already-computed
  chunk when a LATER chunk's stack/upload fails mid-stream: the pending
  chunk is yielded to the consumer before the exception propagates (a
  per-chunk logger keeps its record of the last good chunk)."""
  import pytest

  cfg = tc.tiny_kfnet()
  params = kfnet.init(jax.random.key(4), cfg, tc.IMG)
  u8, _ = _streams(T=13, seed=5)
  frames = list(u8[:12]) + [u8[12, :10]]  # 13th frame: wrong shape

  outs = []
  with pytest.raises(Exception):
    for o in sequence.run_filter_chunked_arrays(
        params, cfg, frames, chunk_size=4):
      outs.append(o)
  # chunks 0 (5 frames) and 1 (4 frames) completed before chunk 2's
  # flush hit the bad frame — both must have been delivered
  assert [o[0].shape[0] for o in outs] == [5, 4]


def test_online_and_fleet_accept_uint8():
  cfg = tc.tiny_kfnet()
  params = kfnet.init(jax.random.key(2), cfg, tc.IMG)
  u8, f32 = _streams(T=3, seed=3)
  K = np.asarray([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32)

  ru = OnlineRelocalizer(params, cfg, K, solve_pose=False)
  rf = OnlineRelocalizer(params, cfg, K, solve_pose=False)
  for t in range(3):
    _, iu = ru.process(u8[t])
    _, if_ = rf.process(f32[t])
    np.testing.assert_allclose(iu["consistent_frac"],
                               if_["consistent_frac"], atol=1e-5)
  xu, Pu, _ = ru.state
  xf, Pf, _ = rf.state
  np.testing.assert_allclose(np.asarray(xu), np.asarray(xf),
                             rtol=1e-5, atol=2e-5)
  np.testing.assert_allclose(np.asarray(Pu), np.asarray(Pf),
                             rtol=1e-5, atol=2e-5)

  fleet = FleetRelocalizer(params, cfg, K, batch_size=2, solve_pose=False)
  _, info = fleet.process(np.stack([u8[0], u8[1]]))
  assert info["consistent_frac"].shape == (2,)
  _, info = fleet.process(np.stack([u8[1], u8[2]]))
  assert np.all(np.isfinite(info["consistent_frac"]))
