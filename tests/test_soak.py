"""Long-stream soak (SURVEY.md §5 long-context row): the chunked
streaming path advertises "arbitrarily long videos" (filter/sequence.py);
these tests back that with a multi-thousand-frame run — bounded
covariance, zero NaN, stationary consistency fraction, flat host memory
(tools/soak.py's health criteria). The cheap tests pin the return_aux
streaming plumbing against the one-shot scan; the slow one is the actual
5,000-frame soak on a briefly-trained tiny net."""

import jax
import numpy as np
import pytest

from kfnet_tpu.filter import sequence
from kfnet_tpu.models import kfnet, oflownet
from kfnet_tpu.tools import soak
from tests import tiny_configs as tc


def test_chunked_return_aux_matches_one_shot():
  """return_aux streaming == one-shot scan: posterior chunks concatenate
  to the full-sequence outputs and the aux rows align as documented
  (first chunk: xs[1:]; later chunks: 1:1), across a ragged tail."""
  cfg = tc.tiny_kfnet()
  params = kfnet.init(jax.random.key(3), cfg, tc.IMG)
  imgs = tc.random_images(11, seed=4)
  xs_r, Ps_r, _, aux_r = sequence.run_filter(params, cfg, imgs,
                                             return_aux=True)
  outs = list(sequence.run_filter_chunked_arrays(
      params, cfg, [np.asarray(i) for i in imgs], chunk_size=4,
      return_aux=True))
  # chunks consume 5 (first incl. frame 0), 4, then a ragged tail of 2
  assert [o[0].shape[0] for o in outs] == [5, 4, 2]
  assert [o[2]["consistent"].shape[0] for o in outs] == [4, 4, 2]
  xs = np.concatenate([np.asarray(o[0]) for o in outs])
  Ps = np.concatenate([np.asarray(o[1]) for o in outs])
  # chunked vs one-shot scans compile differently: documented ~1e-5 class
  np.testing.assert_allclose(xs, np.asarray(xs_r), atol=2e-5)
  np.testing.assert_allclose(Ps, np.asarray(Ps_r), rtol=1e-5, atol=2e-5)
  cons = np.concatenate([np.asarray(o[2]["consistent"]) for o in outs])
  ref = np.asarray(aux_r["consistent"])
  assert cons.shape == ref.shape
  # the χ² gate may flip isolated borderline pixels under that wobble
  assert (cons != ref).mean() < 0.01


def test_soak_harness_mini():
  """Mechanics: device-rendered chunked frames, per-chunk device-reduced
  stats, health evaluation — at throwaway scale."""
  cfg = tc.tiny_kfnet()
  params = kfnet.init(jax.random.key(0), cfg, tc.IMG)
  rep = soak.run_soak(params, cfg, 100, 48, 64, chunk=24, log=None)
  assert rep["frames"] == 100
  assert rep["nonfinite_chunks"] == 0
  assert rep["min_P"] > 0
  assert np.isfinite(rep["max_abs_x"])
  assert soak.healthy(rep) == []


@pytest.mark.slow
def test_soak_5000_frames():
  """The actual soak: 5,000 streamed frames through a briefly-trained
  tiny net on the training scene. Health = tools/soak.healthy."""
  from tests.test_integration_e2e import make_scene_data, train_tiny_scoordnet

  data = make_scene_data()
  sc_cfg, sc_params, _ = train_tiny_scoordnet(data)
  cfg = kfnet.KFNetConfig(scoordnet=sc_cfg, oflownet=tc.tiny_oflownet())
  params = {"scoordnet": sc_params,
            "oflownet": oflownet.init(jax.random.key(1), cfg.oflownet,
                                      (48, 64, 3))}
  rep = soak.run_soak(params, cfg, 5000, 48, 64, chunk=48, seed=0,
                      log=None)
  assert rep["frames"] == 5000
  problems = soak.healthy(rep)
  assert problems == [], (problems, rep)
  # the trained gate should actually accept most pixels on its own scene
  assert rep["consistent_frac_late"] > 0.5, rep


def test_soak_short_stream_flags_missing_rss_window():
  """A stream too short to bracket a full RSS measurement window must be
  FLAGGED by healthy(), not pass the criterion vacuously (round-4
  advisor finding: rss_growth_mb silently reported 0.0)."""
  cfg = tc.tiny_kfnet()
  params = kfnet.init(jax.random.key(0), cfg, tc.IMG)
  rep = soak.run_soak(params, cfg, 20, 48, 64, chunk=24, log=None)
  assert rep["rss_growth_mb"] is None
  problems = soak.healthy(rep)
  assert any("RSS growth window absent" in p for p in problems), problems


def test_soak_empty_stream_raises():
  """frames<=0 must be a clear argument error, not an UnboundLocalError
  at the timing bookkeeping."""
  cfg = tc.tiny_kfnet()
  params = kfnet.init(jax.random.key(0), cfg, tc.IMG)
  with pytest.raises(ValueError, match="no frames"):
    soak.run_soak(params, cfg, 0, 48, 64, chunk=24, log=None)
