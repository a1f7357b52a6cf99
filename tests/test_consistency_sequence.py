"""Sequence-level proof of the χ² consistency examination (paper §3.4,
SURVEY.md §1 item 3 / §3.3; VERDICT r1 "what's missing" #2).

The mechanism exists to recover from priors that disagree with the
measurement — first frame, abrupt motion, tracking failure. The round-1
suite only unit-tested it at one pixel; these tests drive the ACTUAL
filtering system (warp ∘ Kalman update inside a lax.scan) over a whole
synthetic sequence with an injected failure and assert the sequence-level
story: the mask collapses at the failure frame, the posterior falls back
to the measurement exactly there, the filter re-locks within a couple of
frames — and a filter with the test disabled stays broken for many frames.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from kfnet_tpu.core import kalman
from kfnet_tpu.core import warp as warp_lib

H, W = 6, 8
T = 30
JUMP = 15
SIGMA_Z = 0.05       # measurement noise std (V = SIGMA_Z^2)
SIGMA_W = 0.02       # process noise std (W = SIGMA_W^2)
JUMP_SIZE = 2.0      # abrupt scene-coordinate shift (≫ innovation std)


def _gt_stream(seed=0, jump_at=JUMP, jump_size=JUMP_SIZE):
  """Static per-pixel GT coordinates with an abrupt shift at ``jump_at``
  (an abrupt camera/scene jump the zero-flow process model cannot
  predict — exactly the 'tracking failure' the χ² test exists for)."""
  rng = np.random.default_rng(seed)
  g = rng.normal(size=(H, W, 3)).astype(np.float32)
  gs = np.repeat(g[None], T, axis=0)
  delta = rng.normal(size=3)
  delta = (jump_size * delta / np.linalg.norm(delta)).astype(np.float32)
  gs[jump_at:] += delta
  return jnp.asarray(gs)


def _run_filter(gs, threshold, seed=1, z_override=None):
  """The real filtering system at sequence level: prior = zero-flow warp
  of the previous posterior + W, then the fused Kalman/χ² update, scanned
  over time. Returns per-frame (x, consistent_frac, err_vs_gt, z)."""
  rng = np.random.default_rng(seed)
  noise = rng.normal(size=(T, H, W, 3)).astype(np.float32) * SIGMA_Z
  zs = gs + jnp.asarray(noise)
  if z_override is not None:
    zs = z_override(zs)
  V = jnp.full((H, W, 1), SIGMA_Z ** 2, jnp.float32)
  Wn = jnp.full((H, W, 1), SIGMA_W ** 2, jnp.float32)
  zero_flow = jnp.zeros((H, W, 2), jnp.float32)

  def step(c, z):
    x, P = c
    x_pr, P_pr, _ = warp_lib.warp_state_cov(x, P, zero_flow, Wn)
    x1, P1, consistent = kalman.kalman_update(
        x_pr, P_pr, z, V, threshold=threshold)
    return (x1, P1), (x1, consistent)

  (xf, Pf), (xs, cons) = jax.lax.scan(step, (zs[0], V), zs[1:])
  xs = jnp.concatenate([zs[0][None], xs], 0)
  cons = jnp.concatenate([jnp.ones((1, H, W, 1), bool), cons], 0)
  err = jnp.linalg.norm(xs - gs, axis=-1).mean(axis=(1, 2))
  return np.asarray(xs), np.asarray(cons), np.asarray(err), np.asarray(zs)


def test_chi2_detects_jump_and_relocks():
  gs = _gt_stream()
  xs, cons, err, zs = _run_filter(gs, threshold=kalman.CHI2_3DOF_P05)

  frac = cons.mean(axis=(1, 2, 3))
  # mask collapses exactly at the jump frame...
  assert frac[JUMP] < 0.05, f"mask did not collapse at jump: {frac[JUMP]}"
  # ...and only there: healthy frames stay overwhelmingly consistent
  healthy = np.r_[frac[2:JUMP], frac[JUMP + 2:]]
  assert healthy.min() > 0.9, f"false resets on healthy frames: {healthy.min()}"

  # failing pixels fall back to the measurement EXACTLY (K → 1)
  bad = ~cons[JUMP][..., 0]
  np.testing.assert_array_equal(xs[JUMP][bad], zs[JUMP][bad])

  # error at the jump frame ≈ single-measurement error, then re-locks to
  # fused accuracy within 2 frames
  assert err[JUMP] < 2.0 * SIGMA_Z * np.sqrt(3)
  assert err[JUMP + 2:].max() < 1.2 * err[:JUMP].max()


def test_disabled_chi2_stays_broken():
  """Ablation the paper's mechanism is defined against: same sequence,
  threshold = ∞ (no consistency reset) → the stale prior drags the
  posterior for many frames after the jump."""
  gs = _gt_stream()
  _, _, err_on, _ = _run_filter(gs, threshold=kalman.CHI2_3DOF_P05)
  _, cons_off, err_off, _ = _run_filter(gs, threshold=1e12)

  assert cons_off.all(), "threshold=inf must never reset"
  # 4 frames after the jump the no-reset filter is still far off while the
  # real filter has re-locked
  k = JUMP + 4
  assert err_off[k] > 5.0 * err_on[k], (err_off[k], err_on[k])
  assert err_off[JUMP:k + 1].min() > 0.1  # broken the whole window
  # before the jump both filters track at fused accuracy (the p=0.05 test
  # fires on ~5% of healthy pixels by design, so they differ slightly but
  # both stay at the noise floor)
  assert err_on[2:JUMP].max() < 2.0 * SIGMA_Z
  assert err_off[2:JUMP].max() < 2.0 * SIGMA_Z


def test_chi2_survives_measurement_corruption():
  """Second failure mode (VERDICT r1): heavy measurement corruption for a
  few frames. The χ² test fires (innovation huge), the posterior takes the
  corrupt measurement per the paper's K→1 fallback — but the filter must
  re-lock within a frame of the corruption ending instead of dragging the
  corrupt state forward."""
  gs = _gt_stream(jump_size=0.0)  # no scene jump this time
  CORRUPT = slice(JUMP, JUMP + 3)

  def corrupt(zs):
    zs = np.asarray(zs).copy()
    zs[CORRUPT] += 50.0  # gross outlier burst
    return jnp.asarray(zs)

  xs, cons, err, _ = _run_filter(gs, threshold=kalman.CHI2_3DOF_P05,
                                 z_override=corrupt)
  frac = cons.mean(axis=(1, 2, 3))
  assert frac[JUMP] < 0.05  # corruption onset detected
  # within 2 frames of the corruption ending, the filter is back to fused
  # accuracy and never diverges afterwards
  after = JUMP + 3 + 2
  assert err[after:].max() < 1.2 * err[:JUMP].max()
  assert np.isfinite(err).all()


def test_full_filter_step_resets_on_jump():
  """Same story through kfnet.filter_step (the real model code path, tiny
  untrained nets): inject an absurd prior into the carry and assert the
  χ² reset makes the posterior equal the measurement everywhere."""
  from kfnet_tpu.models import kfnet
  from tests import tiny_configs as tc

  cfg = tc.tiny_kfnet()
  params = kfnet.init(jax.random.key(0), cfg, tc.IMG)
  imgs = tc.random_images(2)
  pre = kfnet.preprocess_images(cfg, imgs)
  x0, P0, feat0 = kfnet.first_step(params, cfg, pre[0])
  # teleported prior: state off by 1e3 with confident (small) covariance
  x_bad = x0 + 1e3
  P_tight = jnp.full_like(P0, 1e-6)
  x1, P1, _, aux = kfnet.filter_step(params, cfg, x_bad, P_tight, feat0,
                                     pre[1])
  # pixels whose warp footprint is valid carry the confident-but-wrong
  # prior → the χ² test MUST fire there and the posterior equals z exactly.
  # Border pixels with invalid footprints get the huge-covariance sentinel
  # instead (K→1 by arithmetic), so they may read "consistent" — but their
  # posterior is still ≈ z. Both routes recover; only the valid ones are
  # the χ² mechanism's job.
  from kfnet_tpu.core import warp as warp_lib
  _, _, valid = warp_lib.warp_state_cov(
      x_bad, P_tight, aux["flow"], aux["W"], invalid_cov=cfg.invalid_cov)
  v = np.asarray(valid).astype(bool).reshape(-1)
  cons = np.asarray(aux["consistent"]).reshape(-1)
  assert v.any() and not cons[v].any()
  x1f = np.asarray(x1).reshape(-1, 3)
  zf = np.asarray(aux["z"]).reshape(-1, 3)
  np.testing.assert_array_equal(x1f[v], zf[v])
  np.testing.assert_allclose(x1f, zf, atol=1e-2)  # sentinel route too
  P1f = np.asarray(P1).reshape(-1)
  Vf = np.asarray(aux["V"]).reshape(-1)
  np.testing.assert_array_equal(P1f[v], Vf[v])
