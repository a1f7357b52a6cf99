"""KFNet — the combined measurement + process + filtering system
(paper §3; SURVEY.md §2.2 #7–#9, call stack §3.3).

One *filter step* fuses, entirely on device:
  OFlowNet (flow, W) → warp of (x, P) → SCoordNet (z, V) → Kalman update
  with χ² consistency reset.

The reference runs this step as one ``session.run`` per frame with the
state round-tripping through host numpy (its structural bottleneck,
SURVEY.md §3.3). Here the step is a pure function of
(params, carry, frame) so ``filter/sequence.py`` can drive the whole
sequence inside a single ``lax.scan`` with the carry donated and
HBM-resident; the warp∘gain∘update inner piece can optionally run as the
fused Pallas kernel (``kernels/fused_filter.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from kfnet_tpu.core import kalman
from kfnet_tpu.core import warp as warp_lib
from kfnet_tpu.kernels.cost_volume import cost_volume
from kfnet_tpu.models import oflownet, scoordnet


@dataclasses.dataclass(frozen=True)
class KFNetConfig:
  """Filter configuration.

  The chi2_threshold / w_scale DEFAULTS are the round-3 calibrated
  SERVING point (χ²₃ p=0.5 gate + 16x process-noise temperature),
  selected on a 24-cell grid study — 2 seeds x clean/stressed x 6
  scenes, 480 paired frames each, moving-block-bootstrap CIs
  (docs/CALIBRATION.md): vs the paper's (p=0.05, 1x) it removes every
  catastrophic clean-stream harm (worst CI-harm +361 mm → +9 mm) while
  keeping all stressed and outdoor filtering wins. The paper's raw
  dynamics remain available (chi2_threshold=kalman.CHI2_3DOF_P05,
  w_scale=1.0) and are what the TRAINING objectives always use
  (train/objectives.py pins them so stage-3 fine-tuning matches the
  recipe the calibration was validated on).
  """
  scoordnet: scoordnet.SCoordNetConfig = scoordnet.SCoordNetConfig()
  oflownet: oflownet.OFlowNetConfig = oflownet.OFlowNetConfig()
  chi2_threshold: float = kalman.CHI2_3DOF_P50
  invalid_cov: float = 1e8
  use_pallas: bool = False  # fused warp+update kernel (TPU only)
  # Process-noise temperature: W ← w_scale·W before the prior covariance
  # update. A frozen OFlowNet's W is calibrated on its TRAINING scenes'
  # NLL; on unseen scenes it is overconfident (W too small → the prior
  # out-weighs the measurement it should defer to — the round-2 held-out
  # transfer regression). w_scale > 1 restores calibration without
  # touching weights (grid evidence above; per-scene refits via
  # tools/calibrate.py use TRAIN data only, never test).
  w_scale: float = 16.0
  # Innovation-adaptive prior inflation (classic IAE / covariance-
  # matching adaptive Kalman): per frame, the clipped-mean Mahalanobis
  # statistic m̄ of the innovation under S = P⁻+V has expectation 3 (dof)
  # when the filter is calibrated; m̄ > 3 ⇒ the prior is overconfident
  # (the transfer failure mode), so P⁻ inflates by α = clip(m̄/3, 1,
  # adaptive_alpha_max) before the gain. m̄ averages over WARP-VALID
  # pixels only: out-of-bounds pixels carry P⁻ = invalid_cov, so their
  # maha ≈ 0 and an unmasked mean dilutes the statistic exactly in the
  # high-motion frames adaptation exists for. Scene-agnostic, no
  # fitting. Values <= 1 disable (α ≡ 1; a cap of exactly 1 cannot
  # inflate); values in (0, 1) are rejected as a likely misread of the
  # knob. When enabled (> 1) the XLA composition runs even if
  # use_pallas=True (α needs a global reduction between warp and update,
  # which would break the fused kernel's single-pass model; the kernel's
  # e2e edge is ~4%, correctness wins).
  adaptive_alpha_max: float = 0.0

  def __post_init__(self):
    a = self.adaptive_alpha_max
    if 0.0 < a < 1.0:
      raise ValueError(
          f"adaptive_alpha_max={a}: an inflation CAP below 1 cannot "
          "inflate — use 0 (off) or a value > 1")


def init(key: jax.Array, config: KFNetConfig,
         image_shape: Tuple[int, int, int] = (480, 640, 3)):
  k1, k2 = jax.random.split(key)
  return {
      "scoordnet": scoordnet.init(k1, config.scoordnet, image_shape),
      "oflownet": oflownet.init(k2, config.oflownet, image_shape),
  }


def preprocess_images(config: KFNetConfig, images: jnp.ndarray):
  """Hoistable stem: when both subnets share the same space-to-depth
  factor, apply it ONCE to a whole (T, ..., H, W, 3) stack — the scan in
  filter/sequence.py then carries pre-transformed frames, saving the
  per-step transpose (~0.4 ms/step measured)."""
  if config.scoordnet.stem_s2d == config.oflownet.stem_s2d:
    # one shared guard+apply implementation (raw-RGB check included):
    # scoordnet.maybe_space_to_depth
    return scoordnet.maybe_space_to_depth(config.scoordnet, images)
  return images


def measure(params, config: KFNetConfig, image: jnp.ndarray):
  """SCoordNet measurement: (..., H, W, 3) image -> (z, V) at 1/8 res."""
  return scoordnet.apply(params["scoordnet"], config.scoordnet, image)


def encode(params, config: KFNetConfig, image: jnp.ndarray):
  """OFlowNet encoder features for one frame (carried across the scan so
  each frame is encoded exactly once)."""
  return oflownet.encode(params["oflownet"], config.oflownet, image)


def flow_from_features(params, config: KFNetConfig, feat_prev, feat_cur):
  cv = cost_volume(feat_prev, feat_cur, config.oflownet.search_radius)
  flow, W = oflownet.decode(params["oflownet"], config.oflownet, cv)
  if config.w_scale != 1.0:
    W = W * config.w_scale  # see KFNetConfig.w_scale (calibration knob)
  return flow, W


def _fused_update(config: KFNetConfig, x_prev, P_prev, flow, W, z, V):
  """warp ∘ gain ∘ innovation ∘ update — XLA composition or Pallas kernel.

  Returns (x_post, P_post, consistent, prior) where prior is
  (x_prior, P_prior) on the XLA path (needed by the joint training loss)
  and None on the Pallas fast path (prior never materializes in HBM).
  """
  # The Pallas kernel's bounded-flow warp requires |flow| <= radius (its
  # gather window); the model's tanh head guarantees it, but clamp here
  # so BOTH paths see identical flow for any out-of-contract caller —
  # otherwise the kernel would silently clip while the XLA composition
  # warps the raw value, and the two paths (and the custom VJP, which
  # rematerializes the XLA form) would diverge.
  r = float(config.oflownet.search_radius)
  flow = jnp.clip(flow, -r, r)
  # strictly > 1: a cap of exactly 1 is α ≡ 1 (no inflation), so it must
  # not silently force the slower XLA path on use_pallas configs
  adaptive = config.adaptive_alpha_max > 1.0
  if config.use_pallas and not adaptive:
    from kfnet_tpu.kernels import fused_filter
    x_post, P_post, consistent = fused_filter.fused_warp_kalman(
        x_prev, P_prev, flow, W, z, V,
        radius=config.oflownet.search_radius,
        threshold=config.chi2_threshold, invalid_cov=config.invalid_cov)
    return x_post, P_post, consistent, None
  x_pr, P_pr, valid = warp_lib.warp_state_cov(
      x_prev, P_prev, flow, W, invalid_cov=config.invalid_cov)
  if adaptive:
    maha = kalman.mahalanobis_sq(z - x_pr, P_pr, V)
    # mean over WARP-VALID pixels only (see KFNetConfig docstring): the
    # invalid band's maha ≈ ‖inn‖²/invalid_cov ≈ 0 would dilute m̄
    # toward "calibrated" in exactly the frames that need inflation
    v = valid.astype(jnp.float32)
    m_bar = (jnp.sum(jnp.minimum(maha, 25.0) * v)
             / jnp.maximum(jnp.sum(v), 1.0))
    alpha = jnp.clip(m_bar / 3.0, 1.0, config.adaptive_alpha_max)
    P_pr = alpha * P_pr
  x_post, P_post, consistent = kalman.kalman_update(
      x_pr, P_pr, z, V, threshold=config.chi2_threshold)
  return x_post, P_post, consistent, (x_pr, P_pr)


def filter_step(params, config: KFNetConfig, x_prev, P_prev, feat_prev,
                image_cur):
  """One recursive-filter step (single sequence element, no batch dim).

  Args:
    x_prev/P_prev: (h, w, 3)/(h, w, 1) previous posterior.
    feat_prev: (h, w, C) OFlowNet features of the previous frame.
    image_cur: (H, W, 3) current frame.

  Returns:
    (x_post, P_post, feat_cur, aux) with aux = dict(flow, W, z, V,
    consistent).
  """
  feat_cur = encode(params, config, image_cur)
  flow, W = flow_from_features(params, config, feat_prev, feat_cur)
  z, V = measure(params, config, image_cur)
  x_post, P_post, consistent, prior = _fused_update(
      config, x_prev, P_prev, flow, W, z, V)
  aux = {"flow": flow, "W": W, "z": z, "V": V, "consistent": consistent}
  if prior is not None:
    aux["x_prior"], aux["P_prior"] = prior
  return x_post, P_post, feat_cur, aux


def first_step(params, config: KFNetConfig, image: jnp.ndarray):
  """Frame 0: no prior — posterior = measurement (SURVEY.md §3.3 last line)."""
  z, V = measure(params, config, image)
  feat = encode(params, config, image)
  return z, V, feat
