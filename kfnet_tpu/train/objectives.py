"""Per-stage training objectives (paper §4 / §5 recipe; SURVEY.md §3.1,
§3.2, §3.5):

  stage 1  SCoordNet, per scene:   measurement NLL.
  stage 2  OFlowNet, per dataset:  NLL of flow-warped GT coords of t-1
                                   against GT coords of t, under the
                                   predicted process noise.
  stage 3  KFNet joint fine-tune:  posterior NLL on 2-frame windows
                                   (+ weighted component NLLs), gradients
                                   through both subnets.

Each objective is a pure fn (params, batch) -> (loss, metrics dict) so the
generic trainer jits value_and_grad over any of them under the DP mesh.
Batches carry per-frame GT coordinate maps + validity from data/labels.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from kfnet_tpu.core import kalman, warp as warp_lib
from kfnet_tpu.losses import nll
from kfnet_tpu.models import kfnet, oflownet, scoordnet


def _training_dynamics(config: kfnet.KFNetConfig) -> kfnet.KFNetConfig:
  """Joint fine-tuning ALWAYS trains the raw paper filter dynamics
  (χ² p=0.05 gate, no W temperature, no adaptation): the calibrated
  serving defaults in KFNetConfig are an eval-side reweighting validated
  on models trained exactly this way (docs/CALIBRATION.md) — training
  through an inflated prior would silently change what stage 3 learns
  and invalidate that evidence."""
  return dataclasses.replace(
      config, chi2_threshold=kalman.CHI2_3DOF_P05, w_scale=1.0,
      adaptive_alpha_max=0.0)


def scoordnet_objective(config: scoordnet.SCoordNetConfig):
  """batch: image (B,H,W,3), coords (B,h,w,3), valid (B,h,w)."""

  def loss_fn(params, batch):
    coords, var = scoordnet.apply(params, config, batch["image"])
    valid = batch["valid"]
    loss = nll.gaussian_nll(coords, batch["coords"], var, valid)
    metrics = {
        "loss": loss,
        "coord_err_m": nll.l2_coord_error(coords, batch["coords"], valid),
        "mean_var": nll.masked_mean(var, valid[..., None]),
    }
    return loss, metrics

  return loss_fn


def oflownet_objective(config: oflownet.OFlowNetConfig,
                       flow_reg_weight: float = 0.0):
  """batch: image_prev/image (B,H,W,3), coords_prev/coords (B,h,w,3),
  valid_prev/valid (B,h,w).

  The warped-prev-GT-vs-cur-GT NLL supervises flow and process noise
  jointly without any flow ground truth (paper §4.2): only where the flow
  transports a valid previous label onto a valid current pixel.
  """

  def loss_fn(params, batch):
    flow, W = oflownet.apply(
        params, config, batch["image_prev"], batch["image"])

    def warp_one(coords_prev, valid_prev, fl):
      joint = jnp.concatenate(
          [coords_prev, valid_prev[..., None].astype(jnp.float32)], -1)
      warped, in_bounds = warp_lib.warp_by_flow(joint, fl)
      # a warped label is trustworthy only if the entire bilinear footprint
      # was valid (warped validity == 1 exactly).
      ok = in_bounds[..., 0] & (warped[..., 3] > 0.999)
      return warped[..., :3], ok

    warped, ok_prev = jax.vmap(warp_one)(
        batch["coords_prev"], batch["valid_prev"], flow)
    mask = ok_prev & batch["valid"]
    loss = nll.gaussian_nll(warped, batch["coords"], W, mask)
    if flow_reg_weight:
      # smoothness: penalize spatial flow gradients (borders of moving
      # objects aside, scene flow from ego-motion is locally smooth).
      dx = jnp.diff(flow, axis=-2)
      dy = jnp.diff(flow, axis=-3)
      loss = loss + flow_reg_weight * (
          jnp.mean(jnp.abs(dx)) + jnp.mean(jnp.abs(dy)))
    metrics = {
        "loss": loss,
        "warp_err_m": nll.l2_coord_error(warped, batch["coords"], mask),
        "mean_W": nll.masked_mean(W, mask[..., None]),
        "supervised_frac": jnp.mean(mask.astype(jnp.float32)),
    }
    return loss, metrics

  return loss_fn


@dataclasses.dataclass(frozen=True)
class JointLossWeights:
  posterior: float = 1.0
  measurement: float = 0.5
  prior: float = 0.5


def kfnet_window_objective(config: kfnet.KFNetConfig,
                           weights: JointLossWeights = JointLossWeights(),
                           remat: bool = False):
  """Sequence-unrolled joint fine-tune: the filter runs over a T-frame
  window inside lax.scan with gradients through time (BPTT), posterior
  NLL summed over frames 1..T-1. Generalizes the 2-frame objective —
  matches the reference's filtering fine-tune on short windows
  (SURVEY.md §3.5 "2-frame (or short) windows").

  remat: rematerialize the scan body in the backward pass
  (``jax.checkpoint``): activation memory becomes O(1) in T — only the
  (x, P, feat) carry is stored per step and both subnets' activations
  recompute during the backward sweep (~1.3x step FLOPs) — so long-window
  BPTT at full resolution fits HBM (without it, every frame's full conv
  activations are live at once). Numerics are identical (same graph,
  re-executed; pinned by tests/test_train.py).

  batch: images (B, T, H, W, 3), coords (B, T, h, w, 3), valid (B, T, h, w).
  """
  config = _training_dynamics(config)

  def loss_fn(params, batch):
    def single(images, coords_gt, valid):
      x0, P0, feat0 = kfnet.first_step(params, config, images[0])

      def body(c, inp):
        img, gt, v = inp
        x, P, feat = c
        x1, P1, feat1, aux = kfnet.filter_step(params, config, x, P, feat,
                                               img)
        l_post = nll.gaussian_nll(x1, gt, P1, v)
        l_meas = nll.gaussian_nll(aux["z"], gt, aux["V"], v)
        err = nll.l2_coord_error(x1, gt, v)
        return (x1, P1, feat1), (l_post, l_meas, err)

      _, (l_post, l_meas, err) = jax.lax.scan(
          jax.checkpoint(body) if remat else body,
          (x0, P0, feat0), (images[1:], coords_gt[1:], valid[1:]))
      l0 = nll.gaussian_nll(x0, coords_gt[0], P0, valid[0])
      return (jnp.mean(l_post), jnp.mean(l_meas) + l0 / images.shape[0],
              jnp.mean(err))

    l_post, l_meas, err = jax.vmap(single)(
        batch["images"], batch["coords"], batch["valid"])
    loss = (weights.posterior * jnp.mean(l_post) +
            weights.measurement * jnp.mean(l_meas))
    return loss, {"loss": loss, "posterior_nll": jnp.mean(l_post),
                  "measurement_nll": jnp.mean(l_meas),
                  "coord_err_m": jnp.mean(err)}

  return loss_fn


def kfnet_objective(config: kfnet.KFNetConfig,
                    weights: JointLossWeights = JointLossWeights()):
  """Joint fine-tune on 2-frame windows (SURVEY.md §3.5): the t-1
  posterior is initialized from the measurement system, one filter step
  runs to t, and the posterior NLL (+ component NLLs) trains both nets.
  Uses the XLA (differentiable) path — config.use_pallas must be False.
  """
  assert not config.use_pallas, "joint training needs the differentiable path"
  config = _training_dynamics(config)

  def loss_fn(params, batch):
    def single(img_prev, img_cur, coords_gt, valid):
      x0, P0, feat0 = kfnet.first_step(params, config, img_prev)
      x1, P1, _, aux = kfnet.filter_step(
          params, config, x0, P0, feat0, img_cur)
      l_post = nll.gaussian_nll(x1, coords_gt, P1, valid)
      l_meas = nll.gaussian_nll(aux["z"], coords_gt, aux["V"], valid)
      # prior supervised only where the warp stayed in bounds
      prior_ok = valid & (aux["P_prior"][..., 0] < config.invalid_cov * 0.5)
      l_prior = nll.gaussian_nll(
          aux["x_prior"], coords_gt, aux["P_prior"], prior_ok)
      err = nll.l2_coord_error(x1, coords_gt, valid)
      cons = jnp.mean(aux["consistent"].astype(jnp.float32))
      return l_post, l_meas, l_prior, err, cons

    l_post, l_meas, l_prior, err, cons = jax.vmap(single)(
        batch["image_prev"], batch["image"], batch["coords"], batch["valid"])
    l_post, l_meas, l_prior = map(jnp.mean, (l_post, l_meas, l_prior))
    loss = (weights.posterior * l_post + weights.measurement * l_meas +
            weights.prior * l_prior)
    metrics = {
        "loss": loss,
        "posterior_nll": l_post,
        "measurement_nll": l_meas,
        "prior_nll": l_prior,
        "coord_err_m": jnp.mean(err),
        "consistent_frac": jnp.mean(cons),
    }
    return loss, metrics

  return loss_fn
