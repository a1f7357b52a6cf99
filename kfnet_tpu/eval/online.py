"""Online (streaming) relocalization — the production serving surface.

The reference's ``KFNet/eval.py`` python loop IS its online mode: one
frame in, one pose out, state carried between calls (SURVEY.md §3.3).
This class is that loop as a product API: jitted step with donated state
(the carry never re-allocates in HBM), optional per-frame PnP solve, and
automatic filter reset via the consistency mechanism on tracking loss.

    reloc = OnlineRelocalizer(params, config, K)
    for frame in camera:
        pose, info = reloc.process(frame)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from kfnet_tpu.models import kfnet
from kfnet_tpu.pose import ransac


class OnlineRelocalizer:
  """Carries (x, P, features) across frames; one jitted step per frame."""

  def __init__(self, params, config: kfnet.KFNetConfig, K,
               ransac_config: ransac.RansacConfig | None = None,
               stride: int = 8, solve_pose: bool = True,
               seed: int = 0):
    self._params = params
    self._config = config
    self._K = jnp.asarray(K)
    self._rcfg = ransac_config or ransac.RansacConfig()
    self._stride = stride
    self._solve = solve_pose
    self._carry = None
    self._rng = jax.random.key(seed)
    self._frames = 0

    cfg = config

    @jax.jit
    def _first(params, image):
      return kfnet.first_step(params, cfg, image)

    @partial(jax.jit, donate_argnums=(1,))
    def _step(params, carry, image):
      x, P, feat = carry
      x1, P1, feat1, aux = kfnet.filter_step(params, cfg, x, P, feat, image)
      frac = jnp.mean(aux["consistent"].astype(jnp.float32))
      return (x1, P1, feat1), frac

    @jax.jit
    def _pose(x, P, key):
      return ransac.solve_pnp_from_maps(
          x, P, jnp.ones_like(P, dtype=bool), self._K, key,
          stride=self._stride, config=self._rcfg)

    self._first_fn = _first
    self._step_fn = _step
    self._pose_fn = _pose

  def reset(self):
    """Drop the temporal state (scene change / tracking restart)."""
    self._carry = None

  def process(self, image) -> tuple[np.ndarray | None, dict]:
    """Feed one (H, W, 3) frame; returns (T_wc 4x4 or None, info dict).

    info: consistent_frac (filter health; ~0 means the prior was rejected
    everywhere, e.g. after a cut), num_inliers / inlier_ratio when pose
    solving is enabled.
    """
    image = jnp.asarray(image)
    info: dict = {"frame": self._frames}
    if self._carry is None:
      x, P, feat = self._first_fn(self._params, image)
      self._carry = (x, P, feat)
      info["consistent_frac"] = 0.0
    else:
      self._carry, frac = self._step_fn(self._params, self._carry, image)
      info["consistent_frac"] = float(frac)
    self._frames += 1
    if not self._solve:
      return None, info
    self._rng, key = jax.random.split(self._rng)
    out = self._pose_fn(self._carry[0], self._carry[1], key)
    info["num_inliers"] = float(out["num_inliers"])
    info["inlier_ratio"] = float(out["inlier_ratio"])
    return np.asarray(out["T_wc"]), info

  @property
  def state(self):
    """Current (x, P, features) carry (device arrays)."""
    return self._carry
