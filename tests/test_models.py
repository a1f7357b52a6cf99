import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kfnet_tpu.kernels import cost_volume as cvmod
from kfnet_tpu.models import kfnet, oflownet, scoordnet
from kfnet_tpu.nn import param_count
from tests import tiny_configs as tc


def test_scoordnet_shapes_and_positivity():
  cfg = tc.tiny_scoordnet()
  params = scoordnet.init(jax.random.key(0), cfg, tc.IMG)
  img = tc.random_images(2)
  coords, var = jax.jit(
      lambda p, x: scoordnet.apply(p, cfg, x))(params, img)
  assert coords.shape == (2, 6, 8, 3)
  assert var.shape == (2, 6, 8, 1)
  assert bool((var > 0).all())
  assert bool(jnp.isfinite(coords).all())


def test_scoordnet_coord_normalization():
  cfg = tc.tiny_scoordnet()
  cfg2 = scoordnet.SCoordNetConfig(
      **{**cfg.__dict__, "coord_offset": (1.0, 2.0, 3.0), "coord_scale": 2.0})
  params = scoordnet.init(jax.random.key(0), cfg, tc.IMG)
  img = tc.random_images(1)
  c1, v1 = scoordnet.apply(params, cfg, img)
  c2, v2 = scoordnet.apply(params, cfg2, img)
  np.testing.assert_allclose(
      np.asarray(c2), np.asarray(c1) * 2.0 + np.array([1.0, 2.0, 3.0]),
      rtol=1e-5)
  np.testing.assert_allclose(np.asarray(v2), np.asarray(v1) * 4.0, rtol=1e-5)


@pytest.mark.slow
def test_scoordnet_default_param_count_near_paper():
  # paper §4.1: ~24.3M params (SURVEY.md §6 high-confidence anchor).
  cfg = scoordnet.SCoordNetConfig()
  params = scoordnet.init(jax.random.key(0), cfg, (64, 64, 3))
  n = param_count(params)
  assert 20e6 < n < 29e6, f"param count {n/1e6:.1f}M out of range"


def test_cost_volume_delta_feature_peak():
  # feature map with a distinctive one-hot spike: correlation must peak at
  # the true shift.
  h, w, c = 8, 10, 4
  f_prev = jnp.zeros((h, w, c)).at[3, 4, 1].set(1.0)
  f_cur = jnp.zeros((h, w, c)).at[2, 3, 1].set(1.0)
  # source (prev) is at (u=4,v=3); dst (cur) at (u=3,v=2): flow=(+1,+1)
  cv = cvmod.cost_volume(f_prev, f_cur, radius=2)
  k = int(jnp.argmax(cv[2, 3]))
  offs = np.asarray(cvmod.window_offsets(2))
  assert tuple(offs[k]) == (1.0, 1.0)


def test_soft_argmax_flow():
  cv = jnp.full((4, 4, 25), -30.0).at[:, :, 7].set(30.0)
  flow = cvmod.soft_argmax_flow(cv, radius=2)
  offs = np.asarray(cvmod.window_offsets(2))
  np.testing.assert_allclose(
      np.asarray(flow), np.broadcast_to(offs[7], (4, 4, 2)), atol=1e-4)


def test_cost_volume_batched_matches_single():
  rng = np.random.default_rng(0)
  fp = jnp.asarray(rng.normal(size=(2, 6, 7, 5)).astype(np.float32))
  fc = jnp.asarray(rng.normal(size=(2, 6, 7, 5)).astype(np.float32))
  batched = cvmod.cost_volume(fp, fc, radius=1)
  single = jnp.stack(
      [cvmod.cost_volume(fp[i], fc[i], radius=1) for i in range(2)])
  np.testing.assert_allclose(np.asarray(batched), np.asarray(single),
                             atol=1e-6)


def test_oflownet_shapes_and_flow_bounded():
  cfg = tc.tiny_oflownet()
  params = oflownet.init(jax.random.key(1), cfg, tc.IMG)
  imgs = tc.random_images(2, seed=1)
  flow, W = jax.jit(
      lambda p, a, b: oflownet.apply(p, cfg, a, b))(params, imgs[0], imgs[1])
  assert flow.shape == (6, 8, 2)
  assert W.shape == (6, 8, 1)
  assert bool((jnp.abs(flow) <= cfg.search_radius).all())
  assert bool((W > 0).all())


def test_kfnet_step_consistency_with_components():
  cfg = tc.tiny_kfnet()
  params = kfnet.init(jax.random.key(2), cfg, tc.IMG)
  imgs = tc.random_images(2, seed=2)
  x0, P0, feat0 = kfnet.first_step(params, cfg, imgs[0])
  z0, V0 = kfnet.measure(params, cfg, imgs[0])
  np.testing.assert_allclose(np.asarray(x0), np.asarray(z0))
  np.testing.assert_allclose(np.asarray(P0), np.asarray(V0))
  x1, P1, feat1, aux = kfnet.filter_step(
      params, cfg, x0, P0, feat0, imgs[1])
  assert x1.shape == (6, 8, 3) and P1.shape == (6, 8, 1)
  assert bool((P1 > 0).all())
  # where consistent, the posterior variance must not exceed measurement's.
  ok = np.asarray(aux["consistent"])
  assert ok.any()  # an empty mask would make the check below vacuous
  np.testing.assert_array_less(
      np.asarray(P1)[ok], np.asarray(aux["V"])[ok] + 1e-6)


def test_kfnet_config_adaptive_alpha_validation():
  """(0,1) caps are rejected (a cap below 1 cannot inflate); exactly 1.0
  is the documented no-op and must construct fine."""
  import pytest

  from kfnet_tpu.models import kfnet as kf
  with pytest.raises(ValueError, match="cannot"):
    kf.KFNetConfig(adaptive_alpha_max=0.5)
  assert kf.KFNetConfig(adaptive_alpha_max=0.0).adaptive_alpha_max == 0.0
  assert kf.KFNetConfig(adaptive_alpha_max=1.0).adaptive_alpha_max == 1.0
  assert kf.KFNetConfig(adaptive_alpha_max=4.0).adaptive_alpha_max == 4.0
