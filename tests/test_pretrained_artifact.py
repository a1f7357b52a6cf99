"""The shipped pretrained artifact (SURVEY.md §2.2 #13): a fresh clone
must be able to load trained weights and relocalize WITHOUT running any
training — ``kfnet_tpu.pretrained.load`` + the checked-in
``artifacts/pretrained_synthetic`` exports."""

import os

import jax
import numpy as np
import pytest

ARTIFACT_ROOT = os.path.join(os.path.dirname(__file__), os.pardir,
                             "artifacts", "pretrained_synthetic")


def test_artifact_is_shipped():
  """The artifact directory is part of the repo, not an optional mount."""
  assert os.path.isdir(ARTIFACT_ROOT), (
      "artifacts/pretrained_synthetic missing — regenerate with "
      "tools/protocol.py --scenes sceneA --work_dir artifacts/"
      "pretrained_synthetic (see artifacts/README.md)")


@pytest.mark.slow
def test_load_and_relocalize_out_of_the_box():
  from kfnet_tpu import pretrained
  from kfnet_tpu.data import synthetic
  from kfnet_tpu.eval import eval_sequence
  from kfnet_tpu.pose import ransac
  from kfnet_tpu.utils import checkpoint as ckpt_lib

  cfg, params = pretrained.load(ARTIFACT_ROOT, scene="sceneA")
  meta = ckpt_lib.load_meta(os.path.join(ARTIFACT_ROOT, "stage3_sceneA"))
  H, W = int(meta["height"]), int(meta["width"])
  # sceneA's held-out test trajectory (DEFAULT_SCENES: seed 0, test
  # traj_seed 99), shortened at constant per-frame motion
  T = 16
  data = synthetic.make_sequence(T, height=H, width=W, seed=0,
                                 traj_seed=99, duration=T / 48.0)
  res = eval_sequence.evaluate_sequence(
      params, cfg, data["images"], data["K"],
      gt_poses=np.asarray(data["poses"]), scene="sceneA",
      ransac_config=ransac.RansacConfig(num_hypotheses=256, top_k=512),
      timing_reps=1)
  # loose bounds: the artifact is small-scale (96x128 reduced-width nets,
  # protocol-report medians ~0.16 m / ~1.5 deg); this guards "the weights
  # actually load and localize", not peak accuracy
  assert res.report["median_translation_m"] < 0.5, res.report
  assert res.report["median_rotation_deg"] < 8.0, res.report


@pytest.mark.slow
def test_stage1_plus_stage2_compose_without_stage3():
  """The loader's fallback path: measurement net + frozen OFlowNet."""
  from kfnet_tpu import pretrained
  from kfnet_tpu.filter import sequence
  from kfnet_tpu.data import synthetic

  cfg, params = pretrained.load_stage12(ARTIFACT_ROOT, scene="sceneA")
  data = synthetic.make_sequence(4, height=96, width=128, seed=0,
                                 traj_seed=99, duration=4 / 48.0)
  xs, Ps, _ = jax.jit(
      lambda p, im: sequence.run_filter(p, cfg, im),
      static_argnums=())(params, data["images"])
  assert np.all(np.isfinite(np.asarray(xs)))
  assert np.all(np.asarray(Ps) > 0)


FULL_ROOT = os.path.join(os.path.dirname(__file__), os.pardir,
                         "artifacts", "pretrained_full")
FULL_NONORM_ROOT = os.path.join(os.path.dirname(__file__), os.pardir,
                                "artifacts", "pretrained_full_nonorm")


def test_full_size_artifact_is_shipped():
  """Round-4: FULL-SIZE (640x480, 23.6M-param) weights ship too, in the
  bf16 release format (tools/export_release.py) — both trunks."""
  assert os.path.isdir(FULL_ROOT)
  assert os.path.isdir(FULL_NONORM_ROOT)


@pytest.mark.slow
@pytest.mark.parametrize("scene", ["sceneA", "outdoor_train"])
@pytest.mark.parametrize("root,norm", [(FULL_ROOT, "group"),
                                       (FULL_NONORM_ROOT, "none")])
def test_full_size_artifact_loads_and_filters(root, norm, scene):
  """The bf16 full-size releases (indoor + outdoor, GroupNorm and
  reference-parity nonorm trunks) load through pretrained.load (restored
  + cast back to the config dtypes) and one measurement forward runs
  clean on CPU. Accuracy at full size is covered by the TPU protocol
  reports; this guards the fresh-clone load path."""
  import jax.numpy as jnp

  from kfnet_tpu import pretrained
  from kfnet_tpu.models import kfnet
  from kfnet_tpu.utils import checkpoint as ckpt_lib

  cfg, params = pretrained.load(root, scene=scene)
  assert cfg.scoordnet.norm == norm
  # exports carry their own calibrated serving point: the nonorm trunk
  # serves at w_scale=2 (CALIBRATION.md §7), the GN trunk at the
  # KFNetConfig default 16 (§2) — the loader applies meta, no footgun
  assert cfg.w_scale == (2.0 if norm == "none" else 16.0)
  meta = ckpt_lib.load_meta(os.path.join(root, f"stage3_{scene}"))
  assert meta["params_dtype"] == "bfloat16"
  assert meta["full_size"] and int(meta["height"]) == 480
  # params restored to the template's dtypes (f32 master weights)
  leaves = jax.tree_util.tree_leaves(params)
  assert all(leaf.dtype == jnp.float32 for leaf in leaves)
  rng = np.random.default_rng(0)
  img = jnp.asarray(rng.uniform(0, 1, (480, 640, 3)).astype(np.float32))
  z, V = kfnet.measure(params, cfg, img)
  assert z.shape == (60, 80, 3) and V.shape == (60, 80, 1)
  assert np.isfinite(np.asarray(z)).all()
  assert float(jnp.min(V)) > 0


def test_release_export_shape_mismatch_is_loud(tmp_path):
  """A wrong-geometry bf16 export (same param TREE, different array
  shapes) must fail in the loader with a shape message, not deep inside
  apply with an opaque conv error."""
  import jax.numpy as jnp

  from kfnet_tpu import pretrained
  from kfnet_tpu.utils import checkpoint as ckpt_lib

  saved = {"w": np.zeros((2, 3), np.float32)}
  template = {"w": jnp.zeros((4, 3), jnp.float32)}
  path = str(tmp_path / "export")
  ckpt_lib.export_params(path, saved, meta={"params_dtype": "bfloat16"})
  with pytest.raises(ValueError, match="shapes"):
    pretrained._load_params_cast(path, template)


def test_meta_without_norm_field_means_groupnorm():
  """Exports written before meta carried ``scoordnet_norm``
  (artifacts/pretrained_synthetic) were all GroupNorm-trained; the
  loader must pin norm="group" for them regardless of what the current
  SCoordNetConfig default is (a default flip must not silently retarget
  old weights at a different trunk)."""
  from kfnet_tpu import pretrained

  base = {"coord_offset": [0.0, 0.0, 0.0], "coord_scale": 1.0}
  cfg = pretrained._scoordnet_config(dict(base))
  assert cfg.norm == "group"
  cfg = pretrained._scoordnet_config(dict(base, scoordnet_norm="none"))
  assert cfg.norm == "none"
  cfg = pretrained._scoordnet_config(dict(base, full_size=True))
  assert cfg.norm == "group"


def test_serving_point_meta_applied():
  """Exports can record the serving point their weights were calibrated
  at (export_release --serving_*); the loader applies it so e.g. a
  norm="none" release serves at w_scale=2 (CALIBRATION.md §7) without
  the user having to remember the number. Absent fields keep the
  KFNetConfig defaults untouched."""
  from kfnet_tpu import pretrained
  from kfnet_tpu.models import kfnet

  base = kfnet.KFNetConfig()
  assert pretrained._apply_serving(base, {}) is base
  cfg = pretrained._apply_serving(base, {"serving_w_scale": 2.0})
  assert cfg.w_scale == 2.0
  assert cfg.chi2_threshold == base.chi2_threshold
  cfg = pretrained._apply_serving(
      base, {"serving_w_scale": 2, "serving_chi2_threshold": 7.81})
  assert cfg.w_scale == 2.0 and cfg.chi2_threshold == 7.81
