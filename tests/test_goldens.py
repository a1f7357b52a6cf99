"""Golden regression tests (SURVEY.md §4 "Golden/parity"): tiny
fixed-weight forward passes checked against stored arrays, so numeric
drift in conv/norm/warp/Kalman stacks is caught across refactors.

Goldens pin EXPLICIT trunk configs — one per supported normalization
(GroupNorm and the reference-parity norm="none") — never the config
defaults, so a change to the shipped default can't silently retarget
golden coverage at a different trunk.

Regenerate (after an INTENDED numeric change):
    python tests/test_goldens.py regenerate
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kfnet_tpu.filter import sequence
from kfnet_tpu.models import kfnet
from tests import tiny_configs as tc

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
# kfnet_tiny_forward.npz predates the two-trunk split; it was computed
# with norm="group" throughout and keeps its name so history stays
# comparable.
PATHS = {
    "group": os.path.join(GOLDEN_DIR, "kfnet_tiny_forward.npz"),
    "none": os.path.join(GOLDEN_DIR, "kfnet_tiny_forward_nonorm.npz"),
}


def _cfg(norm):
  cfg = tc.tiny_kfnet()
  return dataclasses.replace(
      cfg,
      scoordnet=dataclasses.replace(cfg.scoordnet, norm=norm),
      oflownet=dataclasses.replace(cfg.oflownet, norm=norm))


def compute(norm):
  cfg = _cfg(norm)
  params = kfnet.init(jax.random.key(42), cfg, tc.IMG)
  imgs = tc.random_images(3, seed=42)
  xs, Ps, _ = sequence.run_filter(params, cfg, imgs)
  z, V = kfnet.measure(params, cfg, imgs[0])
  return {"xs": np.asarray(xs), "Ps": np.asarray(Ps),
          "z": np.asarray(z), "V": np.asarray(V)}


@pytest.mark.parametrize("norm", sorted(PATHS))
def test_forward_matches_golden(norm):
  path = PATHS[norm]
  assert os.path.exists(path), f"golden {path} missing — run regenerate"
  got = compute(norm)
  with np.load(path) as want:
    for k in ("xs", "Ps", "z", "V"):
      np.testing.assert_allclose(
          got[k], want[k], rtol=5e-4, atol=5e-5,
          err_msg=f"golden mismatch in {k} (norm={norm})")


if __name__ == "__main__":
  import sys
  if len(sys.argv) > 1 and sys.argv[1] == "regenerate":
    # match the pytest environment (tests/conftest.py): CPU backend,
    # highest matmul precision — goldens are platform-pinned.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for norm, path in PATHS.items():
      np.savez_compressed(path, **compute(norm))
      print("wrote", path)
