"""Golden regression tests (SURVEY.md §4 "Golden/parity"): tiny
fixed-weight forward passes checked against stored arrays, so numeric
drift in conv/norm/warp/Kalman stacks is caught across refactors.

Regenerate (after an INTENDED numeric change):
    python tests/test_goldens.py regenerate
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from kfnet_tpu.filter import sequence
from kfnet_tpu.models import kfnet
from tests import tiny_configs as tc

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
PATH = os.path.join(GOLDEN_DIR, "kfnet_tiny_forward.npz")


def compute():
  cfg = tc.tiny_kfnet()
  params = kfnet.init(jax.random.key(42), cfg, tc.IMG)
  imgs = tc.random_images(3, seed=42)
  xs, Ps, _ = sequence.run_filter(params, cfg, imgs)
  z, V = kfnet.measure(params, cfg, imgs[0])
  return {"xs": np.asarray(xs), "Ps": np.asarray(Ps),
          "z": np.asarray(z), "V": np.asarray(V)}


def test_forward_matches_golden():
  assert os.path.exists(PATH), "golden missing — run regenerate"
  got = compute()
  with np.load(PATH) as want:
    for k in ("xs", "Ps", "z", "V"):
      np.testing.assert_allclose(
          got[k], want[k], rtol=5e-4, atol=5e-5,
          err_msg=f"golden mismatch in {k}")


if __name__ == "__main__":
  import sys
  if len(sys.argv) > 1 and sys.argv[1] == "regenerate":
    # match the pytest environment (tests/conftest.py): CPU backend,
    # highest matmul precision — goldens are platform-pinned.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    np.savez_compressed(PATH, **compute())
    print("wrote", PATH)
