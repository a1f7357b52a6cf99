import os

import numpy as np

from kfnet_tpu.tools import visualize


def test_render_frame(tmp_path):
  rng = np.random.default_rng(0)
  coords = rng.normal(size=(6, 8, 3)).astype(np.float32)
  cov = rng.uniform(0.01, 1.0, (6, 8, 1)).astype(np.float32)
  npz = str(tmp_path / "frame-000000.npz")
  np.savez(npz, coords=coords, covariance=cov, pose=np.eye(4))
  out = str(tmp_path / "viz")
  visualize.render_frame(npz, out, gt=coords * 1.01)
  for suffix in ("coords", "log_cov", "err"):
    p = os.path.join(out, f"frame-000000.{suffix}.png")
    assert os.path.exists(p)
    from PIL import Image
    img = Image.open(p)
    assert img.size == (8 * 8, 6 * 8)


def test_colorize_handles_constant_input():
  img = visualize._colorize(np.zeros((4, 4)))
  assert img.shape == (4, 4, 3) and img.dtype == np.uint8
