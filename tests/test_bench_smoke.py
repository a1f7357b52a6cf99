"""Driver-contract smoke test for bench.py: it must print ONE parseable
JSON line with the fields the driver (and the round artifacts) rely on.
Runs the real module in a fresh subprocess with the CPU platform forced
the only way that works on this sandbox (jax.config BEFORE backend init —
the axon TPU plugin ignores the JAX_PLATFORMS env var, and a stray TPU
init here could collide with a concurrent TPU job)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_emits_driver_contract():
  code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
          "import bench; bench.main()")
  out = subprocess.run(
      [sys.executable, "-c", code], capture_output=True, text=True,
      timeout=1500, cwd=REPO,
      env={**os.environ, "PYTHONPATH": REPO})
  assert out.returncode == 0, out.stderr[-2000:]
  json_lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
  assert len(json_lines) == 1, out.stdout
  d = json.loads(json_lines[0])
  for key in ("metric", "value", "unit", "vs_baseline", "backend",
              "fps_xla", "mfu", "gflops_per_frame", "baseline_note"):
    assert key in d, f"missing {key}"
  assert d["value"] > 0
  assert d["unit"] == "frames/sec/chip"
  assert d["backend"] == "cpu"
