"""Driver-contract tests for __graft_entry__.py.

The round-1 driver failure (MULTICHIP_r01.json rc=1) happened because the
driver pre-sets XLA_FLAGS=--xla_force_host_platform_device_count=N and the
old guard then skipped the jax_platforms=cpu force, falling through to the
real TPU (libtpu mismatch).  These tests run dryrun_multichip in fresh
subprocesses that replicate (a) the driver's exact env and (b) a bare env,
and assert both complete on the CPU backend.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN = (
    "import __graft_entry__ as g; g.dryrun_multichip(8); print('DRYRUN_OK')"
)


def _clean_env(**extra):
  env = dict(os.environ)
  # Strip anything the pytest conftest / harness injected so the subprocess
  # sees what the driver would.
  for k in ("XLA_FLAGS", "JAX_PLATFORMS", "KFNET_DEBUG_NANS"):
    env.pop(k, None)
  env["PYTHONPATH"] = REPO
  env.update(extra)
  return env


@pytest.mark.parametrize(
    "env_extra",
    [
        {},  # bare env: guard must force CPU + device count itself
        # driver-style env: device-count flag pre-set; guard must STILL
        # force the cpu platform (the round-1 bug skipped this)
        {"XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
    ],
    ids=["bare_env", "driver_presets_xla_flags"],
)
def test_dryrun_multichip_subprocess(env_extra):
  proc = subprocess.run(
      [sys.executable, "-c", RUN],
      capture_output=True, text=True, timeout=900,
      cwd=REPO, env=_clean_env(**env_extra))
  assert proc.returncode == 0, (
      f"dryrun failed (rc={proc.returncode})\nstdout:\n{proc.stdout}\n"
      f"stderr:\n{proc.stderr[-4000:]}")
  assert "DRYRUN_OK" in proc.stdout


def test_dryrun_refuses_initialized_wrong_backend():
  """With jax already initialized on fewer devices than requested, the
  guard must raise a clear error rather than fall through."""
  code = (
      "import jax; jax.config.update('jax_platforms', 'cpu');"
      "jax.devices();"  # initialize with 1 CPU device
      "import __graft_entry__ as g\n"
      "try:\n"
      "  g.dryrun_multichip(8)\n"
      "except RuntimeError as e:\n"
      "  assert 'uninitialized' in str(e), str(e); print('GUARD_OK')\n"
  )
  proc = subprocess.run(
      [sys.executable, "-c", code],
      capture_output=True, text=True, timeout=300,
      cwd=REPO, env=_clean_env())
  assert proc.returncode == 0, proc.stderr[-2000:]
  assert "GUARD_OK" in proc.stdout
