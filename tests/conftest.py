"""Test harness config: force a virtual 8-device CPU backend.

Per SURVEY.md §4 ("Distributed") the sharding/pjit paths are exercised on a
fake multi-device CPU mesh via --xla_force_host_platform_device_count; unit
and numeric tests also run on CPU so CI needs no TPU. Must run before jax
initializes its backends, hence module-level in conftest.

Note: this sandbox's axon TPU plugin ignores the JAX_PLATFORMS env var, so
the platform is forced via jax.config instead (env alone selects axon).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
if os.environ.get("KFNET_DEBUG_NANS"):
  # SURVEY.md §5 sanitizer row: nan-checking CI mode
  jax.config.update("jax_debug_nans", True)
