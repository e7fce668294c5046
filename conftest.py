"""
Pytest configuration for photometry_tpu.

Tests run on a virtual 8-device CPU mesh so that multi-chip sharding logic is
exercised without TPU hardware (mirrors how the driver dry-runs
``__graft_entry__.dryrun_multichip``).

NOTE: in this environment ``jax`` is pre-imported at interpreter startup, so
JAX_PLATFORMS set via os.environ is read too late — we must use
``jax.config.update`` and set XLA_FLAGS before the first backend
initialization.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

if os.environ.get("PHOTOMETRY_TPU_TEST_ON_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
