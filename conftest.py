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
    # Persistent compile cache for the CPU test backend, in its OWN
    # directory: repeated pytest runs recompile the same programs and
    # dominate the ~20 min suite wall-clock on this 1-core host.  The
    # TPU-backend cache stays separate (CLAUDE.md: remote-compiler TPU
    # artifacts must never be reused for CPU — this cache is populated
    # exclusively by the local CPU compiler).
    _cache = os.path.join(os.path.expanduser("~"), ".photometry_tpu",
                          "jax_cache_cpu_tests")
    try:
        os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
