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
    # NO persistent compile cache for CPU tests.  A separate CPU-only cache
    # dir was tried (round 3): entries still ended up compiled with machine
    # features this host lacks (+prefer-no-scatter AVX512 AOT from the
    # remote-compiler jax build pre-imported by sitecustomize), and loading
    # them segfaulted the suite mid-run.  CPU AOT caching on this host is
    # unsafe, period (CLAUDE.md).


import pytest  # noqa: E402

# Every XLA:CPU executable loaded onto the 8 virtual devices pins ~108
# memory mappings (JIT code pages x 8 device loads) for as long as jax's
# jit caches hold it.  The suite compiles several hundred unique shapes
# (the parity corpora alone are ~100), which blows through the kernel's
# vm.max_map_count (65530 here) and SIGSEGVs inside LLVM on a failed mmap
# mid-suite — measured: 440 baseline maps, +~108/compile, and
# jax.clear_caches() returns to baseline.  Clear the caches whenever the
# map count approaches the limit; recompiles are cheaper than a dead suite.
_MAPS_SOFT_LIMIT = 30_000


def _n_memory_maps() -> int:
    try:
        with open("/proc/self/maps") as fh:
            return sum(1 for _ in fh)
    except OSError:  # non-Linux: no map accounting, rely on the OS
        return 0


@pytest.fixture(autouse=True)
def _bound_jit_code_maps():
    yield
    if _n_memory_maps() > _MAPS_SOFT_LIMIT:
        jax.clear_caches()
        # AOT-compiled PSF programs pin code maps outside jax's caches:
        from photometry_tpu.utils import aot
        aot.clear()
