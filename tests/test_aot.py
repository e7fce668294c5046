"""Unit tests of the asynchronous AOT compile cache (utils/aot.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from photometry_tpu.utils import aot


@jax.jit
def _double(x):
    return x * 2.0


def _lower():
    return _double.lower(jax.ShapeDtypeStruct((4,), jnp.float32))


def test_prefetch_get_roundtrip():
    key = ("test_aot", "roundtrip")
    fut = aot.prefetch(key, _lower)
    compiled = aot.get(key, _lower)
    assert fut.done()
    out = np.asarray(compiled(jnp.arange(4, dtype=jnp.float32)))
    np.testing.assert_allclose(out, [0.0, 2.0, 4.0, 6.0])
    # same key returns the SAME executable without re-lowering:
    assert aot.get(key, _lower) is compiled


def test_failed_compile_is_evicted_and_raises():
    key = ("test_aot", "boom")

    def bad_lower():
        raise RuntimeError("lowering exploded")

    with pytest.raises(RuntimeError):
        aot.get(key, bad_lower)
    # entry evicted -> a good thunk under the same key now succeeds:
    compiled = aot.get(key, _lower)
    out = np.asarray(compiled(jnp.ones(4, jnp.float32)))
    np.testing.assert_allclose(out, 2.0)


def test_clear_drops_entries():
    key = ("test_aot", "clear")
    first = aot.get(key, _lower)
    aot.clear()
    second = aot.get(key, _lower)
    assert second is not first


def test_wedged_compile_does_not_block_process_exit():
    """A compile hung on a dead remote-compiler service must not hang
    process shutdown: the pool threads are daemons (round-3 review fix —
    ThreadPoolExecutor's atexit join would wait forever)."""
    import subprocess
    import sys
    import time
    code = (
        "import threading\n"
        "from photometry_tpu.utils import aot\n"
        "aot.prefetch('wedge', lambda: threading.Event().wait())\n"
        "import time; time.sleep(0.2)\n"   # let the worker pick it up
        "print('exiting')\n"
    )
    t0 = time.time()
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=60)
    assert proc.returncode == 0, proc.stderr
    assert "exiting" in proc.stdout
    # generous bound: interpreter + jax import dominate; the old
    # non-daemon pool never exited at all.
    assert time.time() - t0 < 60
