"""
Asynchronous ahead-of-time compilation of jitted programs.

The PSF/linPSF batch programs cost ~7-8 s of backend compile per distinct
chunk shape on the TPU compiler service (measured warm-service; the unrolled
small-Cholesky LM machinery, not the PRF path, dominates — jnp.linalg.solve
compiles slower still).  The reference has no analogue (scipy minimizers
compile nothing, psf_photometry.py:154), but pays ~seconds *per cadence*
instead.  To keep first-batch latency low, compiles are submitted to a small
thread pool as soon as the chunk shapes are known — they run on the compiler
service concurrently with host-side stamp preparation and with execution of
earlier chunks — and the compiled executables are cached process-wide, keyed
by (function, PRF identity, shape tuple).

Used by models/psf_fit.py and models/linpsf.py; the dispatcher additionally
calls the per-model prefetch helpers for PSF task groups before the aperture
group runs, so by the time the PSF group starts its programs are usually
ready.
"""

from __future__ import annotations

import logging
import queue
import threading
from concurrent.futures import Future

logger = logging.getLogger(__name__)

__all__ = ["prefetch", "get", "clear"]

_executor = None
_futures: dict = {}
_keepalive: dict = {}
_lock = threading.Lock()


class _DaemonPool:
    """Tiny Future-returning pool of DAEMON threads.

    concurrent.futures.ThreadPoolExecutor joins its (non-daemon) workers at
    interpreter exit: one compile wedged on a dead remote-compiler service
    would then hang process shutdown forever (the tunnel dropping mid-
    compile is a real failure mode here — see bench._wait_for_device).
    Daemon workers let the process exit with compiles still in flight.
    """

    def __init__(self, n_workers: int, name: str):
        self._q: queue.SimpleQueue = queue.SimpleQueue()
        for i in range(n_workers):
            threading.Thread(target=self._run, name=f"{name}-{i}",
                             daemon=True).start()

    def _run(self):
        while True:
            fut, fn = self._q.get()
            if not fut.set_running_or_notify_cancel():
                continue
            try:
                fut.set_result(fn())
            except BaseException as exc:  # delivered via fut.result()
                fut.set_exception(exc)

    def submit(self, fn) -> Future:
        fut: Future = Future()
        self._q.put((fut, fn))
        return fut


def _get_executor() -> _DaemonPool:
    global _executor
    if _executor is None:
        _executor = _DaemonPool(3, "aot-compile")
    return _executor


def prefetch(key, lower_thunk, keepalive=None):
    """Submit ``lower_thunk().compile()`` for ``key`` unless already in
    flight/compiled; returns the future.

    ``keepalive``: object to pin for the cache entry's lifetime (e.g. the
    PRF instance whose ``id()`` is part of the key, so the id cannot be
    recycled to a different object while the entry lives).
    """
    with _lock:
        fut = _futures.get(key)
        if fut is None:
            fut = _get_executor().submit(lambda: lower_thunk().compile())
            _futures[key] = fut
            if keepalive is not None:
                _keepalive[key] = keepalive
    return fut


def get(key, lower_thunk, keepalive=None):
    """Compiled executable for ``key`` (blocks on the in-flight compile, or
    compiles synchronously if never prefetched).  Raises on compile failure
    after evicting the entry, so callers can fall back to plain jit."""
    fut = prefetch(key, lower_thunk, keepalive)
    try:
        return fut.result()
    except Exception:
        with _lock:
            _futures.pop(key, None)
            _keepalive.pop(key, None)
        raise


def clear() -> None:
    """Drop every cached executable (tests: compiled programs pin JIT code
    memory maps; see conftest's map-count guard)."""
    with _lock:
        _futures.clear()
        _keepalive.clear()
