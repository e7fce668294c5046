"""
Lightweight tracing / profiling hooks.

The reference instruments per-task wall-clock only (timeit timers persisted
into the diagnostics table and EMA summaries — taskmanager.py:543-592,
run_tessphot_mpi.py:167-186).  The TPU equivalents here:

- :class:`StageTimer` — named wall-clock stages accumulated into a dict
  that callers merge into the diagnostics store (same destination as the
  reference's ``elaptime``/``worker_wait_time``).
- :func:`device_trace` — a context manager around ``jax.profiler`` so any
  pipeline section can dump an XLA trace viewable in TensorBoard/Perfetto
  (set ``PHOTOMETRY_TPU_TRACE_DIR`` or pass a directory).
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from typing import Optional

logger = logging.getLogger(__name__)

__all__ = ["StageTimer", "device_trace"]


class StageTimer:
    """Accumulate named wall-clock stages; ``timings`` is {name: seconds}."""

    def __init__(self):
        self.timings = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        tic = time.perf_counter()
        try:
            yield
        finally:
            self.timings[name] = self.timings.get(name, 0.0) + (time.perf_counter() - tic)

    def log(self, prefix: str = ""):
        for name, secs in sorted(self.timings.items(), key=lambda kv: -kv[1]):
            logger.info("%s%s: %.3f s", prefix, name, secs)

    def as_details(self) -> dict:
        """Flatten for the diagnostics store (seconds, 'time_' prefixed)."""
        return {f"time_{k}": round(v, 6) for k, v in self.timings.items()}


@contextlib.contextmanager
def device_trace(trace_dir: Optional[str] = None, enabled: Optional[bool] = None):
    """Capture a JAX device trace for the enclosed block.

    No-op unless a directory is given or PHOTOMETRY_TPU_TRACE_DIR is set.
    """
    if trace_dir is None:
        trace_dir = os.environ.get("PHOTOMETRY_TPU_TRACE_DIR")
    if enabled is None:
        enabled = bool(trace_dir)
    if not enabled or not trace_dir:
        yield
        return
    import jax
    os.makedirs(trace_dir, exist_ok=True)
    try:
        jax.profiler.start_trace(trace_dir)
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("Device trace written to %s", trace_dir)
