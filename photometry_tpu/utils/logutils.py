"""
Log-capture utilities.

Counterpart of the reference's ListHandler (utilities.py:439-458) and its
use in BasePhotometry (BasePhotometry.py:171-179): warnings and errors
logged while a target's photometry runs are collected and persisted into
the diagnostics ``errors`` column (BasePhotometry.py:1409-1414).
"""

from __future__ import annotations

import logging
from contextlib import contextmanager

__all__ = ["ListHandler", "capture_warnings"]


class ListHandler(logging.Handler):
    """A logging.Handler that appends formatted messages to a list.

    Not thread-safe (like the reference's); the pipeline's workers are
    separate processes, so each owns its queue.
    """

    def __init__(self, message_queue: list, level=logging.WARNING):
        super().__init__(level)
        self.message_queue = message_queue
        self.setFormatter(logging.Formatter("%(levelname)s: %(message)s"))

    def emit(self, record):
        self.message_queue.append(self.format(record).rstrip("\n"))


@contextmanager
def capture_warnings(logger_name: str = "photometry_tpu",
                     level=logging.WARNING):
    """Collect WARNING+ messages logged under ``logger_name`` into a list."""
    queue: list = []
    handler = ListHandler(queue, level=level)
    lg = logging.getLogger(logger_name)
    lg.addHandler(handler)
    try:
        yield queue
    finally:
        lg.removeHandler(handler)
