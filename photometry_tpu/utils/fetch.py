"""Batched device->host fetches.

Every synchronous ``np.asarray(device_array)`` costs one full host<->device
round trip before the next can start (~30 ms each through the dev tunnel;
a PCIe host pays latency too, just less).  The drain fetches several
device outputs per lease batch (masks, flux tuple, metrics dict, crowding
dict, fit outputs) — issuing ALL the copies asynchronously first and only
then materialising them overlaps the transfers, so a group of fetches
costs ~one round trip instead of one per array.
"""

from __future__ import annotations

import numpy as np

__all__ = ["fetch_all", "fetch_dict"]


def _start(a):
    fn = getattr(a, "copy_to_host_async", None)
    if fn is not None:
        try:
            fn()
        except Exception:  # pragma: no cover - backend without async copies
            pass


def fetch_all(*arrays):
    """np.asarray of every argument, transfers overlapped.  Returns a tuple
    (or a single array for a single argument)."""
    for a in arrays:
        _start(a)
    out = tuple(np.asarray(a) for a in arrays)
    return out[0] if len(out) == 1 else out


def fetch_dict(d: dict) -> dict:
    """np.asarray of every value of ``d``, transfers overlapped."""
    for v in d.values():
        _start(v)
    return {k: np.asarray(v) for k, v in d.items()}
