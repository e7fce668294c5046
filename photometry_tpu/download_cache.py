"""
Pre-populate caches needed by parallel photometry workers.

Behavioral counterpart of reference photometry/download_cache.py:15-60,
which pre-downloads astropy IERS tables and SPICE kernels so that a fleet of
workers does not race on cache writes.  In this framework the corresponding
shared asset is the *spacecraft ephemeris table* used for barycentric time
corrections (core.timecorr):

- when a URL source is configured (``PHOTOMETRY_TPU_EPHEMERIS_URL``), the
  table is fetched once into the cache;
- offline (the normal case in this environment), a validation-grade
  synthetic ephemeris is generated for the requested time span
  (``--testing`` mirrors the reference's S1+S27-only mode).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

from .core.timecorr import SpacecraftEphemeris
from .io.settings import sector_info

logger = logging.getLogger(__name__)

__all__ = ["cache_dir", "ephemeris_path", "download_cache", "load_cached_ephemeris"]


def cache_dir() -> str:
    d = os.environ.get("PHOTOMETRY_TPU_CACHE",
                       os.path.join(os.path.expanduser("~"), ".photometry_tpu"))
    os.makedirs(d, exist_ok=True)
    return d


def ephemeris_path() -> str:
    return os.path.join(cache_dir(), "spacecraft_ephemeris.npz")


def download_cache(testing: bool = False, jd_start: Optional[float] = None,
                   jd_end: Optional[float] = None) -> str:
    """Ensure the shared ephemeris cache exists; returns its path."""
    path = ephemeris_path()
    if os.path.exists(path):
        logger.info("Ephemeris cache already present: %s", path)
        return path

    url = os.environ.get("PHOTOMETRY_TPU_EPHEMERIS_URL")
    if url:
        import urllib.request
        tmp = path + ".part"
        logger.info("Downloading ephemeris from %s", url)
        urllib.request.urlretrieve(url, tmp)
        os.replace(tmp, path)
        return path

    # Offline: synthesize a validation-grade ephemeris covering the mission
    # (or, in testing mode, just sectors 1 + 27 like the reference):
    if jd_start is None or jd_end is None:
        table = sector_info()
        if testing:
            times = [table[1].reference_time, table[27].reference_time]
            jd_start = min(times) - 20
            jd_end = max(times) + 20
        else:
            refs = [s.reference_time for s in table.values()]
            jd_start = min(refs) - 30
            jd_end = max(refs) + 30
    logger.info("Generating synthetic ephemeris JD %.1f..%.1f", jd_start, jd_end)
    eph = SpacecraftEphemeris.synthetic(jd_start, jd_end, step_days=0.25)
    eph.save(path)
    return path


def load_cached_ephemeris() -> SpacecraftEphemeris:
    path = ephemeris_path()
    if not os.path.exists(path):
        path = download_cache()
    return SpacecraftEphemeris.load(path)
