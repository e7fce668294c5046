"""
Numeric utilities, JAX-first.

Behavioral counterparts of reference photometry/utilities.py (mag2flux :134,
add_proper_motion :65, sphere_distance :152, radec<->cartesian :182-224,
integratedGaussian :100, rms_timescale :227, move_median_central :52,
find_nearest :267), re-implemented so that every function is pure, shape-static
and usable under ``jax.jit`` / ``jax.vmap``.  NaN handling follows the
reference semantics (NaNs are ignored, not propagated).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

#: 1 / norm.ppf(3/4) — converts a median absolute deviation to a sigma.
MAD_TO_SIGMA = 1.482602218505602

#: Default TESS magnitude zero-point (TASOC DR5, sectors 1-5).
TESS_ZEROPOINT = 20.451


def mag2flux(mag, zp: float = TESS_ZEROPOINT):
    """Approximate conversion from TESS magnitude to flux (e-/s).

    Dtype-transparent: jax inputs (incl. tracers) stay on device; host
    scalars/ndarrays compute in NumPy.  The drain's per-target host calls
    (engine result assembly, dispatcher halo-switch predicate) previously
    paid one eager device dispatch + fetch EACH — ~30 ms of tunnel RTT per
    target, the dominant cost of the measured production drain.
    """
    if isinstance(mag, jax.Array):
        return jnp.clip(10.0 ** (-0.4 * (mag - zp)), 0.0, None)
    return np.clip(10.0 ** (-0.4 * (np.asarray(mag, np.float64) - zp)),
                   0.0, None)


def flux2mag(flux, zp: float = TESS_ZEROPOINT):
    """Inverse of :func:`mag2flux` (dtype-transparent like it)."""
    if isinstance(flux, jax.Array):
        return -2.5 * jnp.log10(flux) + zp
    return -2.5 * np.log10(np.asarray(flux, np.float64)) + zp


def add_proper_motion(ra, dec, pm_ra, pm_dec, bjd, epoch=2000.0):
    """Project (ra, dec) [deg] with proper motions [mas/yr] to epoch ``bjd`` [JD].

    ``pm_ra`` is the catalog mu_alpha* (projected); the unprojection uses the
    mean declination between the two epochs, matching the reference
    (photometry/utilities.py:65-97).
    """
    ra = jnp.asarray(ra, dtype=jnp.float64) if jax.config.jax_enable_x64 else jnp.asarray(ra)
    dec = jnp.asarray(dec, dtype=ra.dtype)
    epoch_now = (jnp.asarray(bjd) - 2451544.5) / 365.25 + 2000.0
    dt_years = epoch_now - epoch
    dec_rate = jnp.asarray(pm_dec) / 3.6e6  # deg/yr
    dec_new = dec + dt_years * dec_rate
    ra_rate = jnp.asarray(pm_ra) / jnp.cos(jnp.deg2rad(dec + dt_years * dec_rate / 2.0)) / 3.6e6
    ra_new = ra + dt_years * ra_rate
    return ra_new, dec_new


def sphere_distance(ra1, dec1, ra2, dec2):
    """Great-circle distance in degrees (Vincenty formula, stable at poles)."""
    ra1, ra2 = jnp.deg2rad(jnp.asarray(ra1)), jnp.deg2rad(jnp.asarray(ra2))
    dec1, dec2 = jnp.deg2rad(jnp.asarray(dec1)), jnp.deg2rad(jnp.asarray(dec2))
    dra = ra2 - ra1
    num = jnp.sqrt((jnp.cos(dec2) * jnp.sin(dra)) ** 2
                   + (jnp.cos(dec1) * jnp.sin(dec2)
                      - jnp.sin(dec1) * jnp.cos(dec2) * jnp.cos(dra)) ** 2)
    den = jnp.sin(dec1) * jnp.sin(dec2) + jnp.cos(dec1) * jnp.cos(dec2) * jnp.cos(dra)
    return jnp.rad2deg(jnp.arctan2(num, den))


def radec_to_cartesian(radec):
    """(N,2) array of (ra, dec) in degrees -> (N,3) unit vectors."""
    radec = jnp.atleast_2d(jnp.asarray(radec))
    phi = jnp.deg2rad(radec[:, 0])
    theta = jnp.pi / 2 - jnp.deg2rad(radec[:, 1])
    return jnp.stack([jnp.sin(theta) * jnp.cos(phi),
                      jnp.sin(theta) * jnp.sin(phi),
                      jnp.cos(theta)], axis=1)


def cartesian_to_radec(xyz):
    """(N,3) unit vectors -> (N,2) array of (ra, dec) in degrees, ra in [0, 360)."""
    xyz = jnp.atleast_2d(jnp.asarray(xyz))
    dec = jnp.pi / 2 - jnp.arccos(jnp.clip(xyz[:, 2], -1.0, 1.0))
    ra = jnp.arctan2(xyz[:, 1], xyz[:, 0])
    ra = jnp.where(ra < 0, ra + 2 * jnp.pi, ra)
    return jnp.rad2deg(jnp.stack([ra, dec], axis=1))


def integrated_gaussian(x, y, flux, x_0, y_0, sigma=1.0):
    """Symmetric 2-D Gaussian integrated over unit pixels centred at (x, y)."""
    denom = jnp.sqrt(2.0) * sigma
    ex = jax.scipy.special.erf((x - x_0 + 0.5) / denom) - jax.scipy.special.erf((x - x_0 - 0.5) / denom)
    ey = jax.scipy.special.erf((y - y_0 + 0.5) / denom) - jax.scipy.special.erf((y - y_0 - 0.5) / denom)
    return flux / 4.0 * ex * ey


def nanmedian(x, axis=None):
    """NaN-ignoring median (thin wrapper, kept for call-site clarity)."""
    return jnp.nanmedian(jnp.asarray(x), axis=axis)


def nanmad(x, axis=None, scale_to_sigma: bool = False):
    """Median absolute deviation, ignoring NaNs; optionally scaled to sigma."""
    x = jnp.asarray(x)
    med = jnp.nanmedian(x, axis=axis, keepdims=axis is not None)
    mad = jnp.nanmedian(jnp.abs(x - med), axis=axis)
    return mad * MAD_TO_SIGMA if scale_to_sigma else mad


def rms_timescale(time, flux, timescale: float = 3600 / 86400, max_bins: int = 1024):
    """Robust RMS of ``flux`` binned to ``timescale`` (days).

    JAX re-design of reference photometry/utilities.py:227-264: the binned
    means are computed with a segment-sum over static-size bins so the whole
    metric runs on device under ``jit``/``vmap``.  Bins beyond the actual
    time span are masked out; ``max_bins`` must be a static upper bound on
    ``span/timescale`` (1024 covers a 42-day sector at 1-hour bins).
    Returns NaN for an all-NaN flux vector.

    Host-path parity (utilities.py:242-252): called with concrete (non-traced)
    inputs and a non-all-NaN flux, an empty / all-NaN / zero-span time vector
    raises ValueError like the reference.  Under jit/vmap the data-dependent
    raise is impossible, so the traced path returns NaN instead (documented
    deviation).
    """
    if not isinstance(time, jax.core.Tracer) and not isinstance(flux, jax.core.Tracer):
        t_host = np.asarray(time)
        f_host = np.asarray(flux)
        flux_allnan = f_host.size == 0 or bool(np.all(~np.isfinite(f_host)))
        if not flux_allnan:
            if t_host.size == 0 or bool(np.all(~np.isfinite(t_host))):
                raise ValueError("Invalid time-vector specified. No valid timestamps.")
            tmin_h, tmax_h = np.nanmin(t_host), np.nanmax(t_host)
            if not np.isfinite(tmin_h) or not np.isfinite(tmax_h) or tmax_h - tmin_h <= 0:
                raise ValueError("Invalid time-vector specified")
    time = jnp.asarray(time)
    flux = jnp.asarray(flux)
    tmin = jnp.nanmin(time)
    tmax = jnp.nanmax(time)
    span = tmax - tmin
    nbins = jnp.minimum(jnp.ceil(span / timescale).astype(jnp.int32) + 1, max_bins)
    good = jnp.isfinite(flux) & jnp.isfinite(time)
    idx = jnp.clip(((time - tmin) / timescale).astype(jnp.int32), 0, max_bins - 1)
    idx = jnp.where(good, idx, max_bins - 1)
    w = good.astype(flux.dtype)
    sums = jax.ops.segment_sum(jnp.where(good, flux, 0.0), idx, num_segments=max_bins)
    cnts = jax.ops.segment_sum(w, idx, num_segments=max_bins)
    bin_ids = jnp.arange(max_bins)
    valid = (cnts > 0) & (bin_ids < nbins)
    means = jnp.where(valid, sums / jnp.maximum(cnts, 1.0), jnp.nan)
    med = jnp.nanmedian(jnp.where(valid, means, jnp.nan))
    mad = jnp.nanmedian(jnp.where(valid, jnp.abs(means - med), jnp.nan))
    return jnp.where(jnp.any(good), MAD_TO_SIGMA * mad, jnp.nan)


def ptp_metric(flux):
    """Median point-to-point scatter: nanmedian(|diff(flux)|)."""
    flux = jnp.asarray(flux)
    return jnp.nanmedian(jnp.abs(jnp.diff(flux)))


def find_nearest(array, value):
    """Index of the element of ``array`` closest to ``value`` (NaN-safe)."""
    array = jnp.asarray(array)
    dist = jnp.abs(array - value)
    dist = jnp.where(jnp.isnan(array), jnp.inf, dist)
    return jnp.argmin(dist)


def moving_median_central(x, width: int, axis: int = 0):
    """Centred moving median along ``axis`` with shrinking edge windows.

    Matches the edge semantics of the reference's bottleneck-based
    ``move_median_central`` (photometry/utilities.py:52-62): at position k the
    window is ``x[max(0, k-w//2) : k+w//2+1]`` computed over available points.
    Implemented as a static gather of all windows + ``nanmedian`` over the
    window axis — vectorised, TPU-friendly, O(N * width log width).
    """
    x = jnp.asarray(x)
    x = jnp.moveaxis(x, axis, 0)
    n = x.shape[0]
    half = width // 2
    offs = jnp.arange(width) - half
    pos = jnp.arange(n)[:, None] + offs[None, :]
    valid = (pos >= 0) & (pos < n)
    pos = jnp.clip(pos, 0, n - 1)
    windows = x[pos]  # (n, width, ...)
    windows = jnp.where(valid.reshape(valid.shape + (1,) * (x.ndim - 1)), windows, jnp.nan)
    out = jnp.nanmedian(windows, axis=1)
    return jnp.moveaxis(out, 0, axis)


def polyfit_detrend(time, flux, flux_err, order: int = 3):
    """Weighted polynomial fit used by the variability metric.

    JAX equivalent of ``np.polyfit(t - tmin, flux, 3, w=1/flux_err)`` followed
    by ``np.polyval`` (reference photometry/BasePhotometry.py:1373-1388), via
    a weighted normal-equations solve on a Vandermonde basis.  NaNs in any
    input are excluded from the fit.
    """
    time = jnp.asarray(time)
    flux = jnp.asarray(flux)
    flux_err = jnp.asarray(flux_err)
    good = jnp.isfinite(time) & jnp.isfinite(flux) & jnp.isfinite(flux_err)
    tmin = jnp.nanmin(jnp.where(good, time, jnp.nan))
    t = jnp.where(good, time - tmin, 0.0)
    w = jnp.where(good, 1.0 / jnp.maximum(flux_err, 1e-30), 0.0)
    # Vandermonde (highest power first, as np.polyfit):
    powers = jnp.arange(order, -1, -1)
    A = t[:, None] ** powers[None, :]
    Aw = A * w[:, None]
    bw = jnp.where(good, flux, 0.0) * w
    ATA = Aw.T @ Aw + 1e-12 * jnp.eye(order + 1)
    ATb = Aw.T @ bw
    coeffs = jnp.linalg.solve(ATA, ATb)
    detrend = ((time - tmin)[:, None] ** powers[None, :]) @ coeffs
    n_good = jnp.sum(good)
    return jnp.where(n_good > (order + 1), detrend, 0.0)


def np_moving_median_central(x: np.ndarray, width: int, axis: int = 0) -> np.ndarray:
    """Host/numpy version of :func:`moving_median_central` for IO paths."""
    x = np.moveaxis(np.asarray(x, dtype=float), axis, 0)
    n = x.shape[0]
    half = width // 2
    out = np.empty_like(x)
    for k in range(n):
        lo, hi = max(0, k - half), min(n, k + half + 1)
        out[k] = np.nanmedian(x[lo:hi], axis=0)
    return np.moveaxis(out, 0, axis)
