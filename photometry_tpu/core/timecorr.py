"""
Barycentric time correction from a spacecraft ephemeris table.

The reference computes per-target barycentric corrections with CSPICE
(photometry/spice.py: TESS_SPICE.barycorr at :349-383, kernels downloaded
from tasoc.dk).  Re-design for TPU: ephemerides stay a *host-side data
problem* — a packed table of spacecraft positions relative to the solar
system barycentre — while the per-(target, cadence) correction

    timecorr = (r_sc(t) . n_hat(ra, dec)) / c        [Romer delay]

is evaluated on device: one table interpolation + one dot product, batched
over all stars and cadences of a sector in a single jitted program
(replacing the per-star astropy ``light_travel_time`` calls).

Ephemeris sources:
- :meth:`SpacecraftEphemeris.load` — npz table (columns ``time`` [JD TDB],
  ``pos`` [km, (N,3) barycentric]); produce these offline from SPICE/JPL
  Horizons for real TESS data.
- :meth:`SpacecraftEphemeris.synthetic` — analytic Earth orbit (Kepler,
  e=0.0167) plus a TESS-like 13.7-day geocentric ellipse; exact enough for
  tests and for validating the pipeline plumbing (~seconds-level absolute
  accuracy; the *differential* correction across a CCD is exact to ~ms).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SpacecraftEphemeris", "TimeCorrector"]

C_KM_PER_DAY = 299792.458 * 86400.0  #: speed of light [km/day]
AU_KM = 149597870.7
GM_SUN_C3_DAYS = 4.92549094764e-6 / 86400.0  #: GM_sun/c^3 [days] (Shapiro scale)


@dataclass
class SpacecraftEphemeris:
    """Barycentric spacecraft positions sampled on a time grid.

    ``pos_earth`` (optional) carries the Earth geocentre's barycentric
    positions on the same grid; it enables the Einstein (clock) term of
    :meth:`TimeCorrector.barycentric_correction_full` (reference
    spice.py:424-428 computes it from the TESS-geocentric position and the
    Earth's barycentric velocity).
    """

    time: np.ndarray   #: (M,) JD (TDB)
    pos: np.ndarray    #: (M, 3) km, ICRS axes, relative to the SSB
    pos_earth: "np.ndarray | None" = None  #: (M, 3) km Earth geocentre wrt SSB

    @classmethod
    def load(cls, path: str) -> "SpacecraftEphemeris":
        with np.load(path) as d:
            pe = (np.asarray(d["pos_earth"], np.float64)
                  if "pos_earth" in d else None)
            return cls(time=np.asarray(d["time"], np.float64),
                       pos=np.asarray(d["pos"], np.float64), pos_earth=pe)

    def save(self, path: str):
        extra = {}
        if self.pos_earth is not None:
            extra["pos_earth"] = self.pos_earth
        np.savez_compressed(path, time=self.time, pos=self.pos, **extra)

    @classmethod
    def synthetic(cls, jd_start: float, jd_end: float, step_days: float = 0.25
                  ) -> "SpacecraftEphemeris":
        """Analytic Earth + TESS-like orbit ephemeris (validation grade).

        Earth positions are BARYCENTRIC: heliocentric low-precision solar
        coordinates plus the Sun-SSB offset from giant-planet Kepler
        elements (core/ephem_analytic) — the offset is up to ~2.5
        light-seconds and omitting it (as before round 5) dominated the
        absolute Rømer error.  Residual absolute error ~0.1 light-seconds;
        the TESS HEO itself is an analytic stand-in (flight orbit needs a
        Horizons export, tools/make_ephemeris.py).
        """
        from .ephem_analytic import earth_barycentric, tess_geocentric
        t = np.arange(jd_start, jd_end + step_days, step_days)
        earth = earth_barycentric(t)
        return cls(time=t, pos=earth + tess_geocentric(t), pos_earth=earth)


class TimeCorrector:
    """Batched barycentric (Romer) time corrections.

    The interpolation + dot product run in float64 on the host: JAX here is
    float32 by default, and timestamps at JD ~2.45e6 need sub-second (~1e-11
    relative) precision.  The cost is one (N, 3) @ (3, T) matmul — microseconds
    for a whole sector, so nothing is lost by not putting it on device.
    """

    def __init__(self, ephemeris: SpacecraftEphemeris):
        self.eph = ephemeris
        self._t = np.asarray(ephemeris.time, np.float64)
        self._p = np.asarray(ephemeris.pos, np.float64)

    def position(self, jd) -> np.ndarray:
        """Interpolated spacecraft position(s) [km] at JD (TDB)."""
        return self._interp(np.atleast_1d(np.asarray(jd, np.float64)))

    def _interp(self, jd):
        i = np.clip(np.searchsorted(self._t, jd, side="right") - 1,
                    0, self._t.shape[0] - 2)
        t0 = self._t[i]
        t1 = self._t[i + 1]
        w = np.clip((jd - t0) / np.maximum(t1 - t0, 1e-30), 0.0, 1.0)
        return self._p[i] * (1 - w)[..., None] + self._p[i + 1] * w[..., None]

    def _interp_earth(self, jd):
        pe = self.eph.pos_earth
        i = np.clip(np.searchsorted(self._t, jd, side="right") - 1,
                    0, self._t.shape[0] - 2)
        t0 = self._t[i]
        t1 = self._t[i + 1]
        w = np.clip((jd - t0) / np.maximum(t1 - t0, 1e-30), 0.0, 1.0)
        return pe[i] * (1 - w)[..., None] + pe[i + 1] * w[..., None]

    def barycentric_correction(self, time_nocorr, ra, dec, btjd: bool = True):
        """timecorr [days] for each (target, cadence).

        Parameters:
            time_nocorr: (T,) uncorrected (spacecraft) timestamps —
                BTJD (JD - 2457000) when ``btjd`` else plain JD.
            ra, dec: scalars or (N,) target coordinates in degrees.

        Returns:
            (T,) when ra/dec are scalars, else (N, T) array of corrections
            such that ``time_bary = time_nocorr + timecorr``.
        """
        t = np.asarray(time_nocorr, np.float64)
        jd = t + 2457000.0 if btjd else t
        pos = self._interp(jd)                       # (T, 3)
        ra_r = np.deg2rad(np.atleast_1d(np.asarray(ra, np.float64)))
        dec_r = np.deg2rad(np.atleast_1d(np.asarray(dec, np.float64)))
        n_hat = np.stack([np.cos(dec_r) * np.cos(ra_r),
                          np.cos(dec_r) * np.sin(ra_r),
                          np.sin(dec_r)], axis=1)    # (N, 3)
        corr = (n_hat @ pos.T) / C_KM_PER_DAY        # (N, T)
        if np.ndim(ra) == 0:
            return corr[0]
        return corr

    def apply(self, time_nocorr, ra, dec, btjd: bool = True):
        """(corrected_time, timecorr) for one target (BasePhotometry.py:443-453)."""
        corr = self.barycentric_correction(time_nocorr, ra, dec, btjd=btjd)
        return np.asarray(time_nocorr, np.float64) + corr, corr

    # --- reference TESS_SPICE API parity (photometry/spice.py) --------------

    def position_velocity(self, jd) -> tuple:
        """(pos [km], vel [km/s]) at JD (TDB) — counterpart of
        TESS_SPICE.position_velocity (spice.py:281-309), velocity by central
        finite difference of the ephemeris table (dt = 60 s)."""
        jd = np.atleast_1d(np.asarray(jd, np.float64))
        dt = 60.0 / 86400.0
        pos = self._interp(jd)
        vel = (self._interp(jd + dt) - self._interp(jd - dt)) / (2 * dt * 86400.0)
        return pos, vel

    def time_coverage(self) -> tuple:
        """(jd_first, jd_last) validity interval of the loaded ephemeris
        (counterpart of TESS_SPICE.time_coverage, spice.py:434-471)."""
        return float(self._t[0]), float(self._t[-1])

    def sclk2jd(self, sclk, epoch_jd: float = 2457000.0, rate: float = 86400.0):
        """Spacecraft-clock seconds -> JD (TDB) via a linear clock model.

        The reference converts with the CSPICE SCLK kernel
        (TESS_SPICE.sclk2jd, spice.py:328-346); without kernels we model the
        clock as ``epoch_jd + sclk / rate`` — exact for a drift-free clock,
        and the epoch/rate are overridable when a real clock solution is
        available.
        """
        return epoch_jd + np.asarray(sclk, np.float64) / rate

    def barycentric_correction_full(self, time_nocorr, ra, dec,
                                    btjd: bool = True):
        """Rømer + Shapiro + Einstein correction [days] (counterpart of
        TESS_SPICE.barycorr2's explicit delay sum, spice.py:386-431).

        The Shapiro term uses -(2 GM_sun/c^3) ln(1 - cos psi) with the Sun
        approximated at the solar-system barycentre (the offset is <0.01 AU,
        i.e. a few-percent error on a <=20 microsecond term).  The Einstein
        (clock) term follows the reference's formulation — the topocentric
        dot(r_sc/geo, v_earth/SSB) / c^2 site correction (spice.py:424-428;
        the geocentric TDB-TT conversion itself is part of the input
        timescale) — and requires Earth positions in the ephemeris
        (``SpacecraftEphemeris.pos_earth``); without them it is omitted,
        as in releases before round 4.
        """
        t = np.asarray(time_nocorr, np.float64)
        jd = t + 2457000.0 if btjd else t
        pos = self._interp(jd)                                    # (T, 3)
        ra_r = np.deg2rad(np.atleast_1d(np.asarray(ra, np.float64)))
        dec_r = np.deg2rad(np.atleast_1d(np.asarray(dec, np.float64)))
        n_hat = np.stack([np.cos(dec_r) * np.cos(ra_r),
                          np.cos(dec_r) * np.sin(ra_r),
                          np.sin(dec_r)], axis=1)                 # (N, 3)
        romer = (n_hat @ pos.T) / C_KM_PER_DAY                    # (N, T)
        r = np.linalg.norm(pos, axis=1)                          # (T,) sc->SSB(~Sun)
        cos_psi = -(n_hat @ pos.T) / np.maximum(r, 1e-30)        # sc->Sun vs sc->target
        shapiro = -2.0 * GM_SUN_C3_DAYS * np.log(
            np.maximum(1.0 - cos_psi, 1e-12))
        corr = romer + shapiro
        if self.eph.pos_earth is not None:
            earth = self._interp_earth(jd)                        # (T, 3) km
            geo = pos - earth                                     # sc wrt geocentre
            # Earth barycentric velocity by central difference (km/s):
            dt = 60.0 / 86400.0
            v_earth = (self._interp_earth(jd + dt)
                       - self._interp_earth(jd - dt)) / (2 * dt * 86400.0)
            c_kms = 299792.458
            einstein_s = np.sum(geo * v_earth, axis=1) / c_kms**2  # (T,) s
            corr = corr + einstein_s[None, :] / 86400.0
        if np.ndim(ra) == 0:
            return corr[0]
        return corr
