"""
Nonlinear PSF photometry, batched Levenberg-Marquardt on TPU.

Behavioral counterpart of reference photometry/psf_photometry.py: per cadence,
fit (row, column, flux) of the <=5 nearest catalog stars by maximising a
likelihood (Gaussian_d / Gaussian_m / Poisson(Cash), incl. the read-noise
variance term of Erwin 2015 eq. 13 — psf_photometry.py:52-108), warm-starting
each cadence from the previous solution (:189), followed by a MOMF-style
aperture correction of the residuals inside the minimum aperture (:168-171).

TPU re-design: Nelder-Mead (1500/500 iterations per cadence, :154) is a poor
fit for SIMD hardware; instead each cadence runs a fixed-iteration damped
Gauss-Newton (Levenberg-Marquardt) with an analytic Jacobian via ``jacfwd``
of the PRF renderer — typically converging in <15 iterations — wrapped in a
``lax.scan`` over the time axis (warm starts preserved) and ``vmap`` over
targets.  Bonus over the reference: per-cadence flux *errors* from the
Gauss-Newton covariance (the reference leaves flux_err = NaN, :175).
"""

from __future__ import annotations

import functools
import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.metrics import compute_metrics_batch
from ..core.status import STATUS
from .psf_common import (CUTOFF_RADIUS, context_prf, minimum_aperture_mask,
                         setup_psf_target)

logger = logging.getLogger(__name__)

__all__ = ["fit_psf_timeseries", "extract_psf_batch"]

LM_ITERS = 12
LM_LAMBDA = 1e-3


def _pack(rows, cols, fluxes):
    return jnp.concatenate([rows, cols, fluxes])


def _unpack(p, S):
    return p[:S], p[S:2 * S], p[2 * S:]


def make_psf_fitter(prf, shape, S: int, lhood_stat: str = "Gaussian_d",
                    n_iters: int = LM_ITERS):
    """Build the jittable per-cadence LM fitting function.

    Returns ``fit(img, bkg, var_const, p0, valid) -> (p, cov_flux)`` where
    ``var_const = n_readout * readnoise^2 / gain^2``.
    """
    h, w = shape

    def render(p):
        rows, cols, fluxes = _unpack(p, S)
        params = jnp.stack([rows, cols, fluxes], axis=1)
        return prf.integrate_to_image(params, (h, w), CUTOFF_RADIUS)

    def weights(img, bkg, mdl, var_const):
        if lhood_stat == "Gaussian_d":
            var = jnp.abs(img + bkg) + var_const
        elif lhood_stat == "Gaussian_m":
            var = jnp.abs(mdl + bkg) + var_const
        elif lhood_stat == "Poisson":
            var = jnp.maximum(mdl, 1e-9)
        else:
            raise ValueError(f"Invalid statistic: '{lhood_stat}'")
        return 1.0 / jnp.maximum(var, 1e-9)

    def fit(img, bkg, var_const, p0, valid):
        good = jnp.isfinite(img)
        img0 = jnp.nan_to_num(img)

        def step(p, _):
            mdl = render(p)
            wmap = weights(img0, bkg, mdl, var_const) * good
            sw = jnp.sqrt(wmap).ravel()

            def resid(pp):
                return (sw * (img0 - render(pp)).ravel())

            r = resid(p)
            J = jax.jacfwd(resid)(p)                      # (h*w, 3S)
            # Freeze parameters of dummy stars:
            par_valid = jnp.concatenate([valid, valid, valid]).astype(J.dtype)
            J = J * par_valid[None, :]
            JtJ = J.T @ J
            damp = LM_LAMBDA * jnp.diag(jnp.diag(JtJ)) + 1e-8 * jnp.eye(3 * S)
            # Gauss-Newton: linearise r(p+dp) ~ r + J dp -> dp = -(JtJ)^-1 Jt r
            dp = -jnp.linalg.solve(JtJ + damp, J.T @ r)
            p_new = p + dp * par_valid
            rows, cols, fluxes = _unpack(p_new, S)
            # Physical constraints (reference prior: flux >= 0):
            fluxes = jnp.maximum(fluxes, 0.0)
            rows = jnp.clip(rows, -2.0, h + 1.0)
            cols = jnp.clip(cols, -2.0, w + 1.0)
            return _pack(rows, cols, fluxes), None

        p, _ = jax.lax.scan(step, p0, None, length=n_iters)
        # Flux covariance from the final Jacobian.  Dummy-star columns are
        # exactly zero, so regularise relative to the largest diagonal entry
        # (a plain inv of the near-singular matrix yields NaNs in f32):
        mdl = render(p)
        wmap = weights(img0, bkg, mdl, var_const) * good
        sw = jnp.sqrt(wmap).ravel()
        J = jax.jacfwd(lambda pp: sw * (img0 - render(pp)).ravel())(p)
        JtJ = J.T @ J
        ridge = 1e-6 * jnp.maximum(jnp.max(jnp.diag(JtJ)), 1.0)
        cov = jnp.linalg.inv(JtJ + ridge * jnp.eye(3 * S))
        flux_var = jnp.diag(cov)[2 * S:]
        flux_var = jnp.where(jnp.isfinite(flux_var), flux_var, jnp.nan)
        return p, mdl, flux_var

    return fit


@functools.partial(jax.jit, static_argnames=("prf", "shape", "S", "lhood_stat"))
def fit_psf_timeseries(images, backgrounds, var_const, p0, valid, mini_ap,
                       prf, shape, S: int, target_idx,
                       lhood_stat: str = "Gaussian_d"):
    """LM PSF fit over a whole (T, h, w) stamp stack with warm starts.

    Returns dict with flux (T,), flux_err (T,), pos (T, 2) [row, col of the
    main target in stamp coords], params (T, 3S).
    """
    fit = make_psf_fitter(prf, shape, S, lhood_stat)

    def per_frame(p_prev, inputs):
        img, bkg = inputs
        p, mdl, flux_var = fit(img, bkg, var_const, p_prev, valid)
        rows, cols, fluxes = _unpack(p, S)
        target_flux = fluxes[target_idx]
        # MOMF aperture correction on residuals (psf_photometry.py:168-171):
        resid = jnp.nan_to_num(img) - mdl
        flux_ap = jnp.sum(jnp.where(mini_ap & jnp.isfinite(img), resid, 0.0))
        out = {
            "flux": target_flux + flux_ap,
            "flux_err": jnp.sqrt(jnp.maximum(flux_var[target_idx], 0.0)),
            "pos": jnp.stack([rows[target_idx], cols[target_idx]]),
            "all_fluxes": fluxes,
            "params": p,
        }
        return p, out

    _, out = jax.lax.scan(per_frame, p0, (images, backgrounds))
    return out


def extract_psf_batch(ctx, starids, lhood_stat: str = "Gaussian_d",
                      prf=None, **_kw) -> list:
    """Nonlinear PSF photometry for a batch of targets on one context."""
    from ..core.engine import TargetResult, _full_catalog_positions
    prf = context_prf(ctx, prf)
    cat_all = _full_catalog_positions(ctx)
    var_const = ctx.n_readout * ctx.readnoise**2 / ctx.gain**2
    T = ctx.n_times

    results = []
    for sid in starids:
        setup = setup_psf_target(ctx, int(sid), cat_all)
        s = setup.stamp
        h, w = s[1] - s[0], s[3] - s[2]
        imgs = jax.lax.dynamic_slice(ctx.images, (0, s[0], s[2]), (T, h, w))
        bkgs = jax.lax.dynamic_slice(ctx.backgrounds, (0, s[0], s[2]), (T, h, w))

        # Jitter-shift the initial star positions to the first cadence:
        jit = ctx.motion.jitter_batch(ctx.time - ctx.timecorr,
                                      setup.cols0 + s[2], setup.rows0 + s[0])
        rows_t0 = setup.rows0 + np.where(setup.valid, jit[0, :, 1], 0.0)
        cols_t0 = setup.cols0 + np.where(setup.valid, jit[0, :, 0], 0.0)
        p0 = _pack(jnp.asarray(rows_t0, jnp.float32), jnp.asarray(cols_t0, jnp.float32),
                   jnp.asarray(setup.fluxes0, jnp.float32))
        mini_ap = jnp.asarray(minimum_aperture_mask(
            (h, w), setup.target_row, setup.target_col))

        out = fit_psf_timeseries(imgs, bkgs, jnp.float32(var_const), p0,
                                 jnp.asarray(setup.valid), mini_ap, prf,
                                 (h, w), len(setup.valid), setup.target_idx,
                                 lhood_stat)
        flux = np.asarray(out["flux"], np.float64)
        flux_err = np.asarray(out["flux_err"], np.float64)
        pos = np.asarray(out["pos"], np.float64)
        # centroid in 1-based CCD coords (MOM_CENTR convention):
        cent = np.stack([pos[:, 1] + s[2] + 1, pos[:, 0] + s[0] + 1], axis=1)

        fbkg = np.asarray(jnp.nansum(jnp.where(jnp.asarray(minimum_aperture_mask(
            (h, w), setup.target_row, setup.target_col))[None], bkgs, 0.0),
            axis=(1, 2)), np.float64)

        metrics = compute_metrics_batch(
            jnp.asarray(ctx.time), jnp.asarray(flux)[None],
            jnp.asarray(flux_err)[None], jnp.asarray(ctx.quality),
            jnp.asarray(cent)[None])

        mask_stamp = np.asarray(minimum_aperture_mask((h, w), setup.target_row,
                                                      setup.target_col))
        sum_stamp = ctx.sumimage[s[0]:s[1], s[2]:s[3]]
        from ..core.engine import aperture_image
        aperture = aperture_image(ctx, s, mask_stamp)

        status = STATUS.OK
        details = {
            "mean_flux": float(np.asarray(metrics["mean_flux"])[0]),
            "variance": float(np.asarray(metrics["variance"])[0]),
            "rms_hour": float(np.asarray(metrics["rms_hour"])[0]),
            "ptp": float(np.asarray(metrics["ptp"])[0]),
            "variability": float(np.asarray(metrics["variability"])[0]),
            "pos_centroid": np.asarray(metrics["pos_centroid"])[0].tolist(),
            "mask_size": int(mask_stamp.sum()),
            "stamp": tuple(s),
            "stamp_resizes": 0,
            "n_stars_fit": int(setup.valid.sum()),
        }
        if np.all(~np.isfinite(flux)):
            status = STATUS.ERROR
            details["errors"] = ["Final lightcurve fluxes are all NaNs"]

        jit_t = ctx.motion.jitter_batch(ctx.time - ctx.timecorr,
                                        [setup.target_col + s[2]],
                                        [setup.target_row + s[0]])[:, 0, :]
        t_i, tc_i = ctx.corrected_time(setup.target["ra"], setup.target["decl"])
        lc = {
            "time": t_i, "timecorr": tc_i,
            "cadenceno": ctx.cadenceno, "quality": ctx.quality,
            "flux": flux, "flux_err": flux_err, "flux_background": fbkg,
            "pos_centroid": cent, "pos_corr": jit_t,
        }
        stamp_wcs = None
        if ctx.wcs is not None:
            stamp_wcs = ctx.wcs.copy()
            if ctx.datasource == "ffi":
                stamp_wcs.crpix = stamp_wcs.crpix - np.array([s[2], s[0]])

        results.append(TargetResult(
            starid=int(sid), method="psf", status=status,
            sector=ctx.sector, camera=ctx.camera, ccd=ctx.ccd,
            cadence=ctx.cadence, data_rel=ctx.data_rel, target=setup.target,
            lightcurve=lc, mask=mask_stamp, aperture_image=aperture,
            sumimage_stamp=sum_stamp, stamp=tuple(s), details=details,
            num_frm=ctx.num_frm, n_readout=ctx.n_readout,
            ticver=ctx.catalog.settings.ticver, stamp_wcs=stamp_wcs))
    return results
