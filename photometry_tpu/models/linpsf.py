"""
Linear PSF photometry: simultaneous least-squares fluxes with fixed centroids.

Behavioral counterpart of reference photometry/linpsf_photometry.py: star
positions are *fixed* per cadence from the jitter-shifted catalog
(linpsf_photometry.py:116 via catalog_attime); the design matrix A holds the
unit-flux PRF of each fitted star over the good pixels (:126-133); fluxes
solve the normal equations (:22-34); contamination of the main target comes
from the fitted fluxes (:206-216), WARNING above 0.1 (:214).

TPU re-design: the per-frame Python loop becomes one jitted
``lax.scan``/``vmap`` over cadences — thousands of small (npix x S) solves
batched into dense batched-LAPACK calls on the MXU.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..core.metrics import compute_metrics_batch
from ..core.status import STATUS
from .psf_common import (CUTOFF_RADIUS, context_prf, minimum_aperture_mask,
                         setup_psf_target)

logger = logging.getLogger(__name__)

__all__ = ["linpsf_timeseries", "extract_linpsf_batch"]


@functools.partial(jax.jit, static_argnames=("prf", "shape", "S"))
def linpsf_timeseries(images, rows_t, cols_t, valid, prf, shape, S: int):
    """Batched linear-PSF solves for a (T, h, w) stamp stack.

    Parameters:
        images: (T, h, w) background-subtracted fluxes (NaN = bad pixel).
        rows_t, cols_t: (T, S) jitter-shifted star positions (stamp coords).
        valid: (S,) bool of real (non-padding) stars.

    Returns dict with fluxes (T, S) and residual images (T, h, w).
    """
    h, w = shape

    def per_frame(img, rows, cols):
        A = prf.design_matrix(rows, cols, (h, w), CUTOFF_RADIUS)  # (h*w, S)
        b = jnp.nan_to_num(img).ravel()
        good = jnp.isfinite(img).ravel().astype(A.dtype)
        Aw = A * good[:, None] * valid[None, :]
        bw = b * good
        AtA = Aw.T @ Aw + 1e-9 * jnp.eye(S)
        fluxes = jnp.linalg.solve(AtA, Aw.T @ bw)
        fluxes = jnp.where(valid, fluxes, 0.0)
        model = (A @ fluxes).reshape(h, w)
        return fluxes, model

    fluxes, models = jax.vmap(per_frame)(images, rows_t, cols_t)
    return {"fluxes": fluxes, "models": models}


def extract_linpsf_batch(ctx, starids, prf=None, **_kw) -> list:
    """Linear PSF photometry for a batch of targets on one context."""
    from ..core.engine import TargetResult, _full_catalog_positions
    prf = context_prf(ctx, prf)
    cat_all = _full_catalog_positions(ctx)
    T = ctx.n_times

    results = []
    for sid in starids:
        setup = setup_psf_target(ctx, int(sid), cat_all)
        s = setup.stamp
        h, w = s[1] - s[0], s[3] - s[2]
        imgs = jax.lax.dynamic_slice(ctx.images, (0, s[0], s[2]), (T, h, w))

        # Jitter-shifted positions per cadence (catalog_attime equivalent):
        jit = ctx.motion.jitter_batch(ctx.time - ctx.timecorr,
                                      setup.cols0 + s[2], setup.rows0 + s[0])  # (T,S,2)
        rows_t = setup.rows0[None, :] + np.where(setup.valid[None, :], jit[:, :, 1], 0.0)
        cols_t = setup.cols0[None, :] + np.where(setup.valid[None, :], jit[:, :, 0], 0.0)

        out = linpsf_timeseries(imgs, jnp.asarray(rows_t, jnp.float32),
                                jnp.asarray(cols_t, jnp.float32),
                                jnp.asarray(setup.valid), prf, (h, w),
                                len(setup.valid))
        fluxes = np.asarray(out["fluxes"], np.float64)       # (T, S)
        flux = fluxes[:, setup.target_idx]

        # Contamination from fitted fluxes (linpsf_photometry.py:206-216):
        others = np.delete(np.arange(fluxes.shape[1]), setup.target_idx)
        sum_others = np.nansum(np.nanmedian(fluxes[:, others], axis=0)) if len(others) else 0.0
        med_target = np.nanmedian(flux)
        contamination = float(np.clip(sum_others / max(med_target + sum_others, 1e-30), 0, None)) \
            if (med_target + sum_others) > 0 else np.nan

        # Photon-noise flux error estimate from the variance map:
        var_const = ctx.n_readout * ctx.readnoise**2 / ctx.gain**2
        bkgs = jax.lax.dynamic_slice(ctx.backgrounds, (0, s[0], s[2]), (T, h, w))
        mini = minimum_aperture_mask((h, w), setup.target_row, setup.target_col)
        var = np.asarray(jnp.nansum(jnp.where(
            jnp.asarray(mini)[None], jnp.abs(imgs + bkgs) + var_const, 0.0), axis=(1, 2)))
        flux_err = np.sqrt(np.maximum(var, 0.0))

        pos = np.stack([np.asarray(cols_t)[:, setup.target_idx] + s[2] + 1,
                        np.asarray(rows_t)[:, setup.target_idx] + s[0] + 1], axis=1)

        fbkg = np.asarray(jnp.nansum(jnp.where(jnp.asarray(mini)[None], bkgs, 0.0),
                                     axis=(1, 2)), np.float64)
        metrics = compute_metrics_batch(
            jnp.asarray(ctx.time), jnp.asarray(flux)[None],
            jnp.asarray(flux_err)[None], jnp.asarray(ctx.quality),
            jnp.asarray(pos)[None])

        status = STATUS.OK
        details = {
            "mean_flux": float(np.asarray(metrics["mean_flux"])[0]),
            "variance": float(np.asarray(metrics["variance"])[0]),
            "rms_hour": float(np.asarray(metrics["rms_hour"])[0]),
            "ptp": float(np.asarray(metrics["ptp"])[0]),
            "variability": float(np.asarray(metrics["variability"])[0]),
            "pos_centroid": np.asarray(metrics["pos_centroid"])[0].tolist(),
            "mask_size": int(mini.sum()),
            "stamp": tuple(s),
            "stamp_resizes": 0,
            "contamination": contamination,
            "n_stars_fit": int(setup.valid.sum()),
        }
        if np.isfinite(contamination) and contamination > 0.1:
            status = STATUS.WARNING
        if np.all(~np.isfinite(flux)):
            status = STATUS.ERROR
            details["errors"] = ["Final lightcurve fluxes are all NaNs"]

        t_i, tc_i = ctx.corrected_time(setup.target["ra"], setup.target["decl"])
        lc = {
            "time": t_i, "timecorr": tc_i,
            "cadenceno": ctx.cadenceno, "quality": ctx.quality,
            "flux": flux, "flux_err": flux_err, "flux_background": fbkg,
            "pos_centroid": pos,
            "pos_corr": jit[:, setup.target_idx, :],
        }
        sum_stamp = ctx.sumimage[s[0]:s[1], s[2]:s[3]]
        from ..core.engine import aperture_image
        aperture = aperture_image(ctx, s, mini)
        add_headers = {}
        if np.isfinite(contamination):
            add_headers["AP_CONT"] = (round(contamination, 8), "Contamination from fitted fluxes")
        stamp_wcs = None
        if ctx.wcs is not None:
            stamp_wcs = ctx.wcs.copy()
            if ctx.datasource == "ffi":
                stamp_wcs.crpix = stamp_wcs.crpix - np.array([s[2], s[0]])

        results.append(TargetResult(
            starid=int(sid), method="linpsf", status=status,
            sector=ctx.sector, camera=ctx.camera, ccd=ctx.ccd,
            cadence=ctx.cadence, data_rel=ctx.data_rel, target=setup.target,
            lightcurve=lc, mask=mini, aperture_image=aperture,
            sumimage_stamp=sum_stamp, stamp=tuple(s), details=details,
            additional_headers=add_headers, num_frm=ctx.num_frm,
            n_readout=ctx.n_readout, ticver=ctx.catalog.settings.ticver,
            stamp_wcs=stamp_wcs))
    return results
