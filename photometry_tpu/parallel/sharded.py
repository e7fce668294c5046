"""
Sharded whole-cube programs: multi-chip prepare + extraction steps.

These are the multi-device forms of the hot pipeline stages.  The sector
cube lives time-sharded across the mesh (a full TESS CCD stack at 200 s
cadence exceeds single-chip HBM — SURVEY §7 "hard parts" #7); targets shard
across the orthogonal mesh axis.  XLA inserts the collectives from the
shardings; the only hand-written communication is the ``ppermute`` halo
exchange for the background time-smoothing window.

The extraction runs the *same* dense-gather program as the single-chip
production engine (core.engine.extract_flux_core) as the per-shard body of
a ``shard_map`` — every output element depends on exactly one
(target, cadence) pair, so time x target sharding is exact (bitwise equal
to the single-device result; asserted in tests/test_parallel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import TIME_AXIS, TARGET_AXIS, cube_sharding, targets_sharding

__all__ = ["sharded_psf_fit",
           "sharded_time_smooth", "sharded_sumimage", "sharded_extract_flux",
           "prepare_step", "extraction_step", "pad_to_multiple"]


def pad_to_multiple(arr, axis: int, multiple: int, fill=np.nan):
    """Pad ``arr`` along ``axis`` up to the next multiple (host-side).

    Returns (padded, original_size).  Sharded programs need every sharded
    axis divisible by its mesh-axis size; callers slice the outputs back.
    """
    arr = np.asarray(arr)
    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad_shape = list(arr.shape)
    pad_shape[axis] = rem
    pad = np.full(pad_shape, fill, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=axis), n


def sharded_time_smooth(bkg, mesh, window: int = 3):
    """Moving-mean smoothing along the sharded time axis with halo exchange.

    Each shard sends its ``window//2`` boundary frames to its neighbours with
    ``ppermute`` over the ICI ring, then smooths locally — the multi-chip
    form of reference prepare.py:309-338.
    """
    half = window // 2

    def local_smooth(x):
        # x: (T_local, H, W) on this shard
        axis = TIME_AXIS
        n = jax.lax.axis_size(axis)
        idx = jax.lax.axis_index(axis)
        # halo frames from the previous/next shard:
        fwd = [(i, (i + 1) % n) for i in range(n)]
        bwd = [(i, (i - 1) % n) for i in range(n)]
        prev_tail = jax.lax.ppermute(x[-half:], axis, fwd)   # from idx-1
        next_head = jax.lax.ppermute(x[:half], axis, bwd)    # from idx+1
        # Ring wraparound is invalid at the ends — mask those frames out by
        # NaN and use nanmean-style weighting:
        valid_prev = (idx > 0)
        valid_next = (idx < n - 1)
        prev_tail = jnp.where(valid_prev, prev_tail, jnp.nan)
        next_head = jnp.where(valid_next, next_head, jnp.nan)
        ext = jnp.concatenate([prev_tail, x, next_head], axis=0)
        Tl = x.shape[0]
        out = []
        for k in range(window):
            out.append(ext[k:k + Tl])
        stack = jnp.stack(out, axis=0)
        cnt = jnp.sum(jnp.isfinite(stack), axis=0)
        return jnp.nansum(jnp.where(jnp.isfinite(stack), stack, 0.0), axis=0) / jnp.maximum(cnt, 1)

    fn = jax.shard_map(local_smooth, mesh=mesh,
                       in_specs=P(TIME_AXIS, None, None),
                       out_specs=P(TIME_AXIS, None, None))
    return fn(bkg)


def sharded_sumimage(images, quality_good, mesh):
    """Mean of quality-good frames over the time-sharded cube (psum reduce)."""
    def local(imgs, good):
        g = good[:, None, None]
        finite = jnp.isfinite(imgs) & g
        s = jnp.sum(jnp.where(finite, imgs, 0.0), axis=0)
        n = jnp.sum(finite, axis=0)
        s = jax.lax.psum(s, TIME_AXIS)
        n = jax.lax.psum(n, TIME_AXIS)
        return s / jnp.maximum(n, 1)

    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(TIME_AXIS, None, None), P(TIME_AXIS)),
                       out_specs=P())
    return fn(images, quality_good)


def sharded_extract_flux(images, images_err, backgrounds, pixelflags,
                         masks, r0s, c0s, mesh, h: int, w: int,
                         windows=None):
    """Production aperture extraction over a (time x targets) mesh.

    Runs core.engine.extract_flux_core — the dense-gather formulation that
    replaces the reference's per-frame HDF5 reads (BasePhotometry.py:720-751,
    1323-1414) — as the per-shard program of a ``shard_map``: each
    (time-shard, target-shard) device computes its (N_local, T_local) output
    block with zero communication.

    Inputs may be host numpy; they are placed with explicit mesh shardings
    (cubes time-sharded, masks/corners/windows target-sharded).  T must
    divide by the time-axis size and N by the target-axis size (see
    :func:`pad_to_multiple`).  ``windows`` (N, h, w) bool optionally limits
    the shenanigans reduction to each target's logical stamp, exactly as in
    the single-chip engine.
    Returns (flux, flux_err, flux_bkg, centroid, shenanigans) with (N, T)
    leading layout, sharded P(targets, time).
    """
    from ..core.engine import extract_flux_core

    cs = cube_sharding(mesh)
    ts3 = targets_sharding(mesh, 3)
    images = jax.device_put(images, cs)
    images_err = jax.device_put(images_err, cs)
    backgrounds = jax.device_put(backgrounds, cs)
    pixelflags = jax.device_put(pixelflags, cs)
    masks = jax.device_put(masks, ts3)
    r0s = jax.device_put(np.asarray(r0s, np.int32), targets_sharding(mesh, 1))
    c0s = jax.device_put(np.asarray(c0s, np.int32), targets_sharding(mesh, 1))

    in_specs = ((P(TIME_AXIS, None, None),) * 4
                + (P(TARGET_AXIS, None, None), P(TARGET_AXIS), P(TARGET_AXIS)))
    out_specs = ((P(TARGET_AXIS, TIME_AXIS),) * 3
                 + (P(TARGET_AXIS, TIME_AXIS, None), P(TARGET_AXIS, TIME_AXIS)))
    args = [images, images_err, backgrounds, pixelflags, masks, r0s, c0s]
    if windows is not None:
        in_specs = in_specs + (P(TARGET_AXIS, None, None),)
        args.append(jax.device_put(windows, ts3))

        def local(im, er, bk, fl, mk, r0, c0, win):
            return extract_flux_core(im, er, bk, fl, mk, r0, c0,
                                     h=h, w=w, windows=win)
    else:
        local = functools.partial(extract_flux_core, h=h, w=w)

    body = jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs)
    return jax.jit(body)(*args)


def sharded_band_extract(images, images_err, backgrounds, pixelflags,
                         masks, r0s, c0s, mesh, h: int, w: int,
                         t_block: int = 128, interpret: bool = False,
                         windows=None):
    """Time-sharded banded extraction: the full-pass MXU kernel
    (ops.bandext) runs per time shard under ``shard_map``.

    The production multi-chip configuration for dense target fields: each
    device streams its local time slice of the cubes once through the band
    kernel; piece patches are target-replicated (small); outputs come back
    (N, T) with T sharded.  Exactness is inherited — every output element
    depends on one (target, cadence) pair.
    """
    from ..ops.bandext import band_extract_flux_batch, build_piece_patches
    T, H, W = images.shape
    n_time = mesh.shape[TIME_AXIS]
    if T % n_time:
        raise ValueError(f"T={T} must divide the time-axis size {n_time}")
    pieces = build_piece_patches(np.asarray(masks), r0s, c0s, (H, W),
                                 windows=windows)

    cs = NamedSharding(mesh, P(TIME_AXIS, None, None))
    images = jax.device_put(images, cs)
    images_err = jax.device_put(images_err, cs)
    backgrounds = jax.device_put(backgrounds, cs)
    pixelflags = jax.device_put(pixelflags, cs)

    def local(im, er, bk, fl):
        return band_extract_flux_batch(
            im, er, bk, fl, masks, r0s, c0s, h, w,
            t_block=min(t_block, T // n_time), interpret=interpret,
            pieces=pieces)

    out_specs = ((P(None, TIME_AXIS),) * 3
                 + (P(None, TIME_AXIS, None), P(None, TIME_AXIS)))
    # check_vma=False: pallas_call inside shard_map cannot annotate the
    # varying-mesh-axes of its outputs (jax would otherwise require `vma`
    # on every ShapeDtypeStruct).
    body = jax.shard_map(local, mesh=mesh,
                         in_specs=(P(TIME_AXIS, None, None),) * 4,
                         out_specs=out_specs, check_vma=False)
    return body(images, images_err, backgrounds, pixelflags)


def prepare_step(images, quality, mesh, tile: int = 16, window: int = 3):
    """One multi-chip prepare step: backgrounds, smoothing, subtraction, sum.

    ``images`` (T, H, W) arrives (or is put) time-sharded; returns
    (images_subtracted, backgrounds_smoothed, sumimage).
    """
    from ..ops.background import estimate_background
    images = jax.device_put(images, cube_sharding(mesh))
    # Per-frame background fits partition trivially along the sharded axis:
    bkg, _mask = estimate_background(images, tile=tile)
    bkg_s = sharded_time_smooth(bkg, mesh, window=window)
    sub = images - bkg_s
    good = jax.device_put(np.asarray(quality) == 0,
                          NamedSharding(mesh, P(TIME_AXIS)))
    s = sharded_sumimage(sub, good, mesh)
    return sub, bkg_s, s


def sharded_psf_fit(images, backgrounds, var_const, p0, valid, mini_ap,
                    target_idx, prf, shape, S: int, mesh,
                    lhood_stat: str = "Gaussian_d"):
    """Target-sharded PSF LM fit across every device of the mesh.

    The PSF fit is embarrassingly parallel over targets
    (models/psf_fit.fit_psf_timeseries_batch is a pure vmap over N), so
    multi-chip scaling shards N over the FLATTENED (time x targets) mesh —
    no collectives; GSPMD partitions the whole program from the input
    shardings alone.  The target axis is padded to the device count with
    dummy stamps (dropped from the returned dict).
    """
    from ..models.psf_fit import fit_psf_timeseries_batch

    n_dev = mesh.size
    N = images.shape[0]
    spec = NamedSharding(mesh, P((TIME_AXIS, TARGET_AXIS)))
    rep = NamedSharding(mesh, P())

    def pad(a):
        a = np.asarray(a)
        padn = (-len(a)) % n_dev
        if padn:
            a = np.concatenate([a, np.repeat(a[-1:], padn, axis=0)])
        return a

    args = [jax.device_put(pad(a), spec) for a in
            (images, backgrounds, p0, valid, mini_ap, target_idx)]
    out = fit_psf_timeseries_batch(args[0], args[1], jax.device_put(
        np.float32(var_const), rep), args[2], args[3], args[4], args[5],
        prf, shape, S, lhood_stat)
    return {k: v[:N] for k, v in out.items()}


def sharded_linpsf_fit(images, rows_t, cols_t, valid, prf, shape, S: int,
                       mesh):
    """Target-sharded linear-PSF solves across every device of the mesh.

    Same scaling shape as :func:`sharded_psf_fit`: the per-target solves
    (models/linpsf.linpsf_timeseries_batch, a pure vmap over N) are
    embarrassingly parallel, so N is sharded over the FLATTENED mesh with
    no collectives; the target axis is padded to the device count.
    """
    from ..models.linpsf import linpsf_timeseries_batch

    n_dev = mesh.size
    N = images.shape[0]
    spec = NamedSharding(mesh, P((TIME_AXIS, TARGET_AXIS)))

    def pad(a):
        a = np.asarray(a)
        padn = (-len(a)) % n_dev
        if padn:
            a = np.concatenate([a, np.repeat(a[-1:], padn, axis=0)])
        return a

    args = [jax.device_put(pad(a), spec)
            for a in (images, rows_t, cols_t, valid)]
    out = linpsf_timeseries_batch(args[0], args[1], args[2], args[3],
                                  prf, shape, S)
    return {k: v[:N] for k, v in out.items()}


def sharded_halo_weights(flux_norm, good_time, mesh, objective: str = "tv"):
    """Target-sharded TV-min weight optimisation (halo photometry).

    ``flux_norm``: (N, T, P) median-normalised pixel fluxes per target;
    ``good_time``: (T,) replicated.  Each target's softmax-weight descent
    (models/halo.tvmin_weights) is independent, so N shards over the
    flattened mesh with no collectives.  Returns (N, P) weights and (N,)
    objective values.
    """
    from ..models.halo import tvmin_weights

    n_dev = mesh.size
    N = flux_norm.shape[0]
    spec = NamedSharding(mesh, P((TIME_AXIS, TARGET_AXIS)))
    rep = NamedSharding(mesh, P())

    fn_np = np.asarray(flux_norm, np.float32)
    padn = (-N) % n_dev
    if padn:
        fn_np = np.concatenate([fn_np, np.repeat(fn_np[-1:], padn, axis=0)])
    fn_dev = jax.device_put(fn_np, spec)
    good_dev = jax.device_put(np.asarray(good_time, bool), rep)

    w, tv = jax.jit(jax.vmap(
        lambda f: tvmin_weights(f, good_dev, objective=objective)))(fn_dev)
    return w[:N], tv[:N]


def extraction_step(images, images_err, backgrounds, pixelflags,
                    masks, r0s, c0s, time, quality, mesh, h: int, w: int):
    """One multi-chip extraction step: full light-curve products + metrics.

    Returns (lightcurves, metrics) where ``lightcurves`` carries the same
    columns the single-chip engine produces (flux, flux_err, flux_bkg,
    pos_centroid, shenanigans_any — BasePhotometry.py:1323-1414 outputs).
    """
    from ..core.metrics import compute_metrics_batch
    flux, ferr, fbkg, cent, shen = sharded_extract_flux(
        images, images_err, backgrounds, pixelflags, masks, r0s, c0s,
        mesh, h, w)
    rep = NamedSharding(mesh, P())
    time = jax.device_put(np.asarray(time), rep)
    quality = jax.device_put(np.asarray(quality), rep)
    metrics = compute_metrics_batch(time, flux, ferr, quality, cent)
    lightcurves = {"flux": flux, "flux_err": ferr, "flux_bkg": fbkg,
                   "pos_centroid": cent, "shenanigans_any": shen}
    return lightcurves, metrics
