"""
Sharded whole-cube programs: multi-chip prepare + extraction steps.

These are the multi-device forms of the hot pipeline stages.  The sector
cube lives time-sharded across the mesh (a full TESS CCD stack at 200 s
cadence exceeds single-chip HBM — SURVEY §7 "hard parts" #7); targets shard
across the orthogonal mesh axis.  XLA inserts the collectives from the
shardings; the only hand-written communication is the ``ppermute`` halo
exchange for the background time-smoothing window.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import TIME_AXIS, TARGET_AXIS, cube_sharding, replicated

__all__ = ["sharded_time_smooth", "sharded_sumimage", "sharded_extract_flux",
           "prepare_step", "extraction_step"]


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


@functools.partial(jax.jit, static_argnames=("h", "w"), donate_argnums=())
def _flux_kernel(images, masks, r0s, c0s, h, w):
    def per_target(mask, r0, c0):
        def per_frame(img):
            st = jax.lax.dynamic_slice(img, (r0, c0), (h, w))
            vals = jnp.where(mask, st, jnp.nan)
            ok = jnp.isfinite(vals)
            return jnp.where(jnp.any(ok), jnp.nansum(jnp.where(ok, vals, 0.0)), jnp.nan)
        return jax.vmap(per_frame)(images)
    return jax.vmap(per_target)(masks, r0s, c0s)


def sharded_extract_flux(images, masks, r0s, c0s, mesh, h: int, w: int):
    """Aperture sums with time-sharded images x target-sharded masks.

    Output (N, T) is sharded over both mesh axes; XLA handles the data
    movement (each (targets-shard, time-shard) pair computes its block).
    """
    images = jax.device_put(images, cube_sharding(mesh))
    masks = jax.device_put(masks, NamedSharding(mesh, P(TARGET_AXIS, None, None)))
    r0s = jax.device_put(r0s, NamedSharding(mesh, P(TARGET_AXIS)))
    c0s = jax.device_put(c0s, NamedSharding(mesh, P(TARGET_AXIS)))
    out_sharding = NamedSharding(mesh, P(TARGET_AXIS, TIME_AXIS))
    fn = jax.jit(functools.partial(_flux_kernel, h=h, w=w),
                 out_shardings=out_sharding)
    return fn(images, masks, r0s, c0s)


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
    good = jax.device_put(quality == 0, NamedSharding(mesh, P(TIME_AXIS)))
    s = sharded_sumimage(sub, good, mesh)
    return sub, bkg_s, s


def extraction_step(images, sumimage, masks, r0s, c0s, time, quality, mesh,
                    h: int, w: int):
    """One multi-chip extraction step: fluxes + metrics for a target batch."""
    from ..core.metrics import compute_metrics_batch
    flux = sharded_extract_flux(images, masks, r0s, c0s, mesh, h, w)
    ferr = jnp.sqrt(jnp.abs(flux))
    cent = jnp.zeros(flux.shape + (2,))
    metrics = compute_metrics_batch(time, flux, ferr, quality, cent)
    return flux, metrics
