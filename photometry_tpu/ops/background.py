"""
Sky-background estimation for TESS Full Frame Images, TPU-native.

Re-design of reference photometry/backgrounds.py:52-206: the same two-component
model — a *radial* component capturing the corner glow (evaluated as a mode
statistic in log-flux within radial rings from the camera centre) iterated
against a *tiled 2-D SExtractor-mode* component — but expressed as dense
array kernels:

- the per-ring statsmodels KDE loop becomes one :func:`segment_kde_mode`
  scatter-histogram pass (all rings at once);
- the radial profile is median-smoothed and mapped back to 2-D through a
  natural cubic spline evaluated on the radius image (one gather + FMA);
- ``photutils.Background2D(64x64)`` becomes a reshape into tiles,
  fixed-iteration sigma-clipped SExtractor mode per tile (one vectorised
  reduction over all tiles), 3x3 NaN-median filtering of the tile grid,
  iterative neighbor fill of excluded tiles, and the exact photutils
  mesh interpolator (cubic B-spline zoom, :mod:`.zoom`).

The entry point :func:`estimate_background` is jit-compiled and vmaps over
the time axis, so a whole cube's backgrounds are one device program —
replacing the reference's multiprocessing Pool over frames
(prepare.py:184-199).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .stats import segment_kde_mode, sextractor_mode
from .spline import make_natural_spline, eval_natural_spline
from .zoom import spline_zoom
from ..utils.mathutils import moving_median_central

__all__ = ["estimate_background", "radial_coordinates", "CAMERA_CENTRE_XY"]

#: Pixel coordinates of the TESS camera centre w.r.t. each (camera, ccd),
#: derived from sector-1 WCS solutions (same public table as reference
#: backgrounds.py:121-138).  Coordinates are zero-based "real" CCD coords
#: (column includes the +44 science-area offset).
CAMERA_CENTRE_XY = {
    (1, 1): [2158.222313, 2099.523364],
    (1, 2): [-5.653058, 2098.018608],
    (1, 3): [2141.511437, 2099.868226],
    (1, 4): [-22.406442, 2100.116443],
    (2, 1): [2148.588316, 2094.033024],
    (2, 2): [-16.806140, 2095.810070],
    (2, 3): [2151.351646, 2105.747100],
    (2, 4): [-13.118570, 2105.982211],
    (3, 1): [2152.175481, 2092.337442],
    (3, 2): [-10.494413, 2093.108135],
    (3, 3): [2145.029218, 2107.883573],
    (3, 4): [-17.374782, 2105.296746],
    (4, 1): [2149.259760, 2091.433315],
    (4, 2): [-12.906931, 2093.350054],
    (4, 3): [2148.906766, 2110.730620],
    (4, 4): [-14.629676, 2111.341670],
}


def radial_coordinates(shape, camera: int, ccd: int, col_offset: int = 44) -> np.ndarray:
    """Distance (pixels) of every pixel from the TESS camera centre.

    ``col_offset`` is the science-area column offset of real TESS FFIs.
    """
    xycen = CAMERA_CENTRE_XY.get((camera, ccd))
    if xycen is None:
        raise ValueError(f"Invalid CAMERA or CCD: CAMERA={camera}, CCD={ccd}")
    yy, xx = np.mgrid[0:shape[0], 0:shape[1]].astype(np.float64)
    xx = xx + col_offset
    return np.hypot(xx - xycen[0], yy - xycen[1]).astype(np.float32)


# ---------------------------------------------------------------------------
# Radial component
# ---------------------------------------------------------------------------

def _radial_component(img, mask, r, ring_idx, n_rings, bin_centers, smooth: int,
                      hist_method: str = "auto", hist_stride: int = 1):
    """Radial corner-glow profile evaluated back onto the 2-D radius image.

    ``hist_stride`` subsamples the MODE HISTOGRAM's input pixels (every
    stride-th row/column); the profile is still evaluated at full
    resolution.  Full CCDs put ~10^4-10^5 pixels in every 15-px ring, so a
    2x2 subsample changes each ring's mode estimate well below its own
    sampling noise while cutting the dominant one-hot histogram cost 4x
    (callers gate it on frame size; small frames always use every pixel).
    """
    good = ~mask
    pix = jnp.where(good, img, jnp.nan)
    zeropoint = -jnp.nanmin(pix) + 1.0
    logpix = jnp.log10(img + zeropoint)

    s = hist_stride
    modes = segment_kde_mode(logpix[::s, ::s].ravel(),
                             ring_idx[::s, ::s].ravel(), n_rings,
                             mask=mask[::s, ::s].ravel(), min_count=8,
                             method=hist_method)
    if smooth:
        modes = moving_median_central(modes, smooth)

    # Natural cubic spline through the valid ring modes.  Invalid rings are
    # bridged by reusing the previous valid value (jit-safe gap fill).
    valid = jnp.isfinite(modes)
    # forward/backward fill:
    def ffill(carry, x):
        v, m = x
        new = jnp.where(m, v, carry)
        return new, new
    _, fwd = jax.lax.scan(ffill, jnp.float32(jnp.nan), (modes, valid))
    _, bwd = jax.lax.scan(ffill, jnp.float32(jnp.nan), (modes[::-1], valid[::-1]))
    filled = jnp.where(valid, modes, jnp.where(jnp.isfinite(fwd), fwd, bwd[::-1]))
    any_valid = jnp.any(valid)
    filled = jnp.where(jnp.isfinite(filled), filled, 0.0)

    spline = make_natural_spline(bin_centers, filled)
    prof = eval_natural_spline(spline, r, clamp=True)
    bkg_radial = 10.0 ** prof - zeropoint
    n_valid = jnp.sum(valid)
    return jnp.where((n_valid >= 3) & any_valid, bkg_radial, 0.0)


# ---------------------------------------------------------------------------
# Tiled SExtractor-mode component
# ---------------------------------------------------------------------------

def _nan_median3(grid):
    """3x3 NaN-median filter of the (small) tile grid.

    Symmetric edge padding (scipy 'reflect'), matching the filter photutils
    applies to the low-resolution background mesh — constant-NaN padding
    would bias corner tiles toward the interior by a full tile step.
    """
    H, W = grid.shape
    p = jnp.pad(grid, 1, mode="symmetric")
    shifts = [jax.lax.dynamic_slice(p, (dy, dx), (H, W))
              for dy in range(3) for dx in range(3)]
    return jnp.nanmedian(jnp.stack(shifts, 0), axis=0)


def _fill_nan_tiles(grid, iters: int = 16):
    """Iteratively replace NaN tiles by the mean of finite neighbors."""
    H, W = grid.shape

    def body(_, g):
        p = jnp.pad(g, 1, mode="constant", constant_values=jnp.nan)
        shifts = jnp.stack([jax.lax.dynamic_slice(p, (dy, dx), (H, W))
                            for dy in range(3) for dx in range(3)], 0)
        cnt = jnp.sum(jnp.isfinite(shifts), axis=0)
        mean = jnp.nansum(jnp.where(jnp.isfinite(shifts), shifts, 0.0), axis=0) / jnp.maximum(cnt, 1)
        return jnp.where(jnp.isnan(g) & (cnt > 0), mean, g)

    grid = jax.lax.fori_loop(0, iters, body, grid)
    return jnp.where(jnp.isnan(grid), jnp.nanmedian(grid), grid)


def _tiled_mode(img, mask, tile: int, exclude_fraction: float):
    """Per-tile sigma-clipped SExtractor mode, filtered and upsampled.

    Frames not divisible by ``tile`` are PADDED to whole tiles (padding
    pixels masked out), like photutils' Background2D box padding —
    truncating the remainder and stretching the mesh over the full frame
    (the earlier formulation) shifted every cell by up to half a tile near
    the far edges.
    """
    H, W = img.shape
    th, tw = -(-H // tile), -(-W // tile)
    Hp, Wp = th * tile, tw * tile
    if (Hp, Wp) != (H, W):
        img = jnp.pad(img, ((0, Hp - H), (0, Wp - W)),
                      constant_values=jnp.nan)
        mask = jnp.pad(mask, ((0, Hp - H), (0, Wp - W)),
                       constant_values=True)
    tiles = img.reshape(th, tile, tw, tile)
    tiles = tiles.transpose(0, 2, 1, 3).reshape(th, tw, tile * tile)
    mtiles = mask.reshape(th, tile, tw, tile)
    mtiles = mtiles.transpose(0, 2, 1, 3).reshape(th, tw, tile * tile)

    grid = sextractor_mode(tiles, mask=mtiles, min_fraction=1.0 - exclude_fraction)
    grid = _nan_median3(grid)
    grid = _fill_nan_tiles(grid)

    # Cubic B-spline zoom of the tile mesh back to pixel resolution — the
    # exact photutils BkgZoomInterpolator / scipy.ndimage.zoom(order=3,
    # mode='reflect', grid_mode=True) semantics (parity-tested vs scipy):
    return spline_zoom(grid, (Hp, Wp))[:H, :W]


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "n_rings", "bkgiters", "tile", "radial_smooth", "use_radial",
    "hist_method", "hist_stride"))
def _estimate_background_jit(images, mask, r, ring_idx, bin_centers,
                             n_rings, bkgiters, tile, radial_smooth, use_radial,
                             hist_method="auto", hist_stride=1):
    def one_frame(img, msk):
        bkg_radial = jnp.zeros_like(img)
        bkg_square = jnp.zeros_like(img)
        for _ in range(bkgiters if use_radial else 1):
            if use_radial:
                bkg_radial = _radial_component(img - bkg_square, msk, r,
                                               ring_idx, n_rings, bin_centers,
                                               radial_smooth,
                                               hist_method=hist_method,
                                               hist_stride=hist_stride)
            bkg_square = _tiled_mode(img - bkg_radial, msk, tile,
                                     exclude_fraction=0.5)
        total = bkg_radial + bkg_square
        return jnp.where(jnp.all(msk), jnp.nan, total)

    return jax.vmap(one_frame)(images, mask)


def estimate_background(images, mask=None, camera: Optional[int] = None,
                        ccd: Optional[int] = None, flux_cutoff: float = 8e4,
                        bkgiters: int = 3, radial_cutoff: float = 2400,
                        radial_pixel_step: int = 15, radial_smooth: int = 3,
                        tile: int = 64, col_offset: int = 44,
                        radius_image: Optional[np.ndarray] = None):
    """Estimate the sky background of a stack of FFIs.

    Parameters:
        images: (T, H, W) or (H, W) array of calibrated flux (e-/s).
        mask: optional boolean (same shape / broadcastable), True = exclude.
        camera, ccd: TESS camera/CCD for the radial component; when None
            (or when ``radius_image`` is None and camera is None) the radial
            component is skipped and only the tiled component runs —
            matching the reference's behavior for non-TESS images
            (backgrounds.py:154-157).
        radius_image: optional precomputed (H, W) radius map, overrides
            camera/ccd lookup (used by the simulator and small test frames).
        flux_cutoff: pixels brighter than this are excluded
        tile: tile size of the 2-D component (64 for real FFIs).

    Returns:
        (bkg, mask_used): background of same shape as input, and the
        boolean exclusion mask that was applied.
    """
    images = jnp.asarray(images, jnp.float32)
    squeeze = images.ndim == 2
    if squeeze:
        images = images[None]
    T, H, W = images.shape

    base_mask = ~jnp.isfinite(images) | (images > flux_cutoff) | (images < 0)
    if mask is not None:
        base_mask = base_mask | jnp.asarray(mask, bool)

    use_radial = radius_image is not None or camera is not None
    if use_radial:
        if radius_image is None:
            radius_image = radial_coordinates((H, W), camera, ccd, col_offset)
        r_host = np.asarray(radius_image, np.float32)
        rmax = float(np.max(r_host))
        bins = np.arange(radial_cutoff, rmax + radial_pixel_step, radial_pixel_step)
        if len(bins) < 4:
            # Sub-CCD frame: the camera-centre radius range inside the frame
            # spans fewer than a few ring steps, so the production ring model
            # cannot resolve the glow.  Fall back to rings about the frame
            # corner FARTHEST from the camera centre — where the physical
            # corner glow sits (the reference models glow as radial beyond
            # 2400 px from the camera centre, backgrounds.py:121-206, i.e.
            # concentrated toward the max-radius corners) — with the ring
            # step scaled to the frame diagonal.  Without this, a steep glow
            # corner on a 96-160 px frame is left to the tile mesh, whose
            # edge extrapolation undershoots by tens of e-/s.
            corner_r = {(0, 0): r_host[0, 0], (0, W - 1): r_host[0, -1],
                        (H - 1, 0): r_host[-1, 0], (H - 1, W - 1): r_host[-1, -1]}
            gy, gx = max(corner_r, key=corner_r.get)
            yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
            r_host = np.hypot(yy - gy, xx - gx).astype(np.float32)
            radial_pixel_step = max(2, int(round(float(np.hypot(H, W)) / 48)))
            radial_cutoff = 0.0
            rmax = float(np.max(r_host))
            bins = np.arange(0.0, rmax + radial_pixel_step, radial_pixel_step)
        if len(bins) < 4:
            use_radial = False
        else:
            r = jnp.asarray(r_host, jnp.float32)
    if use_radial:
        n_rings = len(bins) - 1
        bin_centers = jnp.asarray(bins[1:] - radial_pixel_step / 2, jnp.float32)
        ring_idx = jnp.clip(((r - radial_cutoff) / radial_pixel_step).astype(jnp.int32),
                            -1, n_rings - 1)
        ring_idx = jnp.where(r < radial_cutoff, -1, ring_idx)
    else:
        r = jnp.zeros((H, W), jnp.float32)
        n_rings = 4
        bin_centers = jnp.arange(4, dtype=jnp.float32)
        ring_idx = jnp.full((H, W), -1, jnp.int32)

    tile = min(tile, H, W)
    # Resolve the segment-histogram method HERE, where ``images`` is a
    # concrete device array: under jit tracing segment_kde_mode's 'auto'
    # falls back to jax.default_backend(), which can disagree with the
    # device the program actually runs on (e.g. a CPU-mesh dry run in a
    # process whose default backend is the TPU plugin — the bf16 matmul
    # histogram is UNIMPLEMENTED on XLA:CPU).
    try:
        platform = next(iter(images.devices())).platform
    except Exception:
        platform = jax.default_backend()
    hist_method = "scatter" if platform == "cpu" else "matmul"
    # Full CCDs subsample the ring-mode histogram 2x2 (see
    # _radial_component); sub-CCD frames keep every pixel:
    hist_stride = 2 if (H * W >= 2_000_000 and platform != "cpu") else 1
    bkg = _estimate_background_jit(images, base_mask, r, ring_idx, bin_centers,
                                   n_rings, bkgiters, tile, radial_smooth,
                                   use_radial, hist_method=hist_method,
                                   hist_stride=hist_stride)
    if squeeze:
        return bkg[0], base_mask[0]
    return bkg, base_mask
