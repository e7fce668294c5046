"""
K2P2 pixel-mask construction, batched for TPU.

Re-design of reference photometry/AperturePhotometry/k2p2v2.py (K2P2 method of
Lund et al. 2015; TESS adaptation of Handberg et al. 2021) as a pure function
of static shapes, vmappable over thousands of target stamps:

- flux-threshold from a Gaussian-KDE mode + MAD of the sum-image histogram
  (k2p2v2.py:401-427) — here the KDE is evaluated *exactly* on a 100-point
  grid (Scott bandwidth) with Newton refinement of the mode, as one dense
  (n_pixels x n_grid) matmul-style reduction;
- DBSCAN(eps=sqrt(2), min=4) clustering (k2p2v2.py:63-86) -> 8-connected
  components with a size cut (exact for this eps on a pixel grid up to the
  core-point boundary rule);
- watershed segmentation with catalog-seeded markers on the blurred flux
  image (k2p2v2.py:89-288) -> ops.labeling.watershed_segment;
- hole filling by the 4-neighbor rule (k2p2v2.py:546-557);
- saturated-column detection and overflow-lane extension gated on combined
  mask magnitude vs the saturation limit (k2p2v2.py:291-341,576-662);
- minimum 2x2 aperture fallback (AperturePhotometry/photometry.py:31-41).

Output is a per-target mask + diagnostics; the caller (aperture model)
handles stamp resizing and status logic.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.filters import gaussian_blur2d
from ..ops.labeling import dbscan_labels, label_components, watershed_segment

__all__ = ["K2P2Params", "build_mask", "build_masks_batch"]

SATURATION_LIMIT = 7.0  #: Tmag above which (fainter) overflow extension is disabled.


class K2P2Params(NamedTuple):
    thresh: float = 0.8               #: CUT = MODE + thresh * MAD
    min_no_pixels_in_mask: int = 4
    min_for_cluster: int = 4
    ws_blur: float = 0.5
    ws_thres: float = 0.0             #: relative threshold for local maxima
    ws_footprint: int = 3
    segmentation: bool = True
    extend_overflow: bool = True


# ---------------------------------------------------------------------------
# Mode + threshold
# ---------------------------------------------------------------------------

def _kde_mode_scott(flux, valid, n_grid: int = 100, newton_iters: int = 3):
    """Gaussian-KDE mode with Scott bandwidth, exact dense evaluation.

    flux: (P,) pixel values; valid: (P,) bool.  Returns (mode, bandwidth).
    """
    n = jnp.maximum(jnp.sum(valid), 1)
    fv = jnp.where(valid, flux, jnp.nan)
    # Sanitize: NaNs outside `valid` would otherwise poison 0*NaN products
    # in the weighted sums below.
    flux = jnp.where(valid, flux, 0.0)
    mean = jnp.nansum(jnp.where(valid, flux, 0.0)) / n
    std = jnp.sqrt(jnp.nansum(jnp.where(valid, (flux - mean) ** 2, 0.0)) / jnp.maximum(n - 1, 1))
    q75 = jnp.nanquantile(fv, 0.75)
    q25 = jnp.nanquantile(fv, 0.25)
    iqr = (q75 - q25) / 1.349
    sigma = jnp.where((iqr > 0) & (iqr < std), iqr, std)
    bw = 1.059 * sigma * n.astype(flux.dtype) ** (-0.2)
    bw = jnp.maximum(bw, 1e-10)

    lo = jnp.nanmin(fv) - 3 * bw
    hi = jnp.nanmax(fv) + 3 * bw
    grid = lo + (hi - lo) * jnp.arange(n_grid, dtype=flux.dtype) / (n_grid - 1)

    # Dense KDE evaluation: (P, G) exponentials, one reduction:
    z = (grid[None, :] - flux[:, None]) / bw
    dens = jnp.sum(jnp.where(valid[:, None], jnp.exp(-0.5 * z * z), 0.0), axis=0)
    x0 = grid[jnp.argmax(dens)]

    # Second-stage fine grid around the coarse argmax.  When the value range
    # is wide, the coarse spacing can exceed the bandwidth, so the coarse
    # argmax may sit a full grid step from the true peak — and the guarded
    # Newton below can freeze there when the KDE is not locally concave
    # (neighboring mass makes d2 >= 0).  Resolving one coarse step at
    # sub-bandwidth spacing first makes the refinement robust (reference
    # uses a Powell minimizer from the statsmodels grid argmax,
    # k2p2v2.py:417-421).
    step_c = (hi - lo) / (n_grid - 1)
    n_fine = 64
    fgrid = (x0 - step_c) + 2 * step_c * jnp.arange(n_fine, dtype=flux.dtype) / (n_fine - 1)
    zf = (fgrid[None, :] - flux[:, None]) / bw
    densf = jnp.sum(jnp.where(valid[:, None], jnp.exp(-0.5 * zf * zf), 0.0), axis=0)
    x0 = fgrid[jnp.argmax(densf)]

    # Newton refinement on the smooth KDE (analytic first/second derivatives):
    def newton(x, _):
        u = (x - flux) / bw
        w = jnp.where(valid, jnp.exp(-0.5 * u * u), 0.0)
        d1 = jnp.sum(w * (-u)) / bw
        d2 = jnp.sum(w * (u * u - 1.0)) / (bw * bw)
        step = jnp.where(d2 < 0, d1 / d2, 0.0)
        step = jnp.clip(step, -bw, bw)
        return x - step, None

    x0, _ = jax.lax.scan(newton, x0, None, length=newton_iters)
    return x0, bw


def _threshold(sumimage, params: K2P2Params):
    """MODE + thresh*MAD cut of the sum-image flux histogram."""
    flat = sumimage.ravel()
    finite = jnp.isfinite(flat) & (flat > 0)
    # Trim top 15% and absolute cut at 70000 (k2p2v2.py:402-409):
    q85 = jnp.nanquantile(jnp.where(finite, flat, jnp.nan), 0.85)
    valid = finite & (flat <= q85) & (flat < 70000)
    mode, bw = _kde_mode_scott(flat, valid)
    below = finite & (flat < mode)
    mad1 = 1.482602218505602 * jnp.nanmedian(
        jnp.where(below, jnp.abs(flat - mode), jnp.nan))
    cut = mode + params.thresh * mad1
    any_flux = jnp.any(finite)
    return cut, bw, any_flux


# ---------------------------------------------------------------------------
# Catalog-seeded watershed markers
# ---------------------------------------------------------------------------

def _local_maxima(img, footprint: int, threshold_rel: float):
    """Boolean local-maximum map with (footprint x footprint) neighborhood."""
    H, W = img.shape
    half = footprint // 2
    p = jnp.pad(img, half, mode="constant", constant_values=-jnp.inf)
    best = jnp.full((H, W), -jnp.inf, img.dtype)
    for dy in range(footprint):
        for dx in range(footprint):
            if dy == half and dx == half:
                continue
            best = jnp.maximum(best, jax.lax.dynamic_slice(p, (dy, dx), (H, W)))
    # Relative tolerance: the reference computes the blurred surface in
    # float64; in float32 a marginal saddle between two close stars can
    # round its twin peaks into one, silently merging their watershed
    # markers.  Accepting near-ties (1e-5 relative ~ 100x f32 accumulation
    # error) keeps both peaks; genuine slopes differ by far more.
    is_max = img >= best - 1e-5 * jnp.abs(best)
    if threshold_rel > 0:
        is_max = is_max & (img > threshold_rel * jnp.max(img))
    return is_max


def _catalog_marker_pix(blurred, above_cut, cat_col, cat_row, cat_tmag,
                        cat_valid, params: K2P2Params):
    """Flat pixel index of each star's marker (-1 = no marker), (K,).

    Matches reference k2p2v2.py:137-155: a star claims the nearest local
    maximum within dist_factor*sqrt(2) (5 for stars at or brighter than the
    saturation limit, 2 for fainter ones).
    """
    H, W = blurred.shape
    maxima = _local_maxima(blurred, params.ws_footprint, params.ws_thres) & above_cut
    yy, xx = jnp.mgrid[0:H, 0:W]
    yy = yy.astype(jnp.float32)
    xx = xx.astype(jnp.float32)

    def one_star(col, row, tmag, valid):
        d2 = (xx - col) ** 2 + (yy - row) ** 2
        d2 = jnp.where(maxima, d2, jnp.inf)
        flat_idx = jnp.argmin(d2)
        dmin = jnp.sqrt(d2.ravel()[flat_idx])
        dist_factor = jnp.where(tmag > SATURATION_LIMIT, 2.0, 5.0)
        ok = valid & (dmin < dist_factor * jnp.sqrt(2.0))
        return jnp.where(ok, flat_idx, -1)

    return jax.vmap(one_star)(cat_col, cat_row, cat_tmag, cat_valid)  # (K,)


def _rasterize_markers(marker_pix, H: int, W: int):
    """(K,) flat marker pixels -> (H, W) int32 marker image, ids 1..K."""
    K = marker_pix.shape[0]
    markers_flat = jnp.zeros(H * W + 1, jnp.int32)
    # later stars overwrite earlier at the same pixel — deterministic:
    idx = jnp.where(marker_pix >= 0, marker_pix, H * W)
    markers_flat = markers_flat.at[idx].set(jnp.arange(1, K + 1, dtype=jnp.int32))
    return markers_flat[:-1].reshape(H, W)


def _catalog_markers(blurred, above_cut, cat_col, cat_row, cat_tmag, cat_valid,
                     params: K2P2Params):
    """Rasterized per-star markers (see :func:`_catalog_marker_pix`)."""
    H, W = blurred.shape
    pix = _catalog_marker_pix(blurred, above_cut, cat_col, cat_row, cat_tmag,
                              cat_valid, params)
    return _rasterize_markers(pix, H, W)


def _saturated_pixel_map(sumimage, above):
    """Columns whose above-cut pixels form a bleed trail, as a pixel map
    restricted to the above-cut region.

    Reference k2p2_saturated (k2p2v2.py:747-800) requires BOTH
    |median row-to-row difference| < 1% of the peak AND
    median(column) >= mask_max/2: a flat-topped bleed column satisfies both,
    while an ordinary stellar profile — whose row-to-row differences are
    antisymmetric about the peak, so their MEDIAN is also ~0 — fails the
    median-level test.  Omitting the second condition falsely flagged every
    symmetric star column as saturated and collapsed its watershed markers
    (round-3 corpus finding).  The reference compares against the max over
    the whole mask; pre-watershed the mask is unknown, so we use the
    column's own above-cut max — a slightly weaker gate (colmax <= mask
    max), but true bleed columns carry the mask peak anyway.
    """
    vals = jnp.where(above, sumimage, jnp.nan)
    diffs = vals[1:, :] - vals[:-1, :]
    colmax = jnp.nanmax(vals, axis=0)
    colmed = jnp.nanmedian(vals, axis=0)
    ratio = jnp.abs(jnp.nanmedian(diffs, axis=0)) / colmax
    n_col = jnp.sum(above, axis=0)
    sat_col = (n_col >= 3) & (ratio < 0.01) & (colmed >= colmax / 2)
    return above & sat_col[None, :]


def _clean_marker_pix(marker_pix, blurred, patch):
    """Within each connected patch of saturated pixels keep only the marker
    at the highest blurred flux (ties broken by flat index) — reference
    k2p2v2.py:193-218.

    Operates on the (K,) flat marker-pixel list with K x K pairwise
    comparisons instead of full-image ``segment_max``/``segment_min``: the
    image-wide segment formulation lowers to scatters, which cost ~19 ms
    per 2048-stamp batch on TPU vs ~0 for the K<=8 dense form.

    ``patch``: (H, W) int connected-component labels of the saturated map
    (0 = not saturated).
    """
    HW = patch.size
    pf = patch.ravel()
    bf = blurred.ravel()
    valid = marker_pix >= 0
    pidx = jnp.clip(marker_pix, 0)
    pk = jnp.where(valid, pf[pidx], 0)          # marker's patch id
    sk = jnp.where(valid, bf[pidx], -jnp.inf)   # marker's score
    same = (pk[:, None] == pk[None, :]) & (pk[:, None] > 0) & valid[None, :]
    best = jnp.max(jnp.where(same, sk[None, :], -jnp.inf), axis=1)
    # first (lowest flat index) among the same-patch markers at the best
    # score — the deterministic tie-break the image formulation had:
    at_best = same & (sk[None, :] >= best[:, None])
    first = jnp.min(jnp.where(at_best, pidx[None, :], HW), axis=1)
    keep = valid & ((pk == 0) | ((sk >= best) & (pidx == first)))
    return jnp.where(keep, marker_pix, -1)


# ---------------------------------------------------------------------------
# Saturated columns / overflow lanes
# ---------------------------------------------------------------------------

def _saturated_column_extension(sumimage, mask_main, above_cut, mags_total,
                                params: K2P2Params):
    """Extend the mask along saturated (bleed) columns.

    Reference k2p2v2.py:291-341: a column of the mask is saturated when the
    median |row-to-row difference| of its in-mask pixels is < 1% of its peak
    and its median is at least half the mask's maximum.  Saturated columns
    adopt all above-cut pixels of the column that are row-contiguous with
    the column's peak pixel.  Only applied when the combined magnitude of
    the stars in the mask is brighter than the saturation limit
    (k2p2v2.py:592-615).
    """
    H, W = sumimage.shape
    simg = jnp.where(jnp.isfinite(sumimage), sumimage, -jnp.inf)
    in_mask = jnp.where(mask_main, sumimage, jnp.nan)
    mask_max = jnp.nanmax(in_mask)

    # Per-column stats over in-mask pixels:
    col_vals = in_mask  # (H, W) NaN outside mask
    diffs = col_vals[1:, :] - col_vals[:-1, :]
    ratio = jnp.abs(jnp.nanmedian(diffs, axis=0)) / jnp.nanmax(col_vals, axis=0)
    col_med = jnp.nanmedian(col_vals, axis=0)
    col_has = jnp.any(mask_main, axis=0)
    saturated_col = col_has & (ratio < 0.01) & (col_med >= mask_max / 2)

    # Row-contiguous run of above-cut pixels containing the column's peak:
    peak_row = jnp.argmax(jnp.where(mask_main, simg, -jnp.inf), axis=0)  # (W,)
    ac = above_cut  # (H, W)
    rows = jnp.arange(H)[:, None]
    # break points: not above_cut
    # Upward reach: the nearest gap above the peak; downward likewise.
    gap = ~ac
    below_peak = rows <= peak_row[None, :]
    above_peak = rows >= peak_row[None, :]
    # last gap at/below peak:
    gap_below = jnp.where(gap & below_peak, rows, -1)
    lo = jnp.max(gap_below, axis=0) + 1                       # (W,)
    gap_above = jnp.where(gap & above_peak, rows, H)
    hi = jnp.min(gap_above, axis=0) - 1                        # (W,)
    run = (rows >= lo[None, :]) & (rows <= hi[None, :]) & ac
    add = run & saturated_col[None, :]

    allow = mags_total <= SATURATION_LIMIT
    return jnp.where(allow & params.extend_overflow, mask_main | add, mask_main)


def _fill_holes_4(mask):
    """Fill pixels whose 4 cross-neighbors are all in the mask (k2p2v2:546-557)."""
    m = mask.astype(jnp.float32)
    p = jnp.pad(m, 1)
    H, W = mask.shape
    s = (jax.lax.dynamic_slice(p, (0, 1), (H, W)) + jax.lax.dynamic_slice(p, (2, 1), (H, W))
         + jax.lax.dynamic_slice(p, (1, 0), (H, W)) + jax.lax.dynamic_slice(p, (1, 2), (H, W)))
    return mask | ((s > 3.8) & ~mask)


# ---------------------------------------------------------------------------
# Main entry
# ---------------------------------------------------------------------------

def build_mask(sumimage, cat_col, cat_row, cat_tmag, cat_starid, cat_valid,
               target_row, target_col, target_tmag, collected=None,
               params: K2P2Params = K2P2Params(), debug: bool = False):
    """Build the photometric mask for one target stamp.  Pure; vmappable.

    Parameters:
        sumimage: (h, w) stamp of the sum image (NaN = not collected).
        cat_*: (K,) padded catalog of stars near the stamp, in *stamp*
            coordinates (col/row 0-based); ``cat_valid`` masks padding.
        target_row, target_col: main-target position in stamp coords.
        collected: optional (h, w) bool of collected pixels (TPF aperture);
            default = finite sumimage.

    Returns dict with:
        mask: (h, w) bool photometric mask (minimum aperture if none found).
        found_mask: bool — False when the minimum-aperture fallback was used.
        no_flux: bool — no positive flux in the stamp at all.
        edge: (4,) bool — mask touches [bottom, top, left, right] edge.
        cut: float threshold used.
        in_mask: (K,) bool — catalog stars whose rounded position is in the mask.
        mask_size: int.
    """
    H, W = sumimage.shape
    if collected is None:
        collected = jnp.isfinite(sumimage)

    cut, bw, any_flux = _threshold(sumimage, params)
    above = jnp.where(jnp.isfinite(sumimage), sumimage > cut, False)

    # DBSCAN(eps=sqrt(2), min_samples) clustering with the exact core/border
    # rule (k2p2v2.py:63-86); noise pixels are dropped:
    labels = dbscan_labels(above, min_samples=params.min_for_cluster)
    above2 = above & (labels > 0)

    if params.segmentation:
        flux_above = jnp.where(above2, jnp.nan_to_num(sumimage), 0.0)
        blurred = gaussian_blur2d(flux_above, params.ws_blur)
        marker_pix = _catalog_marker_pix(blurred, above2, cat_col, cat_row,
                                         cat_tmag, cat_valid, params)
        # Saturated-maxima cleaning: a connected patch of saturated (bleed)
        # pixels keeps only its single best marker (k2p2v2.py:193-218):
        sat_map = _saturated_pixel_map(sumimage, above2)
        patch = label_components(sat_map)
        marker_pix = _clean_marker_pix(marker_pix, blurred, patch)
        markers = _rasterize_markers(marker_pix, H, W)
        # connectivity=1 (4-neighborhood): the reference floods with
        # skimage's default connectivity (k2p2v2.py:227 watershed call), so
        # pixels attached to a basin only diagonally stay OUT of the mask
        # even though DBSCAN (eps=sqrt(2)) links them into the cluster.
        seg = watershed_segment(blurred, markers, above2, connectivity=1)
    else:
        blurred = jnp.where(above2, jnp.nan_to_num(sumimage), 0.0)
        seg = jnp.where(above2, labels, 0)

    # Main-basin pick, hole fill, overflow extension, fallback and flags —
    # shared with the batch pipeline so the two paths cannot diverge:
    out = _mask_tail(sumimage, seg, above, any_flux, cut, bw, cat_col,
                     cat_row, cat_tmag, cat_valid, target_row, target_col,
                     collected, params)
    if debug:
        # Intermediate images for the K2P2 5-panel diagnostic figure
        # (k2p2v2.py:664-744): thresholded pixels, DBSCAN labels, watershed
        # segmentation and the blurred flux driving it.
        out.update(above=above, labels=labels, seg=seg, blurred=blurred)
    return out


def _mask_tail(sumimage, seg, above, any_flux, cut, bw, cat_col, cat_row,
               cat_tmag, cat_valid, target_row, target_col, collected,
               params: K2P2Params):
    """Per-stamp tail of :func:`build_mask` after segmentation: main-basin
    pick, hole fill, overflow extension, fallback, edge/in-mask flags."""
    H, W = sumimage.shape
    tr = jnp.clip(jnp.round(target_row).astype(jnp.int32), 0, H - 1)
    tc = jnp.clip(jnp.round(target_col).astype(jnp.int32), 0, W - 1)
    main_label = seg[tr, tc]
    mask_main = (seg == main_label) & (main_label > 0)
    mask_size0 = jnp.sum(mask_main)
    found = (main_label > 0) & (mask_size0 >= params.min_no_pixels_in_mask) & any_flux

    mask_main = _fill_holes_4(mask_main)

    yy, xx = jnp.mgrid[0:H, 0:W]
    cat_r = jnp.clip(jnp.round(cat_row).astype(jnp.int32), 0, H - 1)
    cat_c = jnp.clip(jnp.round(cat_col).astype(jnp.int32), 0, W - 1)
    star_inside = cat_valid & (jnp.round(cat_row) >= 0) & (jnp.round(cat_row) <= H - 1) \
        & (jnp.round(cat_col) >= 0) & (jnp.round(cat_col) <= W - 1)
    star_in_mask = star_inside & mask_main[cat_r, cat_c]
    flux_sum = jnp.sum(jnp.where(star_in_mask, 10 ** (-0.4 * cat_tmag), 0.0))
    mags_total = jnp.where(flux_sum > 0, -2.5 * jnp.log10(flux_sum), jnp.inf)
    if params.extend_overflow:
        mask_ext = _saturated_column_extension(sumimage, mask_main, above, mags_total, params)
        mask_main = jnp.where(found, mask_ext, mask_main)

    min_ap = ((jnp.abs(xx.astype(jnp.float32) - target_col) <= 1)
              & (jnp.abs(yy.astype(jnp.float32) - target_row) <= 1)
              & collected)
    mask = jnp.where(found, mask_main, min_ap)

    edge = jnp.stack([jnp.any(mask[0, :]), jnp.any(mask[-1, :]),
                      jnp.any(mask[:, 0]), jnp.any(mask[:, -1])])
    in_mask = star_inside & mask[cat_r, cat_c]
    return {
        "mask": mask,
        "found_mask": found,
        "no_flux": ~any_flux,
        "edge": edge,
        "cut": cut,
        "bandwidth": bw,
        "in_mask": in_mask,
        "mask_size": jnp.sum(mask),
    }


@functools.partial(jax.jit, static_argnames=("params",))
def build_masks_batch(sumimages, cat_col, cat_row, cat_tmag, cat_starid,
                      cat_valid, target_row, target_col, target_tmag,
                      collected=None, params: K2P2Params = K2P2Params()):
    """Batched :func:`build_mask` over N target stamps, bit-identical to the
    per-stamp function (asserted in tests/test_k2p2.py) but restructured for
    TPU lane utilization:

    - element-wise / small-reduction stages (threshold, blur, markers,
      saturated map) run as a leading-batch ``vmap``;
    - the fixed-point label-propagation stages (DBSCAN components,
      watershed flooding) run **batch-last** — (h, w, N) puts the batch on
      the 128-lane axis, where a leading-batch vmap of the while-loops
      leaves a 17-px stamp width at ~13% lane utilization per iteration
      (ops/labeling.py; measured ~5x at N=2048).

    sumimages: (N, h, w); cat_*: (N, K); target_*: (N,).
    """
    if collected is None:
        collected = jnp.isfinite(sumimages)

    # A. threshold (vmapped):
    cut, bw, any_flux = jax.vmap(lambda s: _threshold(s, params))(sumimages)
    above = jnp.where(jnp.isfinite(sumimages),
                      sumimages > cut[:, None, None], False)

    # B. DBSCAN clustering, batch-last:
    labels = jnp.transpose(
        dbscan_labels(jnp.transpose(above, (1, 2, 0)),
                      min_samples=params.min_for_cluster), (2, 0, 1))
    above2 = above & (labels > 0)

    # C. blur + markers (vmapped; K x K pairwise saturated-marker cleaning —
    # the image-wide segment_max/min formulation lowered to ~19 ms of
    # scatters per 2048-stamp batch), D. watershed (batch-last):
    if params.segmentation:
        H, W = sumimages.shape[1:]

        def prep(s, a2, cc, cr, ct, cv):
            flux_above = jnp.where(a2, jnp.nan_to_num(s), 0.0)
            blurred = gaussian_blur2d(flux_above, params.ws_blur)
            pix = _catalog_marker_pix(blurred, a2, cc, cr, ct, cv, params)
            sat_map = _saturated_pixel_map(s, a2)
            return blurred, pix, sat_map

        blurred, marker_pix, sat_maps = jax.vmap(prep)(
            sumimages, above2, cat_col, cat_row, cat_tmag, cat_valid)
        patch = jnp.transpose(
            label_components(jnp.transpose(sat_maps, (1, 2, 0))), (2, 0, 1))
        marker_pix = jax.vmap(_clean_marker_pix)(marker_pix, blurred, patch)
        markers = jax.vmap(lambda p: _rasterize_markers(p, H, W))(marker_pix)
        seg = jnp.transpose(
            watershed_segment(jnp.transpose(blurred, (1, 2, 0)),
                              jnp.transpose(markers, (1, 2, 0)),
                              jnp.transpose(above2, (1, 2, 0)),
                              connectivity=1), (2, 0, 1))
    else:
        seg = jnp.where(above2, labels, 0)

    # E. tail (vmapped):
    return jax.vmap(lambda s, sg, a, af, ct_, bw_, cc, cr, cm, cv, tr, tc,
                    col: _mask_tail(s, sg, a, af, ct_, bw_, cc, cr, cm, cv,
                                    tr, tc, col, params))(
        sumimages, seg, above, any_flux, cut, bw, cat_col, cat_row,
        cat_tmag, cat_valid, target_row, target_col, collected)
