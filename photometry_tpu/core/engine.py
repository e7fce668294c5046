"""
The batched photometry engine.

This replaces the reference's per-target BasePhotometry object
(photometry/BasePhotometry.py) with an array-resident design:

- :class:`SectorContext` owns one sector-CCD's image cube as device arrays
  (replacing the N-reads-per-stamp HDF5 access of BasePhotometry.py:720-751),
  plus the catalog, WCS and motion model.
- :class:`TpfContext` provides the same interface for a Target Pixel File.
- :func:`extract_aperture_batch` runs K2P2 aperture photometry for a *batch*
  of targets: stamps are gathered from the cube with vmapped dynamic slices,
  masks are built by the batched K2P2 kernel, fluxes/centroids for all
  targets x cadences come out of one jitted program.  The reference's
  stamp-resize retry loop (AperturePhotometry/photometry.py:71-165) becomes
  a host-side loop over the shrinking subset of unconverged targets.
- Single-target semantics (status codes, halo-switch quick break, minimum
  aperture warning, contamination, skip_targets) follow
  AperturePhotometry/photometry.py and tessphot.py.
"""

from __future__ import annotations

import functools
import logging
import os
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..catalog import StarCatalog
from ..io import discovery
from ..io.cube import ImageCube
from ..io.settings import load_settings
from ..models.k2p2 import K2P2Params, build_masks_batch

#: Production K2P2 parameters (reference photometry/AperturePhotometry
#: defaults); shared by the batch extractor and the diagnostic replotter.
DEFAULT_K2P2_PARAMS = K2P2Params(thresh=0.8, min_no_pixels_in_mask=4,
                                 min_for_cluster=4, ws_blur=0.5, ws_thres=0.0,
                                 ws_footprint=3, segmentation=True,
                                 extend_overflow=True)
from ..quality import PixelQualityFlags, TESSQualityFlags
from ..utils.fetch import fetch_all, fetch_dict
from ..utils.mathutils import mag2flux
from .metrics import compute_metrics_batch, crowding_metrics_batch
from .motion import MotionModel
from .status import STATUS

logger = logging.getLogger(__name__)

__all__ = ["SectorContext", "TpfContext", "TargetResult", "extract_aperture_batch",
           "extract_flux_core", "default_stamp_size", "aperture_image"]

#: Tmag -> default stamp size lookup (public TASOC calibration tables,
#: reference BasePhotometry.py:541-556).
_STAMP_TMAG = np.array([0.0, 0.52631579, 1.05263158, 1.57894737, 2.10526316,
                        2.63157895, 3.15789474, 3.68421053, 4.21052632, 4.73684211,
                        5.26315789, 5.78947368, 6.31578947, 6.84210526, 7.36842105,
                        7.89473684, 8.42105263, 8.94736842, 9.47368421, 10.0, 13.0])
_STAMP_HEIGHT = np.array([831.98319063, 533.58494422, 344.0840884, 223.73963332,
                          147.31365728, 98.77856016, 67.95585074, 48.38157414,
                          35.95072974, 28.05639497, 23.043017, 19.85922009,
                          17.83731732, 16.5532873, 15.73785092, 15.21999971,
                          14.89113301, 14.68228285, 14.54965042, 14.46542084, 14.0])
_STAMP_WIDTH = np.array([157.71602062, 125.1238281, 99.99440209, 80.61896267,
                         65.6799962, 54.16166547, 45.28073365, 38.4333048,
                         33.15375951, 28.05639497, 23.043017, 19.85922009,
                         17.83731732, 16.5532873, 15.73785092, 15.21999971,
                         14.89113301, 14.68228285, 14.54965042, 14.46542084, 14.0])


def default_stamp_size(tmag) -> tuple:
    """Default (n_rows, n_cols) of the stamp for a target of magnitude tmag."""
    nr = np.maximum(np.ceil(np.interp(tmag, _STAMP_TMAG, _STAMP_HEIGHT)), 15).astype(int)
    nc = np.maximum(np.ceil(np.interp(tmag, _STAMP_TMAG, _STAMP_WIDTH)), 15).astype(int)
    return nr, nc


# ---------------------------------------------------------------------------
# Contexts
# ---------------------------------------------------------------------------

class SectorContext:
    """One sector-CCD: cube on device + catalog + WCS + motion model.

    ``cache='device'`` uploads the image cubes to the default device (HBM);
    ``cache='host'`` keeps them as host numpy (jit programs then stream them).
    """

    datasource = "ffi"

    def __init__(self, input_folder: str, sector: int, camera: int, ccd: int,
                 cache: str = "device", motion_mode: str = "wcs",
                 time_corrector=None, cube_dtype=None, mesh=None):
        #: Optional core.timecorr.TimeCorrector for per-target barycentric
        #: corrections (recomputed per star position, like
        #: BasePhotometry.py:443-453; None keeps the cube's frame-level values).
        self.time_corrector = time_corrector
        #: Optional jax.sharding.Mesh (time x targets axes, parallel.mesh):
        #: the image cubes are uploaded TIME-SHARDED across the mesh and the
        #: final flux extraction runs the multi-chip shard_map program
        #: (parallel.sharded.sharded_extract_flux) — the production scale-out
        #: for cubes exceeding one chip's HBM.  The multi-chip counterpart of
        #: the reference's MPI share-nothing workers (run_tessphot_mpi.py:36-209),
        #: riding ICI instead of the filesystem.
        self.mesh = mesh
        #: Device dtype for the image cubes. ``jnp.bfloat16`` halves HBM
        #: residency and read bandwidth (sums still accumulate in float32);
        #: sector-scale distributional flux error vs f32 is ~0.1% at the
        #: 99th percentile (tests/test_engine_extras.py) — a
        #: *preview-quality* mode; keep float32 (default) for science.
        self.cube_dtype = cube_dtype
        self.input_folder = input_folder
        self.sector = sector
        self.camera = camera
        self.ccd = ccd
        cubes = discovery.find_cube_files(input_folder, sector=sector, camera=camera, ccd=ccd)
        if len(cubes) != 1:
            raise FileNotFoundError(
                f"HDF5 File not found. SECTOR={sector:d}, CAMERA={camera:d}, CCD={ccd:d}")
        cats = discovery.find_catalog_files(input_folder, sector=sector, camera=camera, ccd=ccd)
        if len(cats) != 1:
            raise FileNotFoundError(
                f"Catalog file not found: SECTOR={sector:d}, CAMERA={camera:d}, CCD={ccd:d}")
        self.catalog = StarCatalog(cats[0])

        cube = ImageCube(cubes[0])
        self.header = cube.header
        self.data_rel = int(self.header.get("DATA_REL", 99))
        self.cadence = int(self.header.get("CADENCE", 1800))
        self.num_frm = int(self.header.get("NUM_FRM", 900))
        crblksz = self.header.get("CRBLKSZ") or np.inf
        self.n_readout = int(self.header.get("NREADOUT") or
                             int(self.num_frm * (1 - 2 / crblksz)))
        self.readnoise = float(self.header.get("READNOIS", 10.0))
        self.gain = float(self.header.get("GAIN", 100.0))
        self.pixel_offset_row = int(self.header.get("PIXEL_OFFSET_ROW", 0))
        self.pixel_offset_col = int(self.header.get("PIXEL_OFFSET_COLUMN", 0))

        self.time = cube.time            # barycentre-corrected BTJD (fixes applied in prepare)
        self.timecorr = cube.timecorr
        self.cadenceno = cube.cadenceno
        self.quality = cube.quality
        self.wcs = cube.reference_wcs()
        self.shape = cube.shape
        self.n_times = cube.n_times

        self.sumimage = cube.sumimage.astype(np.float32)
        self.bkg_pixels_used = np.asarray(cube.h5["bkg_pixels_used"]).astype(bool)

        imgs = cube.images()
        errs = cube.images_err()
        bkgs = cube.backgrounds()
        pixf = cube.pixelflags()
        if cache == "device" and mesh is not None:
            # Time-sharded upload across the mesh: each host shard lands on
            # its own device, so cubes larger than one chip's HBM fit.  The
            # time axis is padded to the mesh's time-axis size with NaN
            # frames (pixelflags 0); ``n_times`` stays the true length and
            # every consumer slices gathered stamps back to it.
            from ..parallel.mesh import TIME_AXIS, cube_sharding
            n_time = mesh.shape[TIME_AXIS]
            pad = (-self.n_times) % n_time

            def _padded(a, fill):
                if not pad:
                    return a
                extra = np.full((pad,) + a.shape[1:], fill, a.dtype)
                return np.concatenate([a, extra], axis=0)

            dt = self.cube_dtype
            cs = cube_sharding(mesh)

            def _put(a):
                a = _padded(a, np.nan)
                if dt is not None:
                    a = np.asarray(a, dtype=dt)
                return jax.device_put(a, cs)

            self.images = _put(imgs)
            self.images_err = _put(errs)
            self.backgrounds = _put(bkgs)
            self.pixelflags = jax.device_put(_padded(pixf, 0), cs)
        elif cache == "device":
            dt = self.cube_dtype
            self.images = jnp.asarray(imgs, dtype=dt)
            self.images_err = jnp.asarray(errs, dtype=dt)
            self.backgrounds = jnp.asarray(bkgs, dtype=dt)
            self.pixelflags = jnp.asarray(pixf)
        else:
            self.images, self.images_err = imgs, errs
            self.backgrounds, self.pixelflags = bkgs, pixf

        # Motion model: per-frame WCS series (default), else stored kernels,
        # else unchanged (BasePhotometry.py:1186-1221):
        wcs_strings = cube.wcs_strings()
        self.motion = None
        t_nocorr = self.time - self.timecorr
        if motion_mode == "wcs" and any(s.strip() for s in wcs_strings):
            self.motion = MotionModel(warpmode="wcs", wcs_ref=self.wcs)
            self.motion.load_series(t_nocorr, wcs_strings)
        elif "movement_kernel" in cube.h5:
            mode = cube.h5["movement_kernel"].attrs.get("warpmode", "translation")
            self.motion = MotionModel(warpmode=str(mode))
            self.motion.load_series(t_nocorr, np.asarray(cube.h5["movement_kernel"]))
        else:
            self.motion = MotionModel(warpmode="unchanged")
        cube.close()

        # Collected pixels (aperture bit 1): pixel was read out at all.
        self.collected = np.isfinite(self.sumimage)

    def close(self):
        self.catalog.close()

    def target_position(self, ra, dec) -> tuple:
        """(row, col) 0-based CCD position for catalog coordinates."""
        row, col = self.wcs.rowcol_of_radec(np.atleast_1d(ra), np.atleast_1d(dec))
        return float(row[0]), float(col[0])

    def corrected_time(self, ra: float, dec: float) -> tuple:
        """(time, timecorr) for a target at (ra, dec).

        With a TimeCorrector, the barycentric correction is recomputed for
        the target's own sky position from the uncorrected spacecraft time;
        otherwise the cube's frame-level values pass through.
        """
        if self.time_corrector is None:
            return self.time, self.timecorr
        t_nocorr = self.time - self.timecorr
        corr = self.time_corrector.barycentric_correction(t_nocorr, float(ra), float(dec))
        return t_nocorr + corr, corr.astype(np.float32)


class TpfContext:
    """Target Pixel File presented with the SectorContext interface.

    Counterpart of the TPF branch of BasePhotometry.__init__
    (BasePhotometry.py:307-384).  The 'CCD image' is the TPF stamp itself;
    CCD coordinates are offset by the stamp corner.
    """

    datasource = "tpf"

    def __init__(self, input_folder: str, starid: int, sector: Optional[int] = None,
                 cadence: Optional[int] = None):
        from ..io.tess import read_tpf
        from ..fixes import time_offset
        files = discovery.find_tpf_files(input_folder, starid=starid, sector=sector,
                                         cadence=cadence)
        if len(files) == 0:
            raise FileNotFoundError("Target Pixel File not found")
        if len(files) > 1:
            raise FileNotFoundError("Multiple Target Pixel Files found matching pattern")
        tpf = read_tpf(files[0])
        self.tpf = tpf
        self.input_folder = input_folder
        self.sector = tpf.sector
        self.camera = tpf.camera
        self.ccd = tpf.ccd
        self.data_rel = tpf.data_rel
        self.cadence = tpf.cadence
        self.num_frm = tpf.num_frm
        self.n_readout = tpf.n_readout
        self.readnoise = tpf.readnoise
        self.gain = tpf.gain
        self.pixel_offset_row = tpf.corner_row
        self.pixel_offset_col = tpf.corner_col

        cats = discovery.find_catalog_files(input_folder, sector=self.sector,
                                            camera=self.camera, ccd=self.ccd)
        if len(cats) != 1:
            raise FileNotFoundError(
                f"Catalog file not found: SECTOR={self.sector:d}, "
                f"CAMERA={self.camera:d}, CCD={self.ccd:d}")
        self.catalog = StarCatalog(cats[0])

        self.time = time_offset(tpf.time, tpf.header, datatype="tpf")
        self.timecorr = tpf.timecorr
        self.cadenceno = tpf.cadenceno
        self.quality = tpf.quality
        self.n_times = len(self.time)
        self.shape = tpf.shape
        self.wcs = tpf.wcs  # stamp-relative WCS

        # (NaNs pass through on purpose — extract_flux_core's isfinite
        # filters own them; an nan_to_num here would turn inf pixels into
        # finite 3.4e38 values that corrupt the flux sums.)
        self.images = jnp.asarray(tpf.flux)
        self.images_err = jnp.asarray(tpf.flux_err)
        bkg = tpf.flux_bkg if tpf.flux_bkg is not None else np.zeros_like(tpf.flux)
        self.backgrounds = jnp.asarray(bkg)
        self.pixelflags = jnp.zeros(tpf.flux.shape, jnp.uint8)
        self.sumimage = np.nanmean(
            np.where(TESSQualityFlags.filter(tpf.quality)[:, None, None], tpf.flux, np.nan),
            axis=0).astype(np.float32)
        self.collected = (tpf.aperture & 1 != 0) if tpf.aperture is not None \
            else np.isfinite(self.sumimage)
        #: SPOC aperture bits (basis of the output APERTURE image,
        #: BasePhotometry.py:1063-1072):
        self.tpf_aperture = tpf.aperture
        self.bkg_pixels_used = np.zeros(self.shape, bool)

        # Motion: translation kernels from POS_CORR, re-zeroed at the frame
        # nearest the catalog reference time (BasePhotometry.py:1199-1216):
        t_nocorr = self.time - self.timecorr
        k = (tpf.pos_corr.astype(np.float64)
             if tpf.pos_corr is not None else np.zeros((0, 2)))
        good = (np.isfinite(t_nocorr[:len(k)]) & np.all(np.isfinite(k), axis=1)
                if len(k) else np.zeros(0, bool))
        if np.any(good):
            tt = t_nocorr[:len(k)][good]
            kk = k[good]
            ref_time = self.catalog.settings.reference_time - 2457000.0
            refindx = int(np.argmin(np.abs(tt - ref_time)))
            kk = kk - kk[refindx]
            self.motion = MotionModel(warpmode="translation")
            self.motion.load_series(tt, kk)
        else:
            # No usable (finite time, finite POS_CORR) pair — fall back to
            # a static pointing model instead of crashing on an empty
            # argmin (review find: all-finite POS_CORR on all-NaN times).
            self.motion = MotionModel(warpmode="unchanged")

    def close(self):
        self.catalog.close()

    def target_position(self, ra, dec) -> tuple:
        """(row, col) in *stamp* coordinates (the TPF WCS is stamp-relative)."""
        row, col = self.wcs.rowcol_of_radec(np.atleast_1d(ra), np.atleast_1d(dec))
        return float(row[0]), float(col[0])

    time_corrector = None

    def corrected_time(self, ra: float, dec: float) -> tuple:
        """TPFs keep the per-cadence SPOC barycentric corrections."""
        return self.time, self.timecorr


# ---------------------------------------------------------------------------
# Results
# ---------------------------------------------------------------------------

@dataclass
class TargetResult:
    """Everything produced for one target by an extraction."""

    starid: int
    method: str
    status: STATUS
    sector: int
    camera: int
    ccd: int
    cadence: int
    data_rel: int
    target: dict
    lightcurve: dict
    mask: Optional[np.ndarray] = None
    aperture_image: Optional[np.ndarray] = None
    sumimage_stamp: Optional[np.ndarray] = None
    stamp: Optional[tuple] = None
    details: dict = field(default_factory=dict)
    additional_headers: dict = field(default_factory=dict)
    skip_targets: list = field(default_factory=list)
    num_frm: int = 900
    n_readout: int = 720
    ticver: str = "unknown"
    stamp_wcs: object = None

    def save(self, output_folder: str, version: int) -> str:
        from .lightcurve import save_lightcurve
        halo_wm = self.details.get("halo_weightmap")
        path = save_lightcurve(self, output_folder, version,
                               sumimage=self.sumimage_stamp,
                               stamp_wcs=self.stamp_wcs,
                               halo_weightmap=halo_wm)
        self.details["filepath_lightcurve"] = path
        return path


# ---------------------------------------------------------------------------
# Batched stamp machinery
# ---------------------------------------------------------------------------

def aperture_image(ctx, stamp, mask_stamp) -> np.ndarray:
    """TESS-product APERTURE bits for one stamp (BasePhotometry.py:1031-1074
    + the final-mask bits of :1644-1649).

    ``stamp`` = (r0, r1, c0, c1) in 0-based science coords.  FFI: bit 1 =
    pixel collected, bit 4 = used in background fit, bits 32/64/128/256 = CCD
    output A-D by raw 1-based column (science col + PIXEL_OFFSET_COLUMN + 1;
    outputs span raw 45-556/557-1068/1069-1580/1581-2092).  TPF: the SPOC
    aperture with its mask/centroid bits (2|8) cleared.  Both get 2|8 on the
    pipeline's own photometric mask.
    """
    r0, r1, c0, c1 = stamp
    tpf_ap = getattr(ctx, "tpf_aperture", None)
    if ctx.datasource == "ffi" or tpf_ap is None:
        ap = ctx.collected[r0:r1, c0:c1].astype(np.int32)
        ap |= 4 * ctx.bkg_pixels_used[r0:r1, c0:c1].astype(np.int32)
        if ctx.datasource == "ffi":
            rawcol = np.arange(c0, c1) + ctx.pixel_offset_col + 1  # 1-based raw
            bits = np.zeros_like(rawcol, np.int32)
            bits[(45 <= rawcol) & (rawcol <= 556)] = 32     # CCD output A
            bits[(557 <= rawcol) & (rawcol <= 1068)] = 64   # CCD output B
            bits[(1069 <= rawcol) & (rawcol <= 1580)] = 128  # CCD output C
            bits[(1581 <= rawcol) & (rawcol <= 2092)] = 256  # CCD output D
            ap |= bits[None, :]
    else:
        ap = np.asarray(tpf_ap[r0:r1, c0:c1], np.int32) & ~np.int32(2 | 8)
    if mask_stamp is not None:
        ap |= np.where(mask_stamp, np.int32(2 | 8), np.int32(0))
    return ap


def _gather_stamps_image(image, r0s, c0s, h: int, w: int):
    """vmapped (N,) dynamic slices of an (H, W) image -> (N, h, w)."""
    def one(r0, c0):
        return jax.lax.dynamic_slice(image, (r0, c0), (h, w))
    return jax.vmap(one)(r0s, c0s)


def extract_flux_core(images, images_err, backgrounds, pixelflags,
                      masks, r0s, c0s, h: int, w: int, windows=None):
    """Aperture sums for all targets and cadences in one program.

    images: (T, H, W); masks: (N, h, w); r0s/c0s: (N,) stamp corners.
    ``windows`` (N, h, w) bool optionally limits the shenanigans flag to
    each target's *logical* stamp — without it, a target batched into a
    padded bucket would pick up BackgroundShenanigans pixels far outside
    its own stamp and its quality flags would depend on batch composition
    (reference: "detected somewhere in the final stamp",
    BasePhotometry.py:1446-1451).
    Returns flux (N, T), flux_err (N, T), flux_bkg (N, T),
    centroid (N, T, 2) in 1-based CCD coords, shenanigans_any (N, T).

    Formulated as dense gathers (one advanced-indexing gather per cube) and
    einsum reductions: nested vmapped ``dynamic_slice``s compile in minutes
    at full sector scale, while this compiles in seconds and runs at HBM
    bandwidth (the cubes stay resident; only stamp bytes are touched).

    Every output element depends on exactly one (target, cadence) pair, so
    the same function body runs unchanged as the per-shard program of the
    multi-chip extraction (parallel.sharded.sharded_extract_flux) with
    bitwise-identical results.
    """
    N = masks.shape[0]
    rows = r0s[:, None] + jnp.arange(h)[None, :]               # (N, h)
    cols = c0s[:, None] + jnp.arange(w)[None, :]               # (N, w)
    ridx = rows[:, :, None]                                    # (N, h, 1)
    cidx = cols[:, None, :]                                    # (N, 1, w)

    # Gathers read the cubes at their stored dtype (bf16 halves the HBM
    # traffic when SectorContext(cube_dtype=bfloat16)); all arithmetic below
    # accumulates in float32:
    st = images[:, ridx, cidx].astype(jnp.float32)             # (T, N, h, w)
    se = images_err[:, ridx, cidx].astype(jnp.float32)
    sb = backgrounds[:, ridx, cidx].astype(jnp.float32)
    sf = pixelflags[:, ridx, cidx]

    m = masks[None]                                            # (1, N, h, w)
    vals = jnp.where(m, st, jnp.nan)
    finite = jnp.isfinite(vals)
    n_fin = jnp.sum(finite, axis=(2, 3))                       # (T, N)
    total = jnp.sum(jnp.where(finite, vals, 0.0), axis=(2, 3))
    all_zero = jnp.all(jnp.where(m, st == 0, True), axis=(2, 3))
    all_bad = (n_fin == 0) | all_zero
    flux = jnp.where(all_bad, jnp.nan, total)                  # (T, N)
    err2 = jnp.sum(jnp.where(m & jnp.isfinite(se), se * se, 0.0), axis=(2, 3))
    ferr = jnp.where(all_bad, jnp.nan, jnp.sqrt(err2))

    # flux-weighted centroid over positive pixels (1-based CCD coords):
    wgt = jnp.where(m & finite & (vals > 0), vals, 0.0)        # (T, N, h, w)
    wsum = jnp.sum(wgt, axis=(2, 3))
    cx = jnp.einsum("tnhw,nw->tn", wgt, (cols + 1).astype(wgt.dtype))
    cy = jnp.einsum("tnhw,nh->tn", wgt, (rows + 1).astype(wgt.dtype))
    cx = cx / jnp.maximum(wsum, 1e-30)
    cy = cy / jnp.maximum(wsum, 1e-30)
    cent = jnp.where(wsum[..., None] > 0, jnp.stack([cx, cy], axis=-1),
                     jnp.nan)                                   # (T, N, 2)

    mb = m & jnp.isfinite(sb)
    bsum = jnp.where(jnp.any(mb, axis=(2, 3)),
                     jnp.sum(jnp.where(mb, sb, 0.0), axis=(2, 3)), jnp.nan)
    shen_pix = (sf & PixelQualityFlags.BackgroundShenanigans) != 0
    if windows is not None:
        shen_pix = shen_pix & windows[None]
    shen = jnp.any(shen_pix, axis=(2, 3))

    # transpose to (N, T) layout expected by callers:
    return (flux.T, ferr.T, bsum.T, jnp.transpose(cent, (1, 0, 2)), shen.T)


_extract_flux_batch = functools.partial(
    jax.jit, static_argnames=("h", "w"))(extract_flux_core)


def _extract_flux_streamed(ctx, masks, r0s, c0s, h: int, w: int,
                           chunk: int = 128, windows=None):
    """T-chunked extraction for host-resident cubes (``cache='host'``).

    A full sector cube (e.g. 1300 x 2048 x 2048 x 3 quantities ~ 65 GB)
    exceeds single-chip HBM; this path streams fixed-size time chunks
    through the jitted kernel (padded so only one program is compiled) and
    stitches the results.  Multi-chip time-sharding (parallel.sharded) is
    the scale-out alternative.
    """
    T = ctx.n_times
    outs = []
    for t0 in range(0, T, chunk):
        t1 = min(t0 + chunk, T)
        n = t1 - t0
        def block(arr, fill=np.nan):
            b = np.asarray(arr[t0:t1])
            if n < chunk:
                pad = np.full((chunk - n,) + b.shape[1:], fill, dtype=b.dtype)
                b = np.concatenate([b, pad])
            return jnp.asarray(b)
        out = _extract_flux_batch(block(ctx.images), block(ctx.images_err),
                                  block(ctx.backgrounds),
                                  block(ctx.pixelflags, fill=0),
                                  masks, r0s, c0s, h, w, windows)
        outs.append(tuple(np.asarray(o)[:, :n] for o in out))
    return tuple(np.concatenate([o[i] for o in outs], axis=1)
                 for i in range(5))


def _extract_flux_sharded(ctx, masks, r0s, c0s, h: int, w: int, windows):
    """Multi-chip extraction tier: shard_map over ctx.mesh (time x targets).

    The cube was uploaded time-sharded (and time-padded) by SectorContext;
    here the *target* axis is padded to the mesh's target-axis size, the
    sharded program runs (banded MXU kernel when the mesh is time-only and
    the banded gate holds, dense-gather shard_map otherwise), and outputs
    are sliced back to the true (N, ctx.n_times).  Exactness: every output
    element depends on exactly one (target, cadence) pair, so sharding is
    bitwise-neutral (asserted in tests/test_mesh_production.py).

    The reference's counterpart is share-nothing MPI workers exchanging
    bulk data through the filesystem (run_tessphot_mpi.py:36-209); here the
    cube stays resident across device HBM and XLA moves only per-target
    rows over ICI.
    """
    from ..ops.bandext import use_banded
    from ..parallel.mesh import TARGET_AXIS
    from ..parallel.sharded import (pad_to_multiple, sharded_band_extract,
                                    sharded_extract_flux)
    mesh = ctx.mesh
    N = masks.shape[0]
    T = ctx.n_times
    n_targets = mesh.shape[TARGET_AXIS]
    masks_p, _ = pad_to_multiple(np.asarray(masks), 0, n_targets, fill=False)
    windows_p, _ = pad_to_multiple(np.asarray(windows), 0, n_targets,
                                   fill=False)
    r0s_p, _ = pad_to_multiple(np.asarray(r0s, np.int32), 0, n_targets, fill=0)
    c0s_p, _ = pad_to_multiple(np.asarray(c0s, np.int32), 0, n_targets, fill=0)
    if n_targets == 1 and use_banded(ctx):
        out = sharded_band_extract(
            ctx.images, ctx.images_err, ctx.backgrounds, ctx.pixelflags,
            masks_p, r0s_p, c0s_p, mesh, h, w, windows=windows_p)
    else:
        out = sharded_extract_flux(
            ctx.images, ctx.images_err, ctx.backgrounds, ctx.pixelflags,
            masks_p, r0s_p, c0s_p, mesh, h, w, windows=windows_p)
    return tuple(np.asarray(o)[:N, :T] for o in out)


def _stamp_catalog_select(cat_all: dict, r0, r1, c0, c1, offset_rc=(0, 0),
                          buffer_px: float = 5.0) -> np.ndarray:
    """Indices of catalog stars within one stamp (+buffer), brightest first."""
    row = cat_all["row"] - offset_rc[0]
    col = cat_all["col"] - offset_rc[1]
    sel = ((row >= r0 - buffer_px) & (row <= r1 - 1 + buffer_px)
           & (col >= c0 - buffer_px) & (col <= c1 - 1 + buffer_px))
    idx = np.where(sel)[0]
    return idx[np.argsort(cat_all["tmag"][idx], kind="stable")]


#: Padded catalog widths shared across batches so the mask-builder jit
#: cache stays warm (same idea as the stamp-bucket ladder):
_K_LADDER = (48, 64, 96, 128, 192, 256, 384, 512, 768, 1024)


def _catalog_bucket(n: int) -> int:
    for b in _K_LADDER:
        if b >= n:
            return b
    return int(n)


def _stamp_catalog(cat_all: dict, idx: np.ndarray, r0, c0, pad_to: int,
                   offset_rc=(0, 0)):
    """Padded per-stamp catalog table from pre-selected indices.

    ``pad_to`` is the shared batch width: callers size it to the LARGEST
    star count in the round (``_catalog_bucket``), so — unlike the old
    fixed 48-star cap — no star inside any stamp is ever silently dropped
    (the reference uses every catalog star in the stamp,
    k2p2v2.py:89-288 / photometry.py:222-250).  If ``pad_to`` is still
    smaller (explicit user cap), the brightest stars win.
    """
    if len(idx) > pad_to:
        idx = idx[:pad_to]  # brightest first from _stamp_catalog_select
    k = len(idx)
    out = {
        "starid": np.zeros(pad_to, np.int64),
        "row": np.full(pad_to, 1e9), "col": np.full(pad_to, 1e9),
        "tmag": np.full(pad_to, 30.0), "valid": np.zeros(pad_to, bool),
    }
    out["starid"][:k] = cat_all["starid"][idx]
    out["row"][:k] = cat_all["row"][idx] - offset_rc[0] - r0
    out["col"][:k] = cat_all["col"][idx] - offset_rc[1] - c0
    out["tmag"][:k] = cat_all["tmag"][idx]
    out["valid"][:k] = True
    return out


def _ctx_device_array(ctx, name: str, build):
    """Per-context cache of eagerly-uploaded device arrays.

    The full-CCD sumimage/collected maps are constant for a context's
    lifetime; re-uploading them per retry round cost ~1.4 s each through
    the ~12 MB/s tunnel (CLAUDE.md upload-hoisting rule).  Eager call
    sites only — never cache device values from inside a traced function.
    """
    cache = getattr(ctx, "_dev_cache", None)
    if cache is None:
        cache = {}
        try:
            ctx._dev_cache = cache
        except AttributeError:  # exotic read-only context
            return jnp.asarray(build())
    if name not in cache:
        cache[name] = jnp.asarray(build())
    return cache[name]


def _full_catalog_positions(ctx) -> dict:
    """All catalog stars with 0-based CCD positions through the context WCS."""
    cat = ctx.catalog.all_stars()
    if len(cat["starid"]) == 0:
        return {"starid": np.array([], np.int64), "row": np.array([]),
                "col": np.array([]), "tmag": np.array([])}
    # For TPFs the WCS is stamp-relative and the engine works in stamp
    # coordinates (ctx.shape is the stamp), so no offset is applied here.
    row, col = ctx.wcs.rowcol_of_radec(cat["ra"], cat["decl"])
    return {"starid": cat["starid"], "row": np.asarray(row), "col": np.asarray(col),
            "tmag": cat["tmag"]}


# ---------------------------------------------------------------------------
# The batched aperture extractor
# ---------------------------------------------------------------------------

def extract_aperture_batch(ctx, starids, retries: Optional[int] = None,
                           max_stars: Optional[int] = None,
                           k2p2_params: Optional[K2P2Params] = None) -> list:
    """K2P2 aperture photometry for a batch of targets on one context.

    Returns a list of :class:`TargetResult` in the order of ``starids``.

    ``max_stars`` (default None = unlimited) optionally caps the per-stamp
    catalog width; by default the width adapts to the most crowded stamp
    in each retry round, so no catalog star in any stamp is dropped.

    The stamp-resize retry loop runs on the host over the shrinking set of
    targets whose mask touches a stamp edge (counterpart of
    AperturePhotometry/photometry.py:71-165, incl. the halo-switch quick
    break for bright targets at the stamp-size limit).
    """
    settings = load_settings()
    halos_tmag = settings.getfloat("haloswitch", "tmag_limit", fallback=6.0)
    halos_flux = settings.getfloat("haloswitch", "flux_limit", fallback=0.01)
    deblend_ratio = settings.getfloat("deblend", "neighbour_flux_ratio",
                                      fallback=0.1)
    if k2p2_params is None:
        k2p2_params = DEFAULT_K2P2_PARAMS

    starids = [int(s) for s in starids]
    if not starids:
        return []
    N = len(starids)
    H, W = ctx.shape
    T = ctx.n_times
    cat_all = _full_catalog_positions(ctx)
    # (No nan_to_num: NaNs are owned by downstream isfinite filters, and
    # nan_to_num would turn inf pixels into finite 3.4e38 values.)
    sum_dev = _ctx_device_array(ctx, "sumimage", lambda: ctx.sumimage)

    # --- per-target setup -------------------------------------------------
    targets = []
    for sid in starids:
        tgt = ctx.catalog.target(sid)
        row, col = ctx.target_position(tgt["ra"], tgt["decl"])
        if ctx.datasource.startswith("tpf"):
            stamp = [0, H, 0, W]      # TPF: whole postage stamp
            max_retries = 1
        else:
            nr, nc = default_stamp_size(tgt["tmag"])
            stamp = [int(round(row)) - nr // 2, int(round(row)) + nr // 2 + 1,
                     int(round(col)) - nc // 2, int(round(col)) + nc // 2 + 1]
            max_retries = (10 if tgt["tmag"] < 6 else 5) if retries is None else retries
        targets.append({
            "starid": sid, "target": tgt, "row": row, "col": col,
            "stamp": stamp, "resizes": 0, "max_retries": max_retries,
            "done": False, "status": None, "details": {}, "mask": None,
            "edge_sides": None,
        })

    def clip_stamp(s):
        return [int(max(s[0], 0)), int(min(s[1], H)), int(max(s[2], 0)), int(min(s[3], W))]

    # Quantized stamp-bucket ladder: batches re-use a small set of program
    # shapes, so the jit cache stays warm across batches/rounds (the
    # TaskManager's tmag-sorted leases keep batches homogeneous, so the
    # padding waste of a shared bucket is small).
    _LADDER = (17, 25, 33, 49, 65, 97, 129, 161, 225, 337, 513, 769, 1025)

    def _bucket(n: int, limit: int) -> int:
        for b in _LADDER:
            if b >= n:
                return min(b, limit)
        return min(n, limit)

    # --- retry rounds -------------------------------------------------------
    # At least one round always runs: the initial mask build is inside the
    # loop, so retries=0 must still attempt photometry once.
    for rnd in range(max(max(t["max_retries"] for t in targets), 1)):
        active = [t for t in targets if not t["done"] and t["resizes"] <= t["max_retries"]]
        if not active:
            break
        # Common padded bucket for this round:
        hs = [clip_stamp(t["stamp"]) for t in active]
        bh = _bucket(max(s[1] - s[0] for s in hs), H)
        bw = _bucket(max(s[3] - s[2] for s in hs), W)

        # Two-pass catalog build: select every star in every stamp first,
        # then pad all tables to one shared width sized to the round's
        # LARGEST count — crowded bright-target stamps can hold far more
        # than the old fixed 48-star cap, and a silent brightest-48
        # truncation loses skip_targets/contamination/watershed markers
        # (reference k2p2v2.py:89-288 uses them all):
        sel_idx = [_stamp_catalog_select(cat_all, s[0], s[1], s[2], s[3])
                   for s in hs]
        k_round = _catalog_bucket(max((len(ix) for ix in sel_idx), default=1))
        if max_stars is not None:
            k_round = min(k_round, int(max_stars))

        r0s, c0s, cats, sums, colls, trs, tcs, tts = [], [], [], [], [], [], [], []
        for t, s, ix in zip(active, hs, sel_idx):
            # slice of bucket size fully inside the CCD, anchored at stamp:
            r0 = min(s[0], H - bh)
            c0 = min(s[2], W - bw)
            t["bucket_corner"] = (r0, c0)
            t["clipped"] = s
            r0s.append(r0)
            c0s.append(c0)
            trs.append(t["row"] - r0)
            tcs.append(t["col"] - c0)
            tts.append(t["target"]["tmag"])
            cats.append(_stamp_catalog(cat_all, ix, s[0], s[2], k_round))
        r0s = jnp.asarray(np.array(r0s, np.int32))
        c0s = jnp.asarray(np.array(c0s, np.int32))
        stamps = _gather_stamps_image(sum_dev, r0s, c0s, bh, bw)
        coll_dev = _ctx_device_array(
            ctx, "collected", lambda: ctx.collected.astype(np.float32))
        coll = _gather_stamps_image(coll_dev, r0s, c0s, bh, bw) > 0
        # Mask out pixels outside each target's *logical* stamp:
        yy, xx = np.mgrid[0:bh, 0:bw]
        logical = []
        for t in active:
            r0, c0 = t["bucket_corner"]
            s = t["clipped"]
            logical.append((yy + r0 >= s[0]) & (yy + r0 < s[1])
                           & (xx + c0 >= s[2]) & (xx + c0 < s[3]))
        logical = jnp.asarray(np.stack(logical))
        stamps = jnp.where(logical, stamps, jnp.nan)
        coll = coll & logical

        cat_col = jnp.asarray(np.stack([c["col"] + (t["clipped"][2] - t["bucket_corner"][1])
                                        for c, t in zip(cats, active)]), jnp.float32)
        cat_row = jnp.asarray(np.stack([c["row"] + (t["clipped"][0] - t["bucket_corner"][0])
                                        for c, t in zip(cats, active)]), jnp.float32)
        cat_tmag = jnp.asarray(np.stack([c["tmag"] for c in cats]), jnp.float32)
        cat_sid = jnp.asarray(np.stack([c["starid"] for c in cats]))
        cat_valid = jnp.asarray(np.stack([c["valid"] for c in cats]))
        t_row = jnp.asarray(np.array(trs), jnp.float32)
        t_col = jnp.asarray(np.array(tcs), jnp.float32)
        t_tmag = jnp.asarray(np.array(tts), jnp.float32)

        out = build_masks_batch(stamps, cat_col, cat_row, cat_tmag, cat_sid,
                                cat_valid, t_row, t_col, t_tmag,
                                collected=coll, params=k2p2_params)
        masks, found, no_flux, in_mask = fetch_all(
            out["mask"], out["found_mask"], out["no_flux"], out["in_mask"])

        # Edge contact of the *logical* stamp:
        for i, t in enumerate(active):
            r0, c0 = t["bucket_corner"]
            s = t["clipped"]
            m = masks[i]
            bot = np.any(m[s[0] - r0, :]) if s[0] - r0 < bh else False
            top = np.any(m[s[1] - r0 - 1, :])
            left = np.any(m[:, s[2] - c0])
            right = np.any(m[:, s[3] - c0 - 1])
            t["mask_bucket"] = m
            t["found"] = bool(found[i])
            t["no_flux"] = bool(no_flux[i])
            t["cat"] = cats[i]
            t["in_mask"] = np.asarray(in_mask[i]) & cats[i]["valid"]

            resize = {}
            if ctx.datasource == "ffi":
                if bot:
                    resize["down"] = 10
                if top:
                    resize["up"] = 10
                if left:
                    resize["left"] = 10
                if right:
                    resize["right"] = 10
            if not resize:
                t["done"] = True
                continue
            # try to resize; clamp to CCD:
            old = list(t["stamp"])
            s2 = list(t["stamp"])
            if "down" in resize:
                s2[0] -= 10
            if "up" in resize:
                s2[1] += 10
            if "left" in resize:
                s2[2] -= 10
            if "right" in resize:
                s2[3] += 10
            changed = clip_stamp(s2) != clip_stamp(old)
            t["stamp"] = s2
            if not changed:
                # Could not resize further -> halo-switch quick break check.
                # (No tpf-secondary exemption needed here: resize is only
                # ever populated for ctx.datasource == "ffi".)
                tgt = t["target"]
                if tgt["tmag"] <= halos_tmag:
                    edge_img = np.zeros_like(m, dtype=bool)
                    cs = t["clipped"]
                    if "down" in resize:
                        edge_img[cs[0] - r0, :] = True
                    if "up" in resize:
                        edge_img[cs[1] - r0 - 1, :] = True
                    if "left" in resize:
                        edge_img[:, cs[2] - c0] = True
                    if "right" in resize:
                        edge_img[:, cs[3] - c0 - 1] = True
                    stamp_np = np.asarray(stamps[i])
                    edge_flux = np.nansum(stamp_np[m & edge_img])
                    expected = float(np.asarray(mag2flux(tgt["tmag"])))
                    if edge_flux / expected > halos_flux:
                        t["details"]["edge_flux"] = float(edge_flux)
                        t["status"] = STATUS.ERROR
                        t["details"]["errors"] = ["Stamp resize hit limit. Haloswitch quick break."]
                # If no quick break fired, the mask still touches the edge
                # but we accept it (the reference breaks its loop the same
                # way, photometry.py:138-141).
                t["done"] = True
                continue
            t["resizes"] += 1
            if t["resizes"] >= t["max_retries"]:
                t["status"] = STATUS.ERROR
                t["details"]["errors"] = ["Too many stamp resizes."]
                t["done"] = True

    # Any still-active targets after rounds -> too many resizes:
    for t in targets:
        if not t.get("done"):
            t["status"] = STATUS.ERROR
            t.setdefault("details", {})["errors"] = ["Too many stamp resizes."]
            t["done"] = True

    # --- final flux extraction (single bucket over final masks) -------------
    ok_targets = [t for t in targets if t["status"] is None and t.get("mask_bucket") is not None]
    results = {t["starid"]: None for t in targets}

    if ok_targets:
        bh = max(t["mask_bucket"].shape[0] for t in ok_targets)
        bw = max(t["mask_bucket"].shape[1] for t in ok_targets)
        masks_f = np.zeros((len(ok_targets), bh, bw), bool)
        # logical-stamp windows: the shenanigans flag must see only the
        # target's own stamp, not the shared padded bucket:
        windows_f = np.zeros((len(ok_targets), bh, bw), bool)
        r0s = np.zeros(len(ok_targets), np.int32)
        c0s = np.zeros(len(ok_targets), np.int32)
        for i, t in enumerate(ok_targets):
            m = t["mask_bucket"]
            r0, c0 = t["bucket_corner"]
            r0 = min(r0, H - bh)
            c0 = min(c0, W - bw)
            # re-anchor mask into the (possibly larger) final bucket:
            dr = t["bucket_corner"][0] - r0
            dc = t["bucket_corner"][1] - c0
            masks_f[i, dr:dr + m.shape[0], dc:dc + m.shape[1]] = m
            s = t["clipped"]
            windows_f[i, s[0] - r0:s[1] - r0, s[2] - c0:s[3] - c0] = True
            r0s[i] = r0
            c0s[i] = c0
        from ..ops.bandext import use_banded, band_extract_flux_batch
        if isinstance(ctx.images, np.ndarray):
            # Host-resident cube: stream time chunks through the device.
            flux, ferr, fbkg, cent, shen = _extract_flux_streamed(
                ctx, jnp.asarray(masks_f), jnp.asarray(r0s), jnp.asarray(c0s),
                bh, bw, windows=jnp.asarray(windows_f))
        elif getattr(ctx, "mesh", None) is not None:
            # Multi-chip production tier: the cube is time-sharded across
            # ctx.mesh (SectorContext upload); targets shard across the
            # orthogonal axis.  Exact — every output element depends on one
            # (target, cadence) pair (bit-identical to single-device,
            # tests/test_mesh_production.py).
            flux, ferr, fbkg, cent, shen = _extract_flux_sharded(
                ctx, masks_f, r0s, c0s, bh, bw, windows_f)
        elif use_banded(ctx):
            # Dense target batches on TPU: full-pass banded MXU kernel
            # (~7x the scattered-gather formulation at 10k targets):
            flux, ferr, fbkg, cent, shen = band_extract_flux_batch(
                ctx.images, ctx.images_err, ctx.backgrounds, ctx.pixelflags,
                masks_f, r0s, c0s, bh, bw, windows=windows_f)
        else:
            flux, ferr, fbkg, cent, shen = _extract_flux_batch(
                ctx.images, ctx.images_err, ctx.backgrounds, ctx.pixelflags,
                jnp.asarray(masks_f), jnp.asarray(r0s), jnp.asarray(c0s),
                bh, bw, jnp.asarray(windows_f))
        flux, ferr, fbkg, cent, shen = fetch_all(flux, ferr, fbkg, cent, shen)

        # pos_corr for every target over time:
        rows = np.array([t["row"] for t in ok_targets])
        cols = np.array([t["col"] for t in ok_targets])
        if ctx.datasource.startswith("tpf"):
            rows_ccd = rows + ctx.pixel_offset_row
            cols_ccd = cols + ctx.pixel_offset_col
        else:
            rows_ccd, cols_ccd = rows, cols
        jit_all = ctx.motion.jitter_batch(ctx.time - ctx.timecorr, cols_ccd, rows_ccd)  # (T, N, 2)

        metrics = compute_metrics_batch(
            jnp.asarray(ctx.time), jnp.asarray(flux), jnp.asarray(ferr),
            jnp.asarray(ctx.quality), jnp.asarray(cent))
        metrics = fetch_dict(metrics)

        # PSF-flux completeness/crowding of the final masks (SPOC
        # FLFRCSAP/CROWDSAP; see core.metrics.crowding_metrics_batch).
        # Targets from different retry rounds can carry different padded
        # catalog widths (adaptive k_round); stack to the widest:
        K = max(len(t["cat"]["row"]) for t in ok_targets)
        cm_row = np.full((len(ok_targets), K), 1e9, np.float32)
        cm_col = np.full((len(ok_targets), K), 1e9, np.float32)
        cm_flux = np.zeros((len(ok_targets), K), np.float32)
        cm_valid = np.zeros((len(ok_targets), K), bool)
        cm_istgt = np.zeros((len(ok_targets), K), bool)
        cm_trow = np.zeros(len(ok_targets), np.float32)
        cm_tcol = np.zeros(len(ok_targets), np.float32)
        cm_tflux = np.zeros(len(ok_targets), np.float32)
        for i, t in enumerate(ok_targets):
            c = t["cat"]
            s = t["clipped"]
            k = len(c["row"])
            cm_row[i, :k] = c["row"] + (s[0] - r0s[i])
            cm_col[i, :k] = c["col"] + (s[2] - c0s[i])
            cm_flux[i, :k] = np.asarray(mag2flux(c["tmag"]), np.float32)
            cm_valid[i, :k] = c["valid"]
            cm_istgt[i, :k] = c["valid"] & (c["starid"] == t["starid"])
            cm_trow[i] = t["row"] - r0s[i]
            cm_tcol[i] = t["col"] - c0s[i]
            # the target's own flux, independent of the K slot tables (it
            # may have been dropped from them in a >K-star stamp):
            cm_tflux[i] = float(mag2flux(t["target"].get("tmag", np.nan)))
        psf_sigma = float(getattr(ctx, "header", {}).get("PSFSIGMA", 1.25)
                          or 1.25)
        crowding = crowding_metrics_batch(
            jnp.asarray(masks_f), jnp.asarray(cm_row), jnp.asarray(cm_col),
            jnp.asarray(cm_flux), jnp.asarray(cm_valid),
            jnp.asarray(cm_istgt), jnp.asarray(cm_trow),
            jnp.asarray(cm_tcol), jnp.asarray(cm_tflux),
            jnp.float32(psf_sigma))
        crowding = fetch_dict(crowding)

    for i, t in enumerate(ok_targets):
        tgt = t["target"]
        m = t["mask_bucket"]
        r0, c0 = t["bucket_corner"]
        s = t["clipped"]
        # crop the bucket down to the logical stamp:
        mb = masks_f[i]
        fr0, fc0 = int(r0s[i]), int(c0s[i])
        mask_stamp = mb[s[0] - fr0:s[1] - fr0, s[2] - fc0:s[3] - fc0]
        sum_stamp = ctx.sumimage[s[0]:s[1], s[2]:s[3]]
        aperture = aperture_image(ctx, s, mask_stamp)

        status = STATUS.OK
        details = dict(t["details"])
        add_headers = {
            "KP_THRES": (k2p2_params.thresh, "K2P2 sum-image threshold"),
            "KP_MIPIX": (k2p2_params.min_no_pixels_in_mask, "K2P2 min pixels in mask"),
            "KP_MICLS": (k2p2_params.min_for_cluster, "K2P2 min pix. for cluster"),
            "KP_CLSRA": (float(np.sqrt(2) + np.finfo(np.float64).eps), "K2P2 cluster radius"),
            "KP_WS": (bool(k2p2_params.segmentation), "K2P2 watershed segmentation"),
            "KP_WSBLR": (k2p2_params.ws_blur, "K2P2 watershed blur"),
            "KP_WSTHR": (k2p2_params.ws_thres, "K2P2 watershed threshold"),
            "KP_WSFOT": (k2p2_params.ws_footprint, "K2P2 watershed footprint"),
            "KP_EX": (bool(k2p2_params.extend_overflow), "K2P2 extend overflow"),
        }

        # contamination + skip targets (photometry.py:222-250):
        cat = t["cat"]
        in_mask = t["in_mask"]
        ids_in = cat["starid"][in_mask]
        skip_targets = [int(s_) for s_ in ids_in if s_ != t["starid"]]
        if len(ids_in) == 0:
            contamination = np.nan
            status = STATUS.ERROR
            details.setdefault("errors", []).append("No targets in mask.")
        elif len(ids_in) == 1 and int(ids_in[0]) == t["starid"]:
            contamination = 0.0
        else:
            mags = cat["tmag"][in_mask]
            mags_total = -2.5 * np.log10(np.nansum(10 ** (-0.4 * mags)))
            contamination = float(np.clip(1.0 - 10 ** (0.4 * (mags_total - tgt["tmag"])), 0, None))
        if np.isfinite(contamination):
            add_headers["AP_CONT"] = (round(float(contamination), 8), "AP contamination")
            details["contamination"] = float(contamination)

        # PSF-model completeness + crowding (beyond-reference: the
        # position-based contamination above is blind to flux truncation
        # by tight watershed splits and to wing bleed; these are not):
        completeness = float(crowding["completeness"][i])
        crowdsap = float(crowding["crowdsap"][i])
        details["completeness"] = completeness
        details["crowdsap"] = crowdsap
        # Nearest valid catalog neighbour (px), and nearest *significant*
        # one (flux >= [deblend] neighbour_flux_ratio of the target's): the
        # dispatcher's deblend auto-switch keys on these to tell a real
        # blend (split-boundary flux is genuinely ambiguous — PARITY.md
        # "Mask tie-break bound") from ordinary PSF-wing loss on isolated
        # faint stars, which no mask can avoid:
        others = cat["valid"] & (cat["starid"] != t["starid"])
        if others.any():
            dist = np.hypot(cat["row"][others] - (t["row"] - s[0]),
                            cat["col"][others] - (t["col"] - s[2]))
            details["nearest_neighbour_px"] = float(np.min(dist))
            ratio = 10.0 ** (-0.4 * (cat["tmag"][others] - tgt["tmag"]))
            sig = ratio >= deblend_ratio
            if sig.any():
                details["nearest_significant_neighbour_px"] = \
                    float(np.min(dist[sig]))
        add_headers["FLFRCSAP"] = (round(completeness, 6),
                                   "Frac. of target PSF flux in aperture")
        add_headers["CROWDSAP"] = (round(crowdsap, 6),
                                   "Target flux / total flux in aperture")
        if t["found"] and completeness < 0.5:
            status = STATUS.WARNING if status == STATUS.OK else status
            details.setdefault("errors", []).append(
                f"Mask captures only {100 * completeness:.0f}% of the "
                "target's PSF flux (deblending truncation).")

        if not t["found"]:
            status = STATUS.WARNING if status == STATUS.OK else status
            details.setdefault("errors", []).append(
                "No flux above threshold." if t["no_flux"]
                else "No mask found for main target. Using minimum aperture.")

        t_i, tc_i = ctx.corrected_time(tgt["ra"], tgt["decl"])
        lc = {
            "time": t_i, "timecorr": tc_i,
            "cadenceno": ctx.cadenceno, "quality": ctx.quality,
            "flux": flux[i], "flux_err": ferr[i], "flux_background": fbkg[i],
            "pos_centroid": cent[i], "pos_corr": jit_all[:, i, :],
            "shenanigans_any": shen[i],
        }
        details.update({
            "mean_flux": float(metrics["mean_flux"][i]),
            "variance": float(metrics["variance"][i]),
            "rms_hour": float(metrics["rms_hour"][i]),
            "ptp": float(metrics["ptp"][i]),
            "variability": float(metrics["variability"][i]),
            "pos_centroid": metrics["pos_centroid"][i].tolist(),
            "mask_size": int(mask_stamp.sum()),
            "stamp_resizes": t["resizes"],
            "stamp": tuple(s),
        })
        # edge flux of the final mask (BasePhotometry.py:1397-1405):
        edge_m = np.zeros_like(mask_stamp, bool)
        edge_m[:, (0, -1)] = True
        edge_m[(0, -1), 1:-1] = True
        details["edge_flux"] = float(np.nansum(sum_stamp[mask_stamp & edge_m]))

        # Stamp WCS (CRPIX shifted to the stamp):
        stamp_wcs = None
        if ctx.wcs is not None:
            stamp_wcs = ctx.wcs.copy()
            if ctx.datasource == "ffi":
                stamp_wcs.crpix = stamp_wcs.crpix - np.array([s[2], s[0]])

        if np.all(np.isnan(flux[i])):
            status = STATUS.ERROR
            details.setdefault("errors", []).append("Final lightcurve fluxes are all NaNs")

        results[t["starid"]] = TargetResult(
            starid=t["starid"], method="aperture", status=status,
            sector=ctx.sector, camera=ctx.camera, ccd=ctx.ccd,
            cadence=ctx.cadence, data_rel=ctx.data_rel,
            target=tgt, lightcurve=lc, mask=mask_stamp,
            aperture_image=aperture, sumimage_stamp=sum_stamp,
            stamp=tuple(s), details=details, additional_headers=add_headers,
            skip_targets=skip_targets, num_frm=ctx.num_frm,
            n_readout=ctx.n_readout, ticver=ctx.catalog.settings.ticver,
            stamp_wcs=stamp_wcs)

    # Error-status targets get a stub result:
    for t in targets:
        if results[t["starid"]] is None:
            results[t["starid"]] = TargetResult(
                starid=t["starid"], method="aperture",
                status=t["status"] or STATUS.ERROR,
                sector=ctx.sector, camera=ctx.camera, ccd=ctx.ccd,
                cadence=ctx.cadence, data_rel=ctx.data_rel,
                target=t["target"], lightcurve={}, details=t["details"],
                num_frm=ctx.num_frm, n_readout=ctx.n_readout,
                ticver=ctx.catalog.settings.ticver)

    return [results[s] for s in starids]
