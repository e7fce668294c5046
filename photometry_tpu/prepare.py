"""
Prepare stage: FFI FITS files -> one array-first image cube per sector-CCD.

Behavioral counterpart of reference photometry/prepare.py:79-706, re-designed
for TPU execution:

- backgrounds for a whole chunk of frames are fit in ONE vmapped+jitted
  device program (ops.background) instead of a multiprocessing Pool
  (prepare.py:184-199);
- background time-smoothing is a vectorised moving nanmean over the chunked
  time axis with halo overlap (the reference's statistic, prepare.py:309-338);
- the Background-Shenanigans detector (median-filtered residual vs a robust
  mean image, threshold 40 e-/s; prepare.py:514-622) runs as batched device
  median filters;
- per-frame WCS solutions are round-trip validated and the reference frame
  is the quality-good frame nearest the sector reference time
  (prepare.py:661-676);
- quality flags are transferred from up to 5 TPFs (prepare.py:629-654);
- optional translation movement kernels via batched ECC registration
  (prepare.py:678-698).

The stage is resumable at stage granularity via ImageCube stage markers
(the reference resumes per-frame; with batched device compute, stages are
fast enough that stage-level resume is the better tradeoff).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import numpy as np

from .catalog import catalog_filename
from .fixes import time_offset
from .io import discovery
from .io.cube import ImageCube, cube_filename
from .io.loader import iter_frames
from .io.settings import sector_info
from .io.tess import read_ffi
from .core.pixelflags import manual_exclude_mask, shenanigans_residual
from .quality import PixelQualityFlags, TESSQualityFlags
from .ops.background import estimate_background

logger = logging.getLogger(__name__)

__all__ = ["prepare_photometry", "prepare_one", "quality_from_tpf"]


def quality_from_tpf(tpffile: str, time_start, time_end) -> np.ndarray:
    """Transfer FFI-relevant quality flags from one TPF to FFI time bins."""
    from .io.tess import read_tpf
    tpf = read_tpf(tpffile)
    t = tpf.time - tpf.timecorr
    q = tpf.quality
    n = len(time_start)
    out = np.zeros(n, np.int32)
    order = np.argsort(t)
    t = t[order]
    q = q[order]
    lo = np.searchsorted(t, time_start, side="right")
    hi = np.searchsorted(t, time_end, side="left")
    for k in range(n):
        if hi[k] > lo[k]:
            out[k] = np.bitwise_or.reduce(q[lo[k]:hi[k]])
    return out & TESSQualityFlags.FFI_RELEVANT_BITMASK


def _catalog_source_mask(input_folder: str, sector: int, camera: int,
                         ccd: int, shape, wcs,
                         tmag_limit: float = 15.0) -> Optional[np.ndarray]:
    """Boolean (H, W) mask of catalog-star footprints, True = exclude.

    The reference's background fit excludes only pixels above flux_cutoff
    (backgrounds.py:98-101), leaving bright-star PSF wings inside the
    SExtractor-mode tiles; the wing-inflated tile means bias the mode
    2.5*median-1.5*mean LOW by up to ~1.5 e-/s near tmag<10 stars (round-3
    sim measurement), which can flood the K2P2 masks of faint neighbours.
    Masking known catalog sources with a brightness-scaled radius (standard
    source-masking practice) removes the bias; over-masked tiles are bridged
    by the mesh's NaN-tile interpolation.  Returns None when no catalog or
    usable WCS is available (behavior then matches the reference).
    """
    cats = discovery.find_catalog_files(input_folder, sector=sector,
                                        camera=camera, ccd=ccd)
    if not cats or wcs is None:
        return None
    import contextlib
    import sqlite3
    try:
        with contextlib.closing(sqlite3.connect(
                "file:%s?mode=ro" % cats[0], uri=True)) as conn:
            rows = conn.execute(
                "SELECT ra, decl, tmag FROM catalog WHERE tmag < ?",
                (tmag_limit,)).fetchall()
    except sqlite3.Error:  # pragma: no cover - malformed/locked catalog
        return None
    if not rows:
        return None
    arr = np.asarray(rows, np.float64)
    row, col = wcs.rowcol_of_radec(arr[:, 0], arr[:, 1])
    tmag = arr[:, 2]
    # Exclusion radius ~ wing extent: grows with log-flux, 1.5-16 px.
    flux = np.maximum(10.0 ** (-0.4 * (tmag - 20.54)), 10.0)
    rad = np.clip(1.5 * np.sqrt(np.log10(flux)), 1.5, 16.0)
    H, W = shape
    mask = np.zeros((H, W), bool)
    for r0, c0, rr in zip(row, col, rad):
        if not (np.isfinite(r0) and np.isfinite(c0)):
            continue
        if r0 < -rr or r0 > H - 1 + rr or c0 < -rr or c0 > W - 1 + rr:
            continue
        y0, y1 = max(0, int(r0 - rr)), min(H, int(r0 + rr) + 2)
        x0, x1 = max(0, int(c0 - rr)), min(W, int(c0 + rr) + 2)
        yy, xx = np.ogrid[y0:y1, x0:x1]
        mask[y0:y1, x0:x1] |= ((yy - r0) ** 2 + (xx - c0) ** 2) < rr * rr
    return mask


def _smooth_backgrounds_in_place(cube, window: int, chunk: int) -> None:
    """Time-smooth the cube's raw backgrounds dataset in place, streamed.

    Moving nanmean with shrinking edge windows (reference prepare.py:309-338),
    computed per chunk with full ``window//2``-frame halos so interior
    windows are complete and the result matches smoothing the whole stack at
    once (up to blocked-cumsum f32 rounding).  The raw LEFT halo is carried
    forward in host memory because writing block k's smoothed output
    overwrites the raw frames block k+1 needs; the right halo is read from
    the not-yet-overwritten tail.  Host memory stays O(chunk*H*W).
    """
    import jax.numpy as jnp
    from .ops.filters import time_moving_nanmean
    T = cube.n_times
    H, W = cube.shape
    half = window // 2
    left = np.empty((0, H, W), np.float32)
    for t0 in range(0, T, chunk):
        t1 = min(t0 + chunk, T)
        mid = cube.backgrounds(t0, t1)
        right = (cube.backgrounds(t1, min(T, t1 + half))
                 if t1 < T and half > 0 else mid[:0])
        blk = np.concatenate([left, mid, right], axis=0)
        sm = np.asarray(time_moving_nanmean(jnp.asarray(blk), window))
        off = left.shape[0]
        cube.write_block("backgrounds", t0, sm[off:off + (t1 - t0)])
        carry = np.concatenate([left, mid], axis=0)
        left = carry[-half:] if half > 0 else carry[:0]


def _wcs_roundtrip_ok(wcs, shape) -> bool:
    """Validate a WCS by projecting a corner out and back (prepare.py:433-447)."""
    if wcs is None:
        return False
    try:
        ra, dec = wcs.pixel_to_world(np.array([1.0]), np.array([1.0]))
        x, y = wcs.world_to_pixel(ra, dec)
        return bool(np.isfinite(x[0]) and np.isfinite(y[0])
                    and abs(x[0] - 1.0) < 0.1 and abs(y[0] - 1.0) < 0.1)
    except Exception:
        return False


def prepare_one(input_folder: str, sector: int, camera: int, ccd: int,
                output_folder: Optional[str] = None,
                calc_movement_kernel: bool = False,
                chunk: int = 64, backgrounds_pixels_threshold: float = 0.5,
                bkgshe_threshold: float = 40.0,
                flux_cutoff: float = 8e4, tile: Optional[int] = None) -> str:
    """Prepare one (sector, camera, ccd) into an image cube file.

    Returns the path of the cube file.
    """
    output_folder = output_folder or input_folder
    files = discovery.find_ffi_files(input_folder, sector=sector, camera=camera, ccd=ccd)
    if not files:
        raise FileNotFoundError(f"No FFI files for sector={sector}, camera={camera}, ccd={ccd}")
    T = len(files)
    cadence = sector_info(sector).ffi_cadence
    time_smooth = {1800: 3, 600: 9, 200: 27}.get(cadence, 3)

    first = read_ffi(files[0])
    H, W = first.data.shape
    hdr0 = first.header
    header = {
        "SECTOR": sector, "CAMERA": camera, "CCD": ccd, "CADENCE": cadence,
        "DATA_REL": hdr0.get("DATA_REL", 99),
        "PROCVER": hdr0.get("PROCVER", ""),
        "NUM_FRM": hdr0.get("NUM_FRM", 900),
        "READNOIS": hdr0.get("READNOIS", 10.0),
        "GAIN": hdr0.get("GAIN", 5.2),
        "NREADOUT": hdr0.get("NREADOUT", 0),
        # PSF width hint for the analytic-Gaussian PRF fallback and the
        # crowding metrics (models/psf_common.context_prf); absent on SPOC
        # flight FFIs (whose calibrated PRF .mat tables are used instead):
        "PSFSIGMA": hdr0.get("PSFSIGMA"),
        "PIXEL_OFFSET_ROW": 0,
        "PIXEL_OFFSET_COLUMN": 44 if first.is_tess else 0,
    }
    path = os.path.join(output_folder, cube_filename(sector, camera, ccd))
    os.makedirs(output_folder, exist_ok=True)
    cube = ImageCube.create(path, T, (H, W), header=header)

    radius_image = None
    if camera is not None and ccd is not None:
        # Real-TESS science frames carry the +44 column offset; simulated /
        # cropped frames are already in science coordinates.  Supplying the
        # radius image even for non-flight (SIMTESS) frames lets
        # estimate_background engage its radial glow model — including the
        # small-frame corner-ring fallback on sub-CCD frames, where the tile
        # mesh alone undershoots a steep glow corner by tens of e-/s.
        from .ops.background import radial_coordinates
        radius_image = radial_coordinates(
            (H, W), camera, ccd, col_offset=44 if first.is_tess else 0)
    if tile is None:
        # 64 px tiles on full CCDs (photutils parity); keep a mesh of at
        # least ~6x6 tiles on smaller (test/simulated) frames.
        tile = int(min(64, max(8, min(H, W) // 6)))

    # Known catalog sources are excluded from the background fit (see
    # _catalog_source_mask); static across the chunk loop.
    source_mask = _catalog_source_mask(
        input_folder, sector, camera, ccd, (H, W),
        first.wcs if _wcs_roundtrip_ok(first.wcs, (H, W)) else None)
    if source_mask is not None:
        logger.info("Masking %.1f%% of pixels as catalog sources for the "
                    "background fit.", 100.0 * source_mask.mean())

    # ------------------------------------------------------------------
    # Stage 1: backgrounds (batched on device) + NotUsedForBackground flags
    # ------------------------------------------------------------------
    if not cube.is_done("backgrounds"):
        logger.info("Fitting backgrounds for %d frames...", T)
        # Host memory is bounded at O(chunk*H*W): raw per-chunk fits stream
        # straight into the cube's backgrounds dataset, and the time
        # smoothing pass below rewrites it in place from halo'd read-backs
        # (the reference holds the full stack in a multiprocessing result
        # list, prepare.py:184-199 — ~21 GB at T~1300 on a 2048^2 CCD).
        frames = iter_frames(files)
        for t0 in range(0, T, chunk):
            t1 = min(t0 + chunk, T)
            stack = np.empty((t1 - t0, H, W), np.float32)
            manex = np.zeros((t1 - t0, H, W), bool)
            for i in range(t1 - t0):
                frame = next(frames)
                stack[i] = frame.data
                manex[i] = manual_exclude_mask(frame.data, frame.header, frame.is_tess)
            exclude = manex if source_mask is None else (manex | source_mask)
            bkg, mask_used = estimate_background(
                stack, mask=exclude, flux_cutoff=flux_cutoff,
                radius_image=radius_image, tile=tile)
            cube.write_block("backgrounds", t0, np.asarray(bkg))
            flags = np.where(np.asarray(mask_used),
                             PixelQualityFlags.NotUsedForBackground, 0).astype(np.uint8)
            flags |= np.where(manex, PixelQualityFlags.ManualExclude, 0).astype(np.uint8)
            cube.write_block("pixelflags", t0, flags)
        # Smooth over the time axis (window 3 @1800s / 9 @600s) with the
        # framework's device moving-window kernel, streamed in place:
        logger.info("Smoothing backgrounds in time (window %d)...", time_smooth)
        _smooth_backgrounds_in_place(cube, time_smooth, chunk)
        cube.attrs["time_smooth"] = time_smooth
        cube.attrs["bkgshe_threshold"] = bkgshe_threshold
        cube.mark_done("backgrounds")

    # ------------------------------------------------------------------
    # Stage 2: images, vectors, WCS, sumimage
    # ------------------------------------------------------------------
    if not cube.is_done("images"):
        logger.info("Processing individual images...")
        time = np.empty(T, np.float64)
        timecorr = np.empty(T, np.float32)
        time_start = np.empty(T, np.float64)
        time_stop = np.empty(T, np.float64)
        cadenceno = np.empty(T, np.int32)
        quality = np.zeros(T, np.int32)
        sumimage = np.zeros((H, W), np.float64)
        n_img = np.zeros((H, W), np.int32)
        used_in_bkg = np.zeros((H, W), np.int64)

        frames = iter_frames(files)
        for t0 in range(0, T, chunk):
            t1 = min(t0 + chunk, T)
            bkg = cube.backgrounds(t0, t1)
            flags = cube.pixelflags(t0, t1)
            for i, k in enumerate(range(t0, t1)):
                frame = next(frames)
                hdr = frame.header
                time_start[k] = hdr["TSTART"]
                time_stop[k] = hdr["TSTOP"]
                time[k] = 0.5 * (hdr["TSTART"] + hdr["TSTOP"])
                timecorr[k] = hdr.get("BARYCORR", 0)
                quality[k] = hdr.get("DQUALITY", hdr.get("QUAL_BIT", 0))
                if "FFIINDEX" in hdr:
                    cadenceno[k] = hdr["FFIINDEX"]
                elif frame.is_tess:
                    raise RuntimeError("Could not determine CADENCENO for TESS data")
                else:
                    cadenceno[k] = k + 1

                flux = frame.data.astype(np.float32)
                err = (frame.uncertainty if frame.uncertainty is not None
                       else np.sqrt(np.abs(flux))).astype(np.float32)
                if not hdr.get("BACKAPP", False):
                    flux = flux - bkg[i]
                excl = ~PixelQualityFlags.filter(flags[i])
                flux[excl] = np.nan
                err[excl] = np.nan

                wcs_str = ""
                if frame.wcs is not None and _wcs_roundtrip_ok(frame.wcs, (H, W)):
                    wcs_str = frame.wcs.to_header().to_bytes().decode("ascii")
                cube.write_frame(k, image=flux, image_err=err, wcs_str=wcs_str)

                if TESSQualityFlags.filter(quality[k]):
                    finite = np.isfinite(flux)
                    n_img += finite
                    sumimage += np.where(finite, flux, 0.0)
                used_in_bkg += (flags[i] & PixelQualityFlags.NotUsedForBackground) == 0

        with np.errstate(invalid="ignore"):
            sumimage /= n_img

        # Time-offset fixes (early data releases):
        attributes = {"DATA_REL": header["DATA_REL"], "PROCVER": header["PROCVER"] or None,
                      "CAMERA": camera, "CCD": ccd}
        time_start = time_offset(time_start, attributes, datatype="ffi", timepos="start")
        time_stop = time_offset(time_stop, attributes, datatype="ffi", timepos="end")
        time, fixed_offset = time_offset(time, attributes, datatype="ffi",
                                         timepos="mid", return_flag=True)
        cube.attrs["TIME_OFFSET_CORRECTED"] = fixed_offset

        cube.write_vectors(time=time, timecorr=timecorr, cadenceno=cadenceno,
                           quality=quality)
        # delete-before-create so a crash between dataset creation and
        # mark_done("images") stays resumable (stage 6 pattern):
        for ds_name, ds_data in (("time_start", time_start),
                                 ("time_stop", time_stop)):
            if ds_name in cube.h5:
                del cube.h5[ds_name]
            cube.h5.create_dataset(ds_name, data=ds_data)
        cube.write_sumimage(np.asarray(sumimage),
                            pixels_used=(used_in_bkg / T > backgrounds_pixels_threshold))
        cube.mark_done("images")

    # ------------------------------------------------------------------
    # Stage 3: Background Shenanigans
    # ------------------------------------------------------------------
    if not cube.is_done("shenanigans"):
        logger.info("Detecting background shenanigans...")
        sumimage = cube.sumimage.astype(np.float32)
        # The residual stack is needed twice (robust-mean pass over shuffled
        # 25-frame blocks, then the flagging pass), so it spills to a
        # transient scratch dataset in the cube file instead of host RAM
        # (~21 GB at full-CCD scale); the median filter runs once per frame.
        if "_scratch_resid" in cube.h5:
            del cube.h5["_scratch_resid"]
        scratch = cube.h5.create_dataset(
            "_scratch_resid", shape=(T, H, W), dtype="f4",
            chunks=(1, min(H, 512), min(W, 512)),
            compression="lzf", shuffle=True)
        for t0 in range(0, T, chunk):
            t1 = min(t0 + chunk, T)
            imgs = np.nan_to_num(cube.images(t0, t1))
            scratch[t0:t1] = shenanigans_residual(imgs, sumimage)
        # Robust mean: mean of medians over shuffled blocks of 25
        # (prepare.py:549-573):
        block = 25
        rng = np.random.default_rng(0)
        order = rng.permutation(T)
        mean_she = np.zeros((H, W), np.float64)
        nblocks = 0
        for k in range(0, T, block):
            idx = np.sort(order[k:k + block])  # h5py wants increasing indices
            med = np.nanmedian(scratch[idx], axis=0)
            mean_she += np.nan_to_num(med)
            nblocks += 1
        mean_she /= max(nblocks, 1)

        for t0 in range(0, T, chunk):
            t1 = min(t0 + chunk, T)
            flags = cube.pixelflags(t0, t1)
            she = np.abs(scratch[t0:t1] - mean_she[None]) > bkgshe_threshold
            flags = (flags & ~np.uint8(PixelQualityFlags.BackgroundShenanigans))
            flags |= np.where(she, PixelQualityFlags.BackgroundShenanigans, 0).astype(np.uint8)
            cube.write_block("pixelflags", t0, flags)
        del cube.h5["_scratch_resid"]
        cube.mark_done("shenanigans")

    # ------------------------------------------------------------------
    # Stage 4: quality transfer from TPFs
    # ------------------------------------------------------------------
    if not cube.is_done("quality_tpf"):
        tpffiles = discovery.find_tpf_files(input_folder, sector=sector,
                                            camera=camera, ccd=ccd, findmax=5)
        if tpffiles:
            quality = cube.quality.copy()
            timecorr = cube.timecorr
            time_start = np.asarray(cube.h5["time_start"])
            time_stop = np.asarray(cube.h5["time_stop"])
            q_tpf = np.zeros(T, np.int32)
            for f in tpffiles:
                q_tpf |= quality_from_tpf(f, time_start - timecorr, time_stop - timecorr)
            quality |= q_tpf
            cube.write_vectors(quality=quality)
        else:
            logger.warning("No TPF files found; quality flags not propagated.")
        cube.mark_done("quality_tpf")

    # ------------------------------------------------------------------
    # Stage 5: WCS reference frame
    # ------------------------------------------------------------------
    if not cube.is_done("wcs_ref"):
        ref_tjd = sector_info(sector).reference_time - 2457000
        time = cube.time
        quality = cube.quality
        wcs_ok = np.array([bool(s.strip()) for s in cube.wcs_strings()])
        good = (quality == 0) & wcs_ok
        if not np.any(good):
            raise RuntimeError("No good frames for WCS reference")
        cand = np.where(good)[0]
        refindx = int(cand[np.argmin(np.abs(time[cand] - ref_tjd))])
        cube.attrs["WCS_REF_FRAME"] = refindx
        cube.mark_done("wcs_ref")

    # ------------------------------------------------------------------
    # Stage 6: optional movement kernels (batched ECC)
    # ------------------------------------------------------------------
    if calc_movement_kernel and not cube.is_done("movement"):
        logger.info("Calculating image movement kernels (batched ECC)...")
        from .core.motion import MotionModel
        refindx = int(cube.attrs["WCS_REF_FRAME"])
        ref_img = np.nan_to_num(cube.images(refindx, refindx + 1)[0])
        mm = MotionModel(warpmode="translation", image_ref=ref_img)
        kernels = np.empty((T, mm.n_params), np.float64)
        for t0 in range(0, T, chunk):
            t1 = min(t0 + chunk, T)
            imgs = np.nan_to_num(cube.images(t0, t1))
            kernels[t0:t1] = mm.calc_kernels_batch(imgs)
        if "movement_kernel" in cube.h5:
            del cube.h5["movement_kernel"]
        dset = cube.h5.create_dataset("movement_kernel", data=kernels)
        dset.attrs["warpmode"] = "translation"
        dset.attrs["ref_frame"] = refindx
        cube.mark_done("movement")

    cube.flush()
    cube.close()
    logger.info("Prepared %s", path)
    return path


def prepare_photometry(input_folder: str, output_folder: Optional[str] = None,
                       sectors=None, cameras=None, ccds=None,
                       process_id: Optional[int] = None,
                       process_count: Optional[int] = None, **kw) -> list:
    """Prepare all discovered (sector, camera, ccd) combinations.

    Counterpart of reference prepare.py:79-206 (discovery + loop); each
    combination runs :func:`prepare_one`.

    Multi-host fleets split the CCD list statically: pass
    ``process_id``/``process_count`` explicitly, or initialize
    ``parallel.multihost`` first and every host takes its round-robin
    shard automatically (CCD cubes are independent, share-nothing work —
    the same split the reference leaves to manual per-rank invocation).
    """
    combos = set()
    for f in discovery.find_ffi_files(input_folder):
        info = discovery.parse_ffi_filename(f)
        if sectors is not None and info["sector"] not in np.atleast_1d(sectors):
            continue
        if cameras is not None and info["camera"] not in np.atleast_1d(cameras):
            continue
        if ccds is not None and info["ccd"] not in np.atleast_1d(ccds):
            continue
        combos.add((info["sector"], info["camera"], info["ccd"]))
    combos = sorted(combos)
    from .parallel import multihost
    if process_count is not None or process_id is not None:
        if process_count is None or process_id is None:
            raise ValueError("process_id and process_count must be given together")
        combos = multihost.process_shard(combos, process_id, process_count)
    elif multihost.is_initialized():
        combos = multihost.process_shard(combos)
    out = []
    for sector, camera, ccd in combos:
        out.append(prepare_one(input_folder, sector, camera, ccd,
                               output_folder=output_folder, **kw))
    return out
