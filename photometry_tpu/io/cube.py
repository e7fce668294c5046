"""
The sector-CCD image cube store.

This replaces the reference's per-frame HDF5 layout (``images/0004`` datasets,
photometry/prepare.py:136-148 and the N-reads-per-stamp access pattern of
BasePhotometry.py:720-751) with an array-first design: one contiguous
``(T, H, W)`` dataset per quantity, chunked for bulk sequential reads, so a
whole sector-CCD cube (or a time-shard of it) is loaded to device HBM in a
single pass and every downstream algorithm slices it *on device*.

File naming stays compatible: ``sector{s:03d}_camera{c}_ccd{d}.hdf5``.

Layout::

    /images       (T, H, W) float32, background-subtracted flux  [e-/s]
    /images_err   (T, H, W) float32
    /backgrounds  (T, H, W) float32
    /pixelflags   (T, H, W) uint8     (PixelQualityFlags bits)
    /time         (T,) float64  mid-exposure BTJD (barycentre corrected)
    /timecorr     (T,) float32  barycentric correction applied [days]
    /cadenceno    (T,) int32
    /quality      (T,) int32    (TESSQualityFlags bits)
    /sumimage     (H, W) float64  mean of quality-good frames
    /bkg_pixels_used (H, W) uint8
    /wcs          (T,) variable-length str (serialized per-frame headers)
    attrs: SECTOR, CAMERA, CCD, DATA_REL, PROCVER, CADENCE, WCS_REF_FRAME,
           plus completion markers (see ``mark_done``/``is_done``).
"""

from __future__ import annotations

import os
from typing import Optional

import h5py
import numpy as np

__all__ = ["ImageCube", "cube_filename"]


def cube_filename(sector: int, camera: int, ccd: int) -> str:
    return f"sector{sector:03d}_camera{camera:d}_ccd{ccd:d}.hdf5"


def _chunks(n_times: int, shape) -> tuple:
    return (min(n_times, 8), min(shape[0], 128), min(shape[1], 128))


class ImageCube:
    """Create/read one sector-CCD cube file.

    Writing is resumable: each pipeline stage calls :meth:`mark_done` when it
    finishes, and re-runs skip completed stages (counterpart of the
    existence checks at reference prepare.py:265,289,347,515,630).
    """

    def __init__(self, path: str, mode: str = "r"):
        self.path = path
        self.h5 = h5py.File(path, mode)

    # -- lifecycle -----------------------------------------------------------
    @classmethod
    def create(cls, path: str, n_times: int, shape, header: Optional[dict] = None,
               overwrite: bool = False) -> "ImageCube":
        if os.path.exists(path) and not overwrite:
            cube = None
            try:
                cube = cls(path, "r+")
                if cube.n_times != n_times or cube.shape != tuple(shape):
                    raise ValueError(f"Existing cube {path} has incompatible shape")
                return cube
            except ValueError:
                if cube is not None:
                    cube.close()   # don't leak a write-locked handle
                raise
            except (OSError, KeyError) as exc:
                # Distinguish "file locked by a concurrent reader" from a
                # truncated/corrupt file left by a killed run: deleting a
                # LOCKED cube would destroy a fully prepared sector that
                # another process is actively using.  h5py lock failures
                # carry 'unable to lock'/'file is already open' wording.
                msg = str(exc).lower()
                if "lock" in msg or "already open" in msg:
                    raise
                # Truncated/corrupt file from a killed run — recreate it.
                # (Crash recovery is restart-based, like the reference's
                # STARTED-reset semantics; a corrupt cube must never wedge
                # the pipeline.)
                os.remove(path)
        cube = cls(path, "w")
        h5 = cube.h5
        comp = dict(compression="lzf", shuffle=True)
        ch = _chunks(n_times, shape)
        for name in ("images", "images_err", "backgrounds"):
            h5.create_dataset(name, shape=(n_times,) + tuple(shape), dtype="f4",
                              chunks=ch, **comp)
        h5.create_dataset("pixelflags", shape=(n_times,) + tuple(shape), dtype="u1",
                          chunks=ch, **comp)
        h5.create_dataset("time", shape=(n_times,), dtype="f8")
        h5.create_dataset("timecorr", shape=(n_times,), dtype="f4")
        h5.create_dataset("cadenceno", shape=(n_times,), dtype="i4")
        h5.create_dataset("quality", shape=(n_times,), dtype="i4")
        h5.create_dataset("sumimage", shape=tuple(shape), dtype="f8")
        h5.create_dataset("bkg_pixels_used", shape=tuple(shape), dtype="u1")
        h5.create_dataset("wcs", shape=(n_times,), dtype=h5py.string_dtype())
        if header:
            for k, v in header.items():
                if v is not None:
                    h5.attrs[k] = v
        h5.attrs["_stages_done"] = ""
        return cube

    def close(self):
        if self.h5:
            self.h5.close()
            self.h5 = None

    def flush(self):
        self.h5.flush()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- resumability ---------------------------------------------------------
    def mark_done(self, stage: str):
        done = set(filter(None, str(self.h5.attrs.get("_stages_done", "")).split(",")))
        done.add(stage)
        self.h5.attrs["_stages_done"] = ",".join(sorted(done))
        self.h5.flush()

    def is_done(self, stage: str) -> bool:
        done = set(filter(None, str(self.h5.attrs.get("_stages_done", "")).split(",")))
        return stage in done

    # -- metadata -------------------------------------------------------------
    @property
    def n_times(self) -> int:
        return self.h5["time"].shape[0]

    @property
    def shape(self) -> tuple:
        return tuple(self.h5["sumimage"].shape)

    @property
    def header(self) -> dict:
        return {k: v for k, v in self.h5.attrs.items() if not k.startswith("_")}

    @property
    def attrs(self):
        return self.h5.attrs

    # -- vectors ---------------------------------------------------------------
    @property
    def time(self) -> np.ndarray:
        return np.asarray(self.h5["time"])

    @property
    def timecorr(self) -> np.ndarray:
        return np.asarray(self.h5["timecorr"])

    @property
    def cadenceno(self) -> np.ndarray:
        return np.asarray(self.h5["cadenceno"])

    @property
    def quality(self) -> np.ndarray:
        return np.asarray(self.h5["quality"])

    @property
    def sumimage(self) -> np.ndarray:
        return np.asarray(self.h5["sumimage"])

    # -- bulk reads -------------------------------------------------------------
    def images(self, t0: int = 0, t1: Optional[int] = None) -> np.ndarray:
        return np.asarray(self.h5["images"][t0:t1])

    def images_err(self, t0: int = 0, t1: Optional[int] = None) -> np.ndarray:
        return np.asarray(self.h5["images_err"][t0:t1])

    def backgrounds(self, t0: int = 0, t1: Optional[int] = None) -> np.ndarray:
        return np.asarray(self.h5["backgrounds"][t0:t1])

    def pixelflags(self, t0: int = 0, t1: Optional[int] = None) -> np.ndarray:
        return np.asarray(self.h5["pixelflags"][t0:t1])

    def wcs_strings(self) -> list:
        return [s.decode() if isinstance(s, bytes) else s for s in self.h5["wcs"][:]]

    def wcs_at(self, k: int):
        """Deserialize the WCS of frame k (stored as FITS header cards)."""
        from .fits import Header
        from .wcs import TanWCS
        s = self.h5["wcs"][k]
        s = s.decode() if isinstance(s, bytes) else s
        if not s:
            raise ValueError(f"Invalid WCS header string in cube frame {k}")
        return TanWCS.from_header(Header.from_bytes(s.encode("ascii")))

    def reference_wcs(self):
        """The WCS of the reference frame (attr WCS_REF_FRAME)."""
        return self.wcs_at(int(self.h5.attrs.get("WCS_REF_FRAME", 0)))

    # -- writes -----------------------------------------------------------------
    def write_frame(self, k: int, image=None, image_err=None, background=None,
                    pixelflags=None, wcs_str=None):
        if image is not None:
            self.h5["images"][k] = image
        if image_err is not None:
            self.h5["images_err"][k] = image_err
        if background is not None:
            self.h5["backgrounds"][k] = background
        if pixelflags is not None:
            self.h5["pixelflags"][k] = pixelflags
        if wcs_str is not None:
            self.h5["wcs"][k] = wcs_str

    def write_block(self, name: str, t0: int, block: np.ndarray):
        """Write a contiguous time-block of a (T,H,W) dataset in one call."""
        self.h5[name][t0:t0 + block.shape[0]] = block

    def write_vectors(self, time=None, timecorr=None, cadenceno=None, quality=None):
        if time is not None:
            self.h5["time"][:] = time
        if timecorr is not None:
            self.h5["timecorr"][:] = timecorr
        if cadenceno is not None:
            self.h5["cadenceno"][:] = cadenceno
        if quality is not None:
            self.h5["quality"][:] = quality

    def write_sumimage(self, sumimage, pixels_used=None):
        self.h5["sumimage"][:] = sumimage
        if pixels_used is not None:
            self.h5["bkg_pixels_used"][:] = pixels_used
