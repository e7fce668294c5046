"""
Image-motion (pointing jitter) model.

Behavioral counterpart of reference photometry/image_motion.py
(ImageMovementKernel): warp modes ``unchanged/translation/euclidian/affine``
estimated per frame by ECC registration, or ``wcs`` mode where each frame
carries its own WCS solution and jitter is the WCS-to-WCS pixel displacement
(image_motion.py:113-179).

TPU re-design: the per-(star, timestamp) Python loops (``jitter`` at
image_motion.py:403-421) become one vectorised evaluation: kernels for all
frames are stacked into device arrays, interpolation in time is a
searchsorted + lerp, and the warp application is closed-form arithmetic on
(T, N) grids — usable inside the jitted extraction program.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.registration import ecc_align, prepare_flux, N_PARAMS

__all__ = ["MotionModel"]


def _apply_kernel_batch(params, mode: str, cols, rows):
    """Displacements for kernels (T, P) applied to positions (N,).

    Returns (T, N, 2) array of (dcol, drow) following the reference
    convention that apply_kernel receives xy=(column, row) pairs
    (image_motion.py:128-178).
    """
    cols = jnp.asarray(cols)
    rows = jnp.asarray(rows)
    if mode == "unchanged":
        T = params.shape[0]
        return jnp.zeros((T, cols.shape[0], 2), jnp.float32)
    if mode == "translation":
        dx = params[:, 0][:, None]
        dy = params[:, 1][:, None]
        z = jnp.broadcast_to(dx, (params.shape[0], cols.shape[0]))
        w = jnp.broadcast_to(dy, (params.shape[0], cols.shape[0]))
        return jnp.stack([z, w], axis=-1)
    if mode == "euclidian":
        dx = params[:, 0][:, None]
        dy = params[:, 1][:, None]
        th = params[:, 2][:, None]
        c, s = jnp.cos(th), jnp.sin(th)
        x = cols[None, :]
        y = rows[None, :]
        nx = c * x - s * y + dx
        ny = s * x + c * y + dy
        return jnp.stack([nx - x, ny - y], axis=-1)
    if mode == "affine":
        M = params.reshape(-1, 2, 3)
        x = cols[None, :]
        y = rows[None, :]
        nx = M[:, 0, 0, None] * x + M[:, 0, 1, None] * y + M[:, 0, 2, None]
        ny = M[:, 1, 0, None] * x + M[:, 1, 1, None] * y + M[:, 1, 2, None]
        return jnp.stack([nx - x, ny - y], axis=-1)
    raise ValueError(f"Invalid warpmode: {mode}")


class MotionModel:
    """Per-sector pointing-jitter model, evaluated in batch on device."""

    def __init__(self, warpmode: str = "euclidian", image_ref=None, wcs_ref=None):
        if warpmode not in ("wcs", "unchanged", "translation", "euclidian", "affine"):
            raise ValueError("Invalid warpmode")
        self.warpmode = warpmode
        self.n_params = N_PARAMS.get(warpmode, 1)
        self.image_ref = None if image_ref is None else prepare_flux(image_ref)
        self.wcs_ref = wcs_ref
        self.series_times: Optional[np.ndarray] = None
        self.series_kernels = None
        self._wcs_series = None

    # ------------------------------------------------------------- estimation
    def calc_kernel(self, image, n_iters: int = 50):
        """Warp parameters of one frame against the reference image."""
        if self.warpmode == "unchanged":
            return np.zeros(0)
        if self.image_ref is None:
            raise RuntimeError("Reference image not defined")
        params, _cc = ecc_align(self.image_ref, prepare_flux(image),
                                mode=self.warpmode, n_iters=n_iters)
        return np.asarray(params, np.float64)

    def calc_kernels_batch(self, images, n_iters: int = 50) -> np.ndarray:
        """Warp parameters for a whole (T, H, W) stack — one vmapped program."""
        if self.warpmode == "unchanged":
            return np.zeros((len(images), 0))
        if self.image_ref is None:
            raise RuntimeError("Reference image not defined")
        prep = jax.vmap(prepare_flux)(jnp.asarray(images, jnp.float32))
        fn = jax.vmap(lambda im: ecc_align(self.image_ref, im,
                                           mode=self.warpmode, n_iters=n_iters)[0])
        return np.asarray(fn(prep), np.float64)

    # ------------------------------------------------------------ time series
    def load_series(self, times, kernels):
        """Load a kernel time-series for interpolation.

        For ``wcs`` mode, ``kernels`` is a sequence of TanWCS objects or
        serialized header strings (empty strings are dropped, matching
        reference image_motion.py:283-312).
        """
        times = np.asarray(times, np.float64)
        if self.warpmode == "wcs":
            from ..io.wcs import TanWCS
            from ..io.fits import Header
            series = []
            good = np.ones(len(times), bool)
            for k, kern in enumerate(kernels):
                if isinstance(kern, TanWCS):
                    series.append(kern)
                elif isinstance(kern, (str, bytes)):
                    s = kern.decode() if isinstance(kern, bytes) else kern
                    if not s.strip():
                        good[k] = False
                        series.append(None)
                        continue
                    series.append(TanWCS.from_header(Header.from_bytes(s.encode("ascii"))))
                else:
                    raise ValueError("Invalid WCS kernel")
            self.series_times = times[good]
            self._wcs_series = [s for s, g in zip(series, good) if g]
            if len(self.series_times) == 0:
                raise ValueError("No valid WCS kernels in series")
        else:
            kernels = np.atleast_2d(np.asarray(kernels, np.float64))
            if kernels.shape != (len(times), self.n_params):
                raise ValueError(
                    f"Wrong shape of kernels. Anticipated ({len(times)},{self.n_params}), "
                    f"but got {kernels.shape}")
            indx = np.isfinite(times) & np.all(np.isfinite(kernels), axis=1)
            self.series_times = times[indx]
            self.series_kernels = kernels[indx]
            if len(self.series_times) == 0:
                # fail at load like the wcs branch — otherwise the first
                # jitter_batch dies with an obscure IndexError deep in
                # extraction (review find: all-NaN ECC kernel series):
                raise ValueError("No valid (finite) kernels in series")

    # ------------------------------------------------------------- evaluation
    def jitter_batch(self, eval_times, cols, rows) -> np.ndarray:
        """Jitter (dcol, drow) for every (time, star) pair.

        Parameters:
            eval_times: (T,) timestamps to evaluate at.
            cols, rows: (N,) star positions at the reference time.

        Returns:
            (T, N, 2) float array of displacements.

        Out-of-range timestamps clamp to the first/last kernel (the reference
        allows one-cadence margins then raises; clamping is the batched
        equivalent that never poisons a whole batch for one bad timestamp).
        """
        eval_times = np.atleast_1d(np.asarray(eval_times, np.float64))
        cols = np.atleast_1d(np.asarray(cols, np.float64))
        rows = np.atleast_1d(np.asarray(rows, np.float64))

        if self.warpmode == "wcs":
            return self._jitter_wcs(eval_times, cols, rows)

        if self.warpmode == "unchanged":
            return np.zeros((len(eval_times), len(cols), 2))

        if self.series_times is None:
            raise ValueError("Interpolator is not defined.")
        st = self.series_times
        sk = self.series_kernels
        # linear interpolation with constant extrapolation:
        k = np.clip(np.searchsorted(st, eval_times, side="right") - 1, 0, len(st) - 2)
        t0 = st[k]
        t1 = st[k + 1]
        w = np.clip((eval_times - t0) / np.maximum(t1 - t0, 1e-30), 0.0, 1.0)
        params = sk[k] * (1 - w[:, None]) + sk[k + 1] * w[:, None]
        out = _apply_kernel_batch(jnp.asarray(params, jnp.float32), self.warpmode,
                                  cols, rows)
        return np.asarray(out, np.float64)

    def _wcs_displacements(self, cols, rows) -> np.ndarray:
        """(K, N, 2) displacement of each star in each WCS frame vs reference."""
        if self.wcs_ref is None:
            raise RuntimeError("Reference WCS not defined")
        ra, dec = self.wcs_ref.pixel_to_world(cols + 1.0, rows + 1.0)
        disp = np.empty((len(self._wcs_series), len(cols), 2))
        for i, w in enumerate(self._wcs_series):
            x, y = w.world_to_pixel(ra, dec)
            disp[i, :, 0] = x - 1.0 - cols
            disp[i, :, 1] = y - 1.0 - rows
        return disp

    def _jitter_wcs(self, eval_times, cols, rows) -> np.ndarray:
        disp = self._wcs_displacements(cols, rows)   # (K, N, 2)
        st = self.series_times
        if len(st) == 1:
            return np.repeat(disp, len(eval_times), axis=0)
        k = np.clip(np.searchsorted(st, eval_times, side="right") - 1, 0, len(st) - 2)
        t0 = st[k]
        t1 = st[k + 1]
        w = np.clip((eval_times - t0) / np.maximum(t1 - t0, 1e-30), 0.0, 1.0)
        return disp[k] * (1 - w[:, None, None]) + disp[k + 1] * w[:, None, None]

    def jitter(self, time, column, row) -> np.ndarray:
        """Single-star convenience (reference image_motion.py:403-421 shape)."""
        out = self.jitter_batch(time, [column], [row])
        return out[:, 0, :]
