"""
TESS Pixel Response Function (PRF) model.

Behavioral counterpart of reference photometry/psf.py: loads the MATLAB
``*-characterized-prf.mat`` calibration products (per camera/ccd, two epochs),
combines the sub-PRFs by inverse distance to the stamp centre (psf.py:100-113)
and normalises (psf.py:119).

TPU re-design of evaluation: the reference integrates a bicubic spline over
every (pixel, star) pair in a triple Python loop (psf.py:122-148 — its #1 hot
spot).  Here the *pixel-integrated* PRF is precomputed ONCE on the host
(a box filter of the oversampled PRF = the exact integral over a 1x1 pixel
window as a function of star offset), and evaluation on device is a single
Catmull-Rom interpolation of that table per (pixel, star) — a gather + FMA
that vmaps over stars, pixels, frames and targets.

When no calibrated .mat files are available (they are not bundled — the
reference ships ~140 KB of MATLAB tables), :meth:`PRF.gaussian` provides an
analytic integrated-Gaussian PRF on the same machinery, which is also what
the simulator uses, making PSF-fit tests exact.
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.spline import bicubic_eval, _CRM as _CRM_NP

__all__ = ["PRF"]


class PRF:
    """Pixel Response Function for one stamp on one camera/CCD."""

    def __init__(self, iprf: np.ndarray, oversample: float, center_x: float,
                 center_y: float, info: Optional[dict] = None):
        """Low-level constructor; use :meth:`from_mat` or :meth:`gaussian`.

        Parameters:
            iprf: 2-D table of the pixel-integrated PRF (fraction of flux in
                a 1x1 pixel whose centre is offset (dx, dy) from the star).
            oversample: table samples per pixel.
            center_x, center_y: table indices of zero offset.
        """
        self.iprf = np.asarray(iprf, np.float32)
        self.oversample = float(oversample)
        self.center_x = float(center_x)
        self.center_y = float(center_y)
        self.info = info or {}
        self._iprf_dev = jnp.asarray(self.iprf)

    # ------------------------------------------------------------------ build
    @staticmethod
    def _integrate_prf_grid(prf: np.ndarray, prf_x: np.ndarray, prf_y: np.ndarray):
        """Box-filter the oversampled PRF into the pixel-integrated table."""
        from scipy.ndimage import uniform_filter
        dx = float(np.median(np.diff(prf_x)))
        dy = float(np.median(np.diff(prf_y)))
        if abs(dx - dy) > 1e-6 * max(abs(dx), abs(dy)):
            # the single `oversample` scales BOTH axes downstream
            # (pixel_fraction/_axis_values); an anisotropic table would be
            # silently stretched — fail loudly instead:
            raise ValueError(
                f"Anisotropic PRF sample grid (dx={dx:g}, dy={dy:g}) is not "
                "supported: the evaluation kernels assume one oversample "
                "factor for both axes.")
        nx = max(int(round(1.0 / dx)), 1)
        ny = max(int(round(1.0 / dy)), 1)
        # sum over a 1x1 pixel window = mean * window_size; times sample area:
        iprf = uniform_filter(prf, size=(ny, nx), mode="constant") * (nx * ny) * dx * dy
        cx = float(np.argmin(np.abs(prf_x)))
        cy = float(np.argmin(np.abs(prf_y)))
        return iprf, 1.0 / dx, cx, cy

    @classmethod
    def from_mat(cls, path_or_dir: str, sector: int, camera: int, ccd: int,
                 stamp) -> "PRF":
        """Load a calibrated TESS PRF from MATLAB files.

        ``path_or_dir`` may be a directory laid out like the reference's
        ``data/psf`` (subdirs ``start_s0001`` / ``start_s0004``) or a direct
        path to one ``.mat`` file.
        """
        from scipy.io import loadmat
        if sector < 1:
            raise ValueError("Sector number must be greater than zero")
        if camera not in (1, 2, 3, 4) or ccd not in (1, 2, 3, 4):
            raise ValueError("Camera and CCD must be 1-4.")
        if os.path.isdir(path_or_dir):
            subdir = "start_s0004" if sector >= 4 else "start_s0001"
            pattern = os.path.join(path_or_dir, subdir,
                                   f"tess*-{camera:d}-{ccd:d}-characterized-prf.mat")
            files = glob.glob(pattern)
            if not files:
                raise FileNotFoundError(f"No PRF file matching {pattern}")
            path = files[0]
        else:
            path = path_or_dir

        mat = loadmat(path)["prfStruct"]
        prf_x = np.asarray(mat["prfColumn"][0][0], np.float64).ravel()
        prf_y = np.asarray(mat["prfRow"][0][0], np.float64).ravel()
        dx = float(np.median(np.diff(prf_x)))
        dy = float(np.median(np.diff(prf_y)))

        ref_column = 0.5 * (stamp[3] + stamp[2])
        ref_row = 0.5 * (stamp[1] + stamp[0])
        minimum_prf_weight = 1e-6
        prf = np.zeros((len(prf_y), len(prf_x)), np.float64)
        n_sub = len(mat["values"][0])
        for i in range(n_sub):
            sub = np.asarray(mat["values"][0][i], np.float64)
            crval1p = float(np.squeeze(mat["ccdColumn"][0][i]))
            crval2p = float(np.squeeze(mat["ccdRow"][0][i]))
            w = max(np.hypot(ref_column - crval1p, ref_row - crval2p),
                    minimum_prf_weight)
            prf += sub / w
        prf /= np.nansum(prf) * dx * dy

        iprf, oversample, cx, cy = cls._integrate_prf_grid(prf, prf_x, prf_y)
        return cls(iprf, oversample, cx, cy,
                   info={"file": path, "sector": sector, "camera": camera,
                         "ccd": ccd, "ref_column": ref_column, "ref_row": ref_row})

    @classmethod
    def gaussian(cls, sigma: float = 1.1, oversample: int = 9,
                 radius: float = 8.0) -> "PRF":
        """Analytic integrated-Gaussian PRF (exact, no box-filter needed)."""
        from scipy.special import erf
        n = int(radius * oversample)
        offs = np.arange(-n, n + 1) / oversample
        d = np.sqrt(2) * sigma
        ex = erf((offs + 0.5) / d) - erf((offs - 0.5) / d)
        iprf = 0.25 * ex[:, None] * ex[None, :]
        return cls(iprf, oversample, n, n, info={"sigma": sigma})

    @classmethod
    def write_mat(cls, path: str, prf_grids: list, ccd_columns, ccd_rows,
                  oversample: int = 9, radius: float = 8.0):
        """Write a TESS-layout .mat PRF file (for tests / tooling).

        The calibration products are MATLAB 1xN struct *arrays* (one element
        per sub-PRF position), which is what the loader expects.
        """
        from scipy.io import savemat
        n = int(radius * oversample)
        coords = (np.arange(-n, n + 1) / oversample).reshape(-1, 1)
        N = len(prf_grids)
        dt = [("prfColumn", "O"), ("prfRow", "O"), ("values", "O"),
              ("ccdColumn", "O"), ("ccdRow", "O")]
        arr = np.zeros((1, N), dtype=dt)
        for i, g in enumerate(prf_grids):
            arr[0, i] = (coords, coords, np.asarray(g, np.float64),
                         float(ccd_columns[i]), float(ccd_rows[i]))
        savemat(path, {"prfStruct": arr})

    # --------------------------------------------------------------- evaluate
    def pixel_fraction(self, drow, dcol):
        """Fraction of a star's flux landing in a pixel offset (drow, dcol).

        Pure-JAX, arbitrary broadcastable shapes. This is the kernel
        replacing ``splineInterpolation.integral`` (reference psf.py:143-146).

        Analytic (Gaussian) PRFs evaluate with ``erf`` directly — the
        table-gather path costs a 16-point gather per evaluation, which
        dominates the LM PSF fit on TPU (gathers serialize); the erf path is
        pure element-wise FMA and also exact (the table is sampled from the
        same function).
        """
        sigma = self.info.get("sigma")
        if sigma is not None:
            from jax.scipy.special import erf
            d = jnp.float32(np.sqrt(2.0) * sigma)
            dy = jnp.asarray(drow, jnp.float32)
            dx = jnp.asarray(dcol, jnp.float32)
            ey = erf((dy + 0.5) / d) - erf((dy - 0.5) / d)
            ex = erf((dx + 0.5) / d) - erf((dx - 0.5) / d)
            return 0.25 * ey * ex
        y = jnp.asarray(drow) * self.oversample + self.center_y
        x = jnp.asarray(dcol) * self.oversample + self.center_x
        # Out-of-table offsets carry no flux:
        H, W = self.iprf.shape
        inside = (y >= 0) & (y <= H - 1) & (x >= 0) & (x <= W - 1)
        val = bicubic_eval(self._iprf_dev, jnp.clip(y, 0, H - 1), jnp.clip(x, 0, W - 1))
        return jnp.where(inside, val, 0.0)

    def _svd_factors(self, tol: float = 1e-5, max_terms: int = 24):
        """Cached separable factorisation iprf ~ sum_k U[:, k] V[:, k]^T.

        TESS PRFs are near-separable; K terms capturing singular values
        above ``tol * s_max`` reconstruct the table to interpolation-level
        accuracy.  Enables the gather-free grid render (:meth:`_render_separable`).
        """
        if not hasattr(self, "_svd_cache"):
            u, s, vt = np.linalg.svd(self.iprf, full_matrices=False)
            k = min(max(int(np.sum(s > tol * s[0])), 1), max_terms)
            # host numpy (NOT jnp): this may be first called inside a jit
            # trace, and caching traced constants leaks tracers.
            self._svd_cache = ((u[:, :k] * s[:k]).astype(np.float32),
                               vt[:k].T.astype(np.float32))
        return self._svd_cache

    def _axis_folded_table(self, F, n: int):
        """Phase-folded zero-padded factor table for the one-hot axis
        evaluation.

        ``F4[j*os + r, m, k] = Fz[m*os + r + j]`` covers every row index
        ``b + i*oversample + j`` reachable while any query is inside the
        table's domain (b clamped into that range; fully-out-of-domain
        coords are zeroed by the validity mask in :meth:`_axis_values`).
        Folding by the integer oversample phase lets the selection run as
        a (4*os,)-wide weighted one-hot matmul plus an (Lm, n) band matmul
        instead of a (4n, Lz) one-hot — the (4n, Lz) matrices dominated
        HBM traffic at LM-fit batch scale (~70 GB/iteration at
        N*T=126k, S=4).  Cached as small host arrays (tens of KB) — safe
        to embed as jit constants, and never traced (caching a traced
        ``device_put`` here leaked tracers out of scan bodies).
        """
        cache = getattr(self, "_axis_mm_cache", None)
        if cache is None:
            cache = self._axis_mm_cache = {}
        # Key on id(F) but ALSO keep F alive in the entry and verify it is
        # the same object: a freed array's id can be reused, which would
        # silently serve a stale padded table for a different PRF.
        key = (id(F), n)
        hit = cache.get(key)
        if hit is None or hit[0] is not F:
            os_ = int(round(self.oversample))
            Fh = np.asarray(F, np.float32)
            L0, K = Fh.shape
            b_lo = -(n - 1) * os_ - 1
            b_hi = L0 - 2
            # Row budget: max clamped base (b_hi - b_lo) plus the largest
            # static offset (n-1)*os + 3, plus one spare fold row:
            Lm = ((b_hi - b_lo) + (n - 1) * os_ + 4 + os_ - 1) // os_ + 1
            Fz = np.zeros((Lm * os_ + 3, K), np.float32)
            Fz[-b_lo:-b_lo + L0] = Fh
            F4 = np.stack([Fz[j:j + Lm * os_].reshape(Lm, os_, K)
                           for j in range(4)])              # (4, Lm, os, K)
            # (4*os, Lm*K) matmul layout, row index = j*os + r:
            F4 = np.ascontiguousarray(F4.transpose(0, 2, 1, 3)
                                      ).reshape(4 * os_, Lm * K)
            hit = cache[key] = (F, (b_lo, b_hi, Lm, F4))
        return hit[1]

    def _axis_values(self, F, center: float, coord, n: int,
                     with_grad: bool = False):
        """Catmull-Rom interpolation of the (L0, K) factor table at the
        arithmetic queries y_i = (i - coord)*oversample + center, i < n.

        The stride is the (integer) oversample, so all n queries share one
        fractional phase r0 = base mod os; the needed table rows are
        selected gather-free (a batched dynamic_slice lowers to a row
        gather, pathological on TPU: CLAUDE.md, ops/bandext.py use the
        same replacement) via two exact one-hot matmuls against the
        phase-folded table (:meth:`_axis_folded_table`): a (4*os,)-wide
        Catmull-Rom-weighted phase one-hot, then an (Lm, n) band one-hot
        selecting the n strided folds — ~26x less one-hot traffic than
        the earlier (4n, Lz) formulation at LM-fit batch scale.

        With ``with_grad`` also returns d(vals)/d(coord): the SAME folds
        combined with the derivative basis weights (times the
        -oversample chain factor) — analytically exact and nearly free,
        which is what makes the table-PRF LM Jacobian closed-form
        (Catmull-Rom is C^1, so the derivative is continuous across cells).
        """
        os_ = int(round(self.oversample))
        L0, K = F.shape
        y0 = (0.0 - coord) * os_ + center
        fl = jnp.floor(y0)
        b = fl.astype(jnp.int32) - 1
        t = (y0 - fl).astype(jnp.float32)
        b_lo, b_hi, Lm, F4 = self._axis_folded_table(F, n)
        idx = jnp.clip(b, b_lo, b_hi) - b_lo
        m0 = idx // os_
        r0 = idx - m0 * os_
        hi = jax.lax.Precision.HIGHEST
        wb = jnp.stack([jnp.ones_like(t), t, t * t, t * t * t]) @ _CRM_NP  # (4,)
        ohr = (jnp.arange(os_, dtype=jnp.int32) == r0).astype(jnp.float32)
        # Weighted phase one-hot: w4[j*os + r] = wb[j] * (r == r0):
        w4 = (wb[:, None] * ohr[None, :]).reshape(4 * os_)
        Bw = jnp.matmul(w4, jnp.asarray(F4), precision=hi).reshape(Lm, K)
        # Band one-hot over the folds: fold m0 + i holds query i's rows:
        ohm = (jnp.arange(Lm, dtype=jnp.int32)[:, None]
               == m0 + jnp.arange(n, dtype=jnp.int32)[None, :]
               ).astype(jnp.float32)                           # (Lm, n)
        vals = jnp.einsum("mn,mk->nk", ohm, Bw, precision=hi)
        y_i = y0 + os_ * jnp.arange(n, dtype=jnp.float32)
        valid = (y_i >= 0) & (y_i <= L0 - 1)
        vals = jnp.where(valid[:, None], vals, 0.0)
        if not with_grad:
            return vals
        zero = jnp.zeros_like(t)
        dwb = jnp.stack([zero, jnp.ones_like(t), 2 * t, 3 * t * t]) @ _CRM_NP
        dw4 = (dwb[:, None] * ohr[None, :]).reshape(4 * os_)
        dBw = jnp.matmul(dw4, jnp.asarray(F4), precision=hi).reshape(Lm, K)
        dvals = jnp.einsum("mn,mk->nk", ohm, dBw,
                           precision=hi) * jnp.float32(-os_)
        return vals, jnp.where(valid[:, None], dvals, 0.0)

    def _render_separable(self, params, shape, cutoff_radius):
        """(S, 3) stars -> (h, w) image via the SVD-separable table render."""
        U, V = self._svd_factors()
        h, w = shape
        params = jnp.atleast_2d(jnp.asarray(params))

        hi = jax.lax.Precision.HIGHEST

        def one_star(p):
            u = self._axis_values(U, self.center_y, p[0], h)   # (h, K)
            v = self._axis_values(V, self.center_x, p[1], w)   # (w, K)
            # HIGHEST: the TPU default lowers f32 dots to one bf16 MXU
            # pass (~1e-2 relative error in the rendered PRF — enough to
            # blow up an iterated GN fit; see psf_fit.normal_eq):
            img = jnp.matmul(u, v.T, precision=hi)              # (h, w)
            if cutoff_radius is not None:
                rr = jnp.arange(h, dtype=jnp.float32)[:, None] - p[0]
                cc = jnp.arange(w, dtype=jnp.float32)[None, :] - p[1]
                img = jnp.where(rr * rr + cc * cc < cutoff_radius ** 2, img, 0.0)
            return img * p[2]

        return jnp.sum(jax.vmap(one_star)(params), axis=0)

    def render_separable_with_grads(self, rows, cols, shape, cutoff_radius):
        """Per-star unit-flux table renders + position derivatives.

        Returns ``(q, q_row, q_col)``, each (S, h, w): the unit-flux PRF
        image of each star and its analytic derivatives w.r.t. the star's
        row/column — closed-form via the Catmull-Rom derivative weights on
        the shared axis slices (:meth:`_axis_values` ``with_grad``).  Lets
        the PSF LM fit build its Jacobian in one pass instead of 3S
        ``jacfwd`` forward renders (models/psf_fit.py), the same speedup
        the analytic-Gaussian path gets from ``pixel_fraction_grads``.
        """
        U, V = self._svd_factors()
        h, w = shape

        hi = jax.lax.Precision.HIGHEST

        def one_star(r0, c0):
            u, du = self._axis_values(U, self.center_y, r0, h, with_grad=True)
            v, dv = self._axis_values(V, self.center_x, c0, w, with_grad=True)
            # HIGHEST: bf16 MXU default corrupts the LM fit on TPU
            # (pre-round-4 regression: 74% of fitted params off >0.01 px
            # vs CPU, 0.4% NaN from non-PSD normal equations):
            q = jnp.matmul(u, v.T, precision=hi)
            qr = jnp.matmul(du, v.T, precision=hi)
            qc = jnp.matmul(u, dv.T, precision=hi)
            if cutoff_radius is not None:
                rr = jnp.arange(h, dtype=jnp.float32)[:, None] - r0
                cc = jnp.arange(w, dtype=jnp.float32)[None, :] - c0
                cut = rr * rr + cc * cc < cutoff_radius ** 2
                q = jnp.where(cut, q, 0.0)
                qr = jnp.where(cut, qr, 0.0)
                qc = jnp.where(cut, qc, 0.0)
            return q, qr, qc

        return jax.vmap(one_star)(jnp.asarray(rows, jnp.float32),
                                  jnp.asarray(cols, jnp.float32))

    @property
    def _grid_separable(self) -> bool:
        return (self.info.get("sigma") is None
                and abs(self.oversample - round(self.oversample)) < 1e-9)

    @property
    def has_analytic_grads(self) -> bool:
        """True when :meth:`pixel_fraction_grads` has a closed form (the
        analytic-Gaussian PRF); table PRFs differentiate via autodiff."""
        return self.info.get("sigma") is not None

    def pixel_fraction_grads(self, drow, dcol):
        """(q, dq/ddrow, dq/ddcol) for the analytic-Gaussian PRF.

        Closed-form derivatives of the erf-product pixel integral — the LM
        PSF fit builds its Jacobian from these in ONE pass instead of 3S
        jacfwd forward renders (models/psf_fit.py).
        """
        sigma = self.info.get("sigma")
        if sigma is None:
            raise NotImplementedError("analytic grads need a Gaussian PRF")
        from jax.scipy.special import erf
        d = jnp.float32(np.sqrt(2.0) * sigma)
        c = jnp.float32(2.0 / (np.sqrt(np.pi)) / (np.sqrt(2.0) * sigma))
        dy = jnp.asarray(drow, jnp.float32)
        dx = jnp.asarray(dcol, jnp.float32)
        ey = erf((dy + 0.5) / d) - erf((dy - 0.5) / d)
        ex = erf((dx + 0.5) / d) - erf((dx - 0.5) / d)
        gy = c * (jnp.exp(-((dy + 0.5) / d) ** 2) - jnp.exp(-((dy - 0.5) / d) ** 2))
        gx = c * (jnp.exp(-((dx + 0.5) / d) ** 2) - jnp.exp(-((dx - 0.5) / d) ** 2))
        return 0.25 * ey * ex, 0.25 * gy * ex, 0.25 * ey * gx

    def integrate_to_image(self, params, shape, cutoff_radius: Optional[float] = 5.0):
        """Render stars onto a pixel grid.  Pure-JAX; jit/vmap-safe.

        Parameters:
            params: (S, 3) array of (row, column, flux) per star.
            shape: static (h, w) of the output image.
            cutoff_radius: zero contribution beyond this distance (pixels).

        Returns:
            (h, w) model image.
        """
        params = jnp.atleast_2d(jnp.asarray(params))
        if self._grid_separable:
            # Gather-free SVD-separable render for calibrated tables:
            return self._render_separable(params, shape, cutoff_radius)
        h, w = shape
        rows = jnp.arange(h, dtype=jnp.float32)[:, None, None]    # (h,1,1)
        cols = jnp.arange(w, dtype=jnp.float32)[None, :, None]    # (1,w,1)
        drow = rows - params[None, None, :, 0]                     # (h,w,S)
        dcol = cols - params[None, None, :, 1]
        frac = self.pixel_fraction(drow, dcol)
        if cutoff_radius is not None:
            frac = jnp.where(drow**2 + dcol**2 < cutoff_radius**2, frac, 0.0)
        return jnp.sum(frac * params[None, None, :, 2], axis=-1)

    def render_batch(self, params_batch, shape, cutoff_radius: Optional[float] = 5.0):
        """(B, S, 3) star parameters -> (B, h, w) model images (vmapped)."""
        return jax.vmap(lambda p: self.integrate_to_image(p, shape, cutoff_radius))(
            jnp.asarray(params_batch))

    def design_matrix(self, rows, cols, shape, cutoff_radius: Optional[float] = 5.0):
        """Unit-flux PRF per star, flattened: (h*w, S) — the linPSF 'A' matrix."""
        rows = jnp.asarray(rows)
        S = rows.shape[0]
        params = jnp.stack([rows, jnp.asarray(cols), jnp.ones(S, jnp.float32)], axis=1)
        h, w = shape
        if self._grid_separable:
            cols_mat = jax.vmap(lambda p: self._render_separable(
                p[None], (h, w), cutoff_radius).ravel())(params)
            return cols_mat.T                                      # (h*w, S)
        rr = jnp.arange(h, dtype=jnp.float32)[:, None, None]
        cc = jnp.arange(w, dtype=jnp.float32)[None, :, None]
        drow = rr - params[None, None, :, 0]
        dcol = cc - params[None, None, :, 1]
        frac = self.pixel_fraction(drow, dcol)
        if cutoff_radius is not None:
            frac = jnp.where(drow**2 + dcol**2 < cutoff_radius**2, frac, 0.0)
        return frac.reshape(h * w, S)
