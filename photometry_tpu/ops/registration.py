"""
Image registration: ECC-style alignment by Gauss-Newton, in JAX.

Replaces OpenCV's ``findTransformECC`` (reference image_motion.py:236) with a
differentiable, batchable Gauss-Newton maximisation of the Enhanced
Correlation Coefficient (Evangelidis & Psarakis 2008): both images are
zero-mean/unit-norm normalised, and the warp parameters are iterated to
maximise their inner product.  Supported motion models: ``translation`` (2),
``euclidian`` (3: dx, dy, theta) and ``affine`` (6), with the same parameter
conventions as the reference's kernels (image_motion.py:31-37,139-176).

The whole solver is ``lax.scan``-based with static iteration count, so a
cube's worth of frames registers as ONE ``vmap``-ed device program instead of
a multiprocessing pool of OpenCV calls (reference prepare.py:678-698).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .filters import scharr
from .smallsolve import solve_spd_small

__all__ = ["prepare_flux", "ecc_align", "warp_params_to_matrix", "N_PARAMS"]

N_PARAMS = {"unchanged": 0, "translation": 2, "euclidian": 3, "affine": 6}


def prepare_flux(flux):
    """Log-scale + normalise + Scharr gradient preprocessing for alignment.

    Same pipeline as reference image_motion.py:74-110: registration runs on
    the gradient of the log-image, which suppresses the dynamic range of
    bright stars and emphasises structure.
    """
    flux = jnp.asarray(flux, jnp.float32)
    flux = jnp.log10(flux - jnp.nanmin(flux) + 1.0)
    fmax = jnp.nanmax(flux)
    fmin = jnp.nanmin(flux)
    ran = jnp.maximum(jnp.abs(fmax - fmin), 1e-30)
    flux1 = -1.0 + 2.0 * (flux - fmin) / ran
    grad = scharr(flux1)
    return jnp.nan_to_num(grad)


def warp_params_to_matrix(params, mode: str):
    """Kernel parameters -> 2x3 warp matrix (same conventions as reference)."""
    if mode == "translation":
        dx, dy = params[0], params[1]
        return jnp.array([[1.0, 0.0, dx], [0.0, 1.0, dy]], jnp.float32)
    if mode == "euclidian":
        dx, dy, th = params[0], params[1], params[2]
        c, s = jnp.cos(th), jnp.sin(th)
        return jnp.array([[c, -s, dx], [s, c, dy]], jnp.float32)
    if mode == "affine":
        return params.reshape(2, 3)
    raise ValueError(f"Invalid warpmode: {mode}")


def _bilinear(img, x, y):
    """Bilinear sample of img at (x, y) [pixel coords]; clamped borders."""
    H, W = img.shape
    x = jnp.clip(x, 0.0, W - 1.001)
    y = jnp.clip(y, 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    tx = x - x0
    ty = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (v00 * (1 - tx) * (1 - ty) + v01 * tx * (1 - ty)
            + v10 * (1 - tx) * ty + v11 * tx * ty)


def _normalize(v, mask):
    n = jnp.sum(mask)
    mean = jnp.sum(v * mask) / jnp.maximum(n, 1)
    v0 = (v - mean) * mask
    norm = jnp.sqrt(jnp.sum(v0 * v0))
    return v0 / jnp.maximum(norm, 1e-30)


@functools.partial(jax.jit, static_argnames=("mode", "n_iters"))
def ecc_align(ref, img, mode: str = "euclidian", n_iters: int = 50,
              mask=None):
    """Estimate warp parameters aligning ``img`` to ``ref``.

    Parameters:
        ref, img: preprocessed (see :func:`prepare_flux`) 2-D images.
        mode: 'translation' | 'euclidian' | 'affine'.
        n_iters: fixed Gauss-Newton iteration count.
        mask: optional boolean validity mask of ``img``.

    Returns:
        (params, cc): warp parameters (reference convention) and the final
        correlation coefficient.

    The parameterisation is solved in matrix space (2x3 entries) and
    projected back to the requested motion model each step, which keeps a
    single code path for all modes.
    """
    ref = jnp.asarray(ref, jnp.float32)
    img = jnp.asarray(img, jnp.float32)
    H, W = ref.shape
    yy, xx = jnp.mgrid[0:H, 0:W]
    xx = xx.astype(jnp.float32)
    yy = yy.astype(jnp.float32)
    valid = jnp.ones((H, W), jnp.float32)
    if mask is not None:
        valid = jnp.asarray(mask, jnp.float32)
    # avoid border effects of the warp sampling:
    valid = valid.at[:2, :].set(0).at[-2:, :].set(0).at[:, :2].set(0).at[:, -2:].set(0)

    n_params = N_PARAMS[mode]
    if mode == "affine":
        # affine params are the full 2x3 matrix — identity start, not zeros:
        p0 = jnp.asarray([1.0, 0.0, 0.0, 0.0, 1.0, 0.0], jnp.float32)
    else:
        p0 = jnp.zeros(n_params, jnp.float32)

    # Image gradients of img (for the GN jacobian), sampled at warped coords:
    gy, gx = jnp.gradient(img)

    def params_to_mat(p):
        return warp_params_to_matrix(p, mode)

    def jac_columns(p, wx, wy):
        """Warp jacobians dx/dp, dy/dp evaluated at original grid coords."""
        if mode == "translation":
            ones = jnp.ones_like(xx)
            zeros = jnp.zeros_like(xx)
            jx = [ones, zeros]
            jy = [zeros, ones]
        elif mode == "euclidian":
            th = p[2]
            c, s = jnp.cos(th), jnp.sin(th)
            ones = jnp.ones_like(xx)
            zeros = jnp.zeros_like(xx)
            jx = [ones, zeros, -s * xx - c * yy]
            jy = [zeros, ones, c * xx - s * yy]
        else:  # affine: params [a00, a01, dx, a10, a11, dy] (row-major 2x3)
            ones = jnp.ones_like(xx)
            zeros = jnp.zeros_like(xx)
            jx = [xx, yy, ones, zeros, zeros, zeros]
            jy = [zeros, zeros, zeros, xx, yy, ones]
        return jnp.stack(jx, axis=-1), jnp.stack(jy, axis=-1)

    def step(p, _):
        M = params_to_mat(p)
        wx = M[0, 0] * xx + M[0, 1] * yy + M[0, 2]
        wy = M[1, 0] * xx + M[1, 1] * yy + M[1, 2]
        w = _bilinear(img, wx, wy)
        dwx = _bilinear(gx, wx, wy)
        dwy = _bilinear(gy, wx, wy)
        jx, jy = jac_columns(p, wx, wy)
        # dW/dp on the (H, W, P) grid:  (note gx is d/dcol, gy is d/drow)
        J = dwy[..., None] * jy + dwx[..., None] * jx
        # The support mask follows the warp: pixels whose warped coordinates
        # fall outside the image are excluded, exactly as OpenCV excludes
        # them by warping the input mask with border value 0.  With a fixed
        # mask, clamped border samples bias the fixed point by up to
        # ~0.03 px at ~2 px shifts (measured vs cv2.findTransformECC).
        inb = ((wx >= 0.0) & (wx <= W - 1.001)
               & (wy >= 0.0) & (wy <= H - 1.001)).astype(jnp.float32)
        wmask = valid * inb
        # Full ECC update (Evangelidis & Psarakis 2008, eqs. 32-34 — the
        # same update OpenCV's findTransformECC implements).  Work in the
        # zero-mean subspace: images are zero-meaned over the valid region
        # and the Jacobian columns are mean-projected into that subspace.
        n = jnp.maximum(jnp.sum(wmask), 1)
        wmean = jnp.sum(w * wmask) / n
        w0 = (w - wmean) * wmask
        g0 = _normalize(ref, wmask)  # template renormalised per support
        colmean = jnp.sum(J * wmask[..., None], axis=(0, 1)) / n
        Jp = (J - colmean) * wmask[..., None]
        Jf = Jp.reshape(-1, n_params)
        w0f = w0.ravel()
        g0f = g0.ravel()
        JtJ = Jf.T @ Jf + 1e-6 * jnp.eye(n_params)
        Jtw = Jf.T @ w0f
        Jtg = Jf.T @ g0f
        v = solve_spd_small(JtJ, Jtw)
        wnorm2 = jnp.sum(w0f * w0f)
        gw = jnp.dot(g0f, w0f)
        num = wnorm2 - jnp.dot(Jtw, v)
        den = gw - jnp.dot(Jtg, v)
        lam = num / jnp.where(jnp.abs(den) > 1e-20, den, 1e-20)
        err = lam * g0f - w0f
        dp = solve_spd_small(JtJ, Jf.T @ err)
        cc = gw / jnp.maximum(jnp.sqrt(wnorm2), 1e-30)
        return p + dp, cc

    p, ccs = jax.lax.scan(step, p0, None, length=n_iters)
    return p, ccs[-1]
