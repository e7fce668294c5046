"""
Cubic spline kernels (1-D natural splines; bicubic grid interpolation).

The reference uses FITPACK via scipy (InterpolatedUnivariateSpline for the
radial background profile, backgrounds.py:190-193; RectBivariateSpline for
PRF evaluation, psf.py:119).  Here splines are built and evaluated as pure
JAX: coefficient construction is a tridiagonal solve (Thomas algorithm via
``lax.scan``); evaluation is a searchsorted gather + fused polynomial —
both jit/vmap-safe, so thousands of spline evaluations batch into one
device program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["natural_cubic_coeffs", "make_natural_spline", "eval_natural_spline",
           "bicubic_coeffs", "bicubic_eval"]


def natural_cubic_coeffs(x, y):
    """Second derivatives M_i of the natural cubic spline through (x, y).

    Natural boundary conditions (M_0 = M_{n-1} = 0).  Solved with the Thomas
    algorithm expressed as two ``lax.scan`` sweeps (static shapes).
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n = x.shape[0]
    h = x[1:] - x[:-1]                                  # (n-1,)
    # Tridiagonal system for interior nodes i = 1..n-2:
    # h[i-1] M[i-1] + 2(h[i-1]+h[i]) M[i] + h[i] M[i+1] = 6*(dd[i])
    dd = (y[2:] - y[1:-1]) / h[1:] - (y[1:-1] - y[:-2]) / h[:-1]  # (n-2,)
    a = h[:-1]          # sub-diagonal
    b = 2 * (h[:-1] + h[1:])
    c = h[1:]           # super-diagonal
    d = 6 * dd

    # Forward sweep:
    def fwd(carry, inp):
        cp_prev, dp_prev = carry
        a_i, b_i, c_i, d_i = inp
        denom = b_i - a_i * cp_prev
        cp = c_i / denom
        dp = (d_i - a_i * dp_prev) / denom
        return (cp, dp), (cp, dp)

    (_, _), (cp, dp) = jax.lax.scan(fwd, (jnp.float32(0.0), jnp.float32(0.0)),
                                    (a, b, c, d))

    # Backward sweep:
    def bwd(carry, inp):
        m_next = carry
        cp_i, dp_i = inp
        m = dp_i - cp_i * m_next
        return m, m

    _, m_rev = jax.lax.scan(bwd, jnp.float32(0.0), (cp[::-1], dp[::-1]))
    m_interior = m_rev[::-1]
    return jnp.concatenate([jnp.zeros(1, m_interior.dtype), m_interior,
                            jnp.zeros(1, m_interior.dtype)])


def make_natural_spline(x, y):
    """Pack a natural cubic spline as (x, y, M) for :func:`eval_natural_spline`."""
    return x, y, natural_cubic_coeffs(x, y)


def eval_natural_spline(spline, xq, clamp: bool = True):
    """Evaluate a packed natural cubic spline at arbitrary query points.

    ``clamp=True`` clamps queries to the knot range (constant extrapolation,
    matching the reference's ``ext=3`` at backgrounds.py:191).
    """
    x, y, M = spline
    xq = jnp.asarray(xq)
    if clamp:
        xq = jnp.clip(xq, x[0], x[-1])
    i = jnp.clip(jnp.searchsorted(x, xq, side="right") - 1, 0, x.shape[0] - 2)
    x0 = x[i]
    x1 = x[i + 1]
    h = x1 - x0
    t = (xq - x0)
    A = (x1 - xq) / h
    B = t / h
    y0 = y[i]
    y1 = y[i + 1]
    M0 = M[i]
    M1 = M[i + 1]
    return (A * y0 + B * y1
            + ((A ** 3 - A) * M0 + (B ** 3 - B) * M1) * (h ** 2) / 6.0)


# ---------------------------------------------------------------------------
# Bicubic (Catmull-Rom) grid interpolation — PRF evaluation kernel
# ---------------------------------------------------------------------------

_CRM = jnp.asarray([[0, 2, 0, 0],
                    [-1, 0, 1, 0],
                    [2, -5, 4, -1],
                    [-1, 3, -3, 1]], dtype=jnp.float32) * 0.5


def bicubic_coeffs(grid):
    """Identity packing for Catmull-Rom interpolation (kept for symmetry)."""
    return jnp.asarray(grid, jnp.float32)


def bicubic_eval(grid, yq, xq):
    """Catmull-Rom bicubic interpolation of a regular unit-spaced grid.

    ``grid`` is (H, W); queries are in grid index coordinates.  Out-of-range
    queries clamp to the border.  This is the device-side replacement for
    scipy's RectBivariateSpline evaluation (reference psf.py:119,137-147):
    a 16-point gather followed by two small matmuls, which XLA fuses into
    the surrounding program — ideal for batching over stars x pixels.
    """
    grid = jnp.asarray(grid, jnp.float32)
    H, W = grid.shape
    yq = jnp.clip(jnp.asarray(yq, jnp.float32), 0.0, H - 1.000001)
    xq = jnp.clip(jnp.asarray(xq, jnp.float32), 0.0, W - 1.000001)
    y0 = jnp.floor(yq).astype(jnp.int32)
    x0 = jnp.floor(xq).astype(jnp.int32)
    ty = yq - y0
    tx = xq - x0

    # Gather the 4x4 neighborhood (clamped):
    offs = jnp.arange(-1, 3)
    yy = jnp.clip(y0[..., None] + offs, 0, H - 1)            # (..., 4)
    xx = jnp.clip(x0[..., None] + offs, 0, W - 1)            # (..., 4)
    patch = grid[yy[..., :, None], xx[..., None, :]]          # (..., 4, 4)

    def basis(t):
        tt = jnp.stack([jnp.ones_like(t), t, t * t, t * t * t], axis=-1)
        return tt @ _CRM                                     # (..., 4)

    by = basis(ty)                                            # (..., 4)
    bx = basis(tx)
    return jnp.einsum("...i,...ij,...j->...", by, patch, bx)
