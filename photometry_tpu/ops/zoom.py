"""
Cubic B-spline zoom matching ``scipy.ndimage.zoom(order=3, mode='reflect',
grid_mode=True)`` — the interpolator photutils' ``BkgZoomInterpolator``
applies to the low-resolution background mesh (reference backgrounds.py:199
via ``photutils.Background2D``).

TPU formulation: the spline *prefilter* is the textbook single-pole IIR
(pole z = sqrt(3) - 2) run as a forward/backward ``lax.scan`` over a
reflect-padded signal — padding by ~30 samples makes the cold-start boundary
error |z|^30 ~ 1e-17, i.e. machine-exact for any boundary mode — and the
*evaluation* collapses to two static weight-matrix matmuls
``W_rows @ coeffs @ W_cols^T`` (the B-spline weights depend only on the
shapes, so they are built host-side as constants: no gathers, MXU-friendly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["spline_zoom"]

_POLE3 = np.sqrt(3.0) - 2.0          #: cubic B-spline prefilter pole
_PAD = 30                            #: |pole|^30 ~ 1e-17: exact to f64 eps


def _reflect_indices(idx, n):
    """scipy 'reflect' (symmetric, edge-repeated) index extension."""
    idx = np.asarray(idx)
    if n == 1:
        return np.zeros_like(idx)
    period = 2 * n
    idx = np.remainder(idx, period)
    idx = np.where(idx < 0, idx + period, idx)
    return np.where(idx >= n, period - 1 - idx, idx)


def _prefilter_axis(x, axis: int):
    """Exact cubic-B-spline prefilter along ``axis`` (mode='reflect')."""
    n = x.shape[axis]
    pad = min(_PAD, 10 * n)
    ext_idx = _reflect_indices(np.arange(-pad, n + pad), n)
    xe = jnp.take(x, jnp.asarray(ext_idx), axis=axis)
    xe = jnp.moveaxis(xe, axis, 0)
    z = _POLE3
    gain = (1.0 - z) * (1.0 - 1.0 / z)

    def fwd(carry, v):
        c = v * gain + z * carry
        return c, c

    _, cp = jax.lax.scan(fwd, jnp.zeros_like(xe[0]), xe)

    def bwd(carry, v):
        c = z * (carry - v)
        return c, c

    _, cm = jax.lax.scan(bwd, jnp.zeros_like(xe[0]), cp[::-1])
    out = cm[::-1][pad:pad + n]
    return jnp.moveaxis(out, 0, axis)


def _weight_matrix(n_in: int, n_out: int, grid_mode: bool) -> np.ndarray:
    """(n_out, n_in) dense cubic-B-spline evaluation weights, 'reflect'."""
    zoom = n_out / n_in
    i = np.arange(n_out, dtype=np.float64)
    if grid_mode:
        xq = (i + 0.5) / zoom - 0.5
    else:
        zoom_nd = (n_out - 1) / (n_in - 1) if n_in > 1 else 1.0
        xq = i / zoom_nd
    base = np.floor(xq).astype(np.int64)
    t = xq - base
    w = np.stack([((1 - t) ** 3) / 6.0,
                  (3 * t ** 3 - 6 * t ** 2 + 4.0) / 6.0,
                  (-3 * t ** 3 + 3 * t ** 2 + 3 * t + 1.0) / 6.0,
                  (t ** 3) / 6.0], axis=1)                   # (n_out, 4)
    W = np.zeros((n_out, n_in), np.float64)
    for j in range(4):
        idx = _reflect_indices(base + j - 1, n_in)
        np.add.at(W, (np.arange(n_out), idx), w[:, j])
    return W


@functools.partial(jax.jit, static_argnames=("out_shape", "grid_mode"))
def spline_zoom(mesh, out_shape, grid_mode: bool = True):
    """Zoom a 2-D array with cubic B-splines, matching
    ``scipy.ndimage.zoom(mesh, order=3, mode='reflect', grid_mode=grid_mode)``
    (the photutils ``BkgZoomInterpolator`` configuration).

    Parameters:
        mesh: (h, w) array (the low-resolution background tile grid).
        out_shape: static (H, W) output shape.

    Returns:
        (H, W) array, float32.
    """
    mesh = jnp.asarray(mesh, jnp.float32)
    h, w = mesh.shape
    H, W = out_shape
    c = _prefilter_axis(mesh, 0)
    c = _prefilter_axis(c, 1)
    Wr = jnp.asarray(_weight_matrix(h, H, grid_mode), jnp.float32)
    Wc = jnp.asarray(_weight_matrix(w, W, grid_mode), jnp.float32)
    return (Wr @ c @ Wc.T).astype(jnp.float32)
