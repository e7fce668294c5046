"""
Batched solvers for *small* SPD systems (K <= ~32), statically unrolled.

XLA's batched ``jnp.linalg.solve`` / ``inv`` / ``cholesky`` lower to blocked
LAPACK-style loops that run two orders of magnitude off the elementwise
floor for tiny matrices on TPU (measured: 542 ms for 131k 15x15 LU solves
where these unrolled kernels take ~5 ms).  The LM PSF fitter solves one
(3S x 3S) normal-equation system per cadence per iteration
(models/psf_fit.py) — at N=1024 targets x T=128 cadences those tiny solves
dominated the whole fit.

Everything here is a static Python unroll over K steps of vectorized
batch ops: jit/vmap-safe, MXU-free, exact up to f32 rounding.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["chol_small", "cho_solve_small", "solve_spd_small",
           "spd_inverse_diag_small"]


def chol_small(A, jitter: float = 0.0):
    """Cholesky factor L (lower) of a batch of small SPD matrices.

    A: (..., K, K).  ``jitter`` is added to the diagonal.  Outer-product
    (right-looking) form, unrolled over the K static steps.
    """
    K = A.shape[-1]
    M = A
    if jitter:
        M = M + jitter * jnp.eye(K, dtype=A.dtype)
    cols = []
    rows_ge = [jnp.arange(K) >= k for k in range(K)]
    for k in range(K):
        d = jnp.sqrt(jnp.maximum(M[..., k, k], 1e-30))
        col = M[..., :, k] / d[..., None]
        col = jnp.where(rows_ge[k], col, 0.0)
        M = M - col[..., :, None] * col[..., None, :]
        cols.append(col)
    return jnp.stack(cols, axis=-1)


def _solve_lower(L, b):
    """L y = b by forward substitution; b is (..., K) or (..., K, M)."""
    K = L.shape[-1]
    vec = b.ndim == L.ndim - 1
    r = b[..., None] if vec else b
    ys = []
    for k in range(K):
        yk = r[..., k, :] / L[..., k, k, None]
        ys.append(yk)
        r = r - yk[..., None, :] * L[..., :, k, None]
    y = jnp.stack(ys, axis=-2)
    return y[..., 0] if vec else y


def _solve_upper_t(L, b):
    """L^T x = b by back substitution; b is (..., K) or (..., K, M)."""
    K = L.shape[-1]
    vec = b.ndim == L.ndim - 1
    r = b[..., None] if vec else b
    xs = [None] * K
    for k in reversed(range(K)):
        xk = r[..., k, :] / L[..., k, k, None]
        xs[k] = xk
        r = r - xk[..., None, :] * L[..., k, :, None]
    x = jnp.stack(xs, axis=-2)
    return x[..., 0] if vec else x


def cho_solve_small(L, b):
    """Solve (L L^T) x = b given the factor from :func:`chol_small`."""
    return _solve_upper_t(L, _solve_lower(L, b))


def solve_spd_small(A, b, jitter: float = 0.0):
    """Solve the batched SPD system A x = b (A: (..., K, K), b: (..., K))."""
    return cho_solve_small(chol_small(A, jitter), b)


def spd_inverse_diag_small(A, jitter: float = 0.0):
    """diag(A^-1) for batched small SPD A: diag_j = ||(L^-1)[:, j]||^2."""
    K = A.shape[-1]
    L = chol_small(A, jitter)
    eye = jnp.broadcast_to(jnp.eye(K, dtype=A.dtype), A.shape)
    Y = _solve_lower(L, eye)
    return jnp.sum(Y * Y, axis=-2)
