"""
World Coordinate System: gnomonic (TAN) projection with SIP distortion.

The reference relies on astropy.wcs (e.g. photometry/BasePhotometry.py:249-259,
prepare.py:433-447, image_motion.py:150-179).  This is a self-contained
re-implementation of the subset TESS products need — TAN projection, CD
matrix, and SIP polynomial distortion — with two faces:

- A host-side :class:`TanWCS` object with FITS-header parsing/serialisation.
- Pure-JAX kernels (:func:`tan_pixel_to_world`, :func:`tan_world_to_pixel`)
  operating on packed coefficient arrays so coordinate transforms can be
  batched and jitted on device (thousands of stars at once) — this is what
  replaces the reference's per-star astropy calls in the hot path.

Pixel convention: FITS 1-based (x = column+1, y = row+1), matching the headers.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["TanWCS", "fit_tan_wcs", "tan_pixel_to_world", "tan_world_to_pixel"]

_D2R = np.pi / 180.0


# ---------------------------------------------------------------------------
# Pure functions (JAX) on explicit parameters
# ---------------------------------------------------------------------------

def _sip_eval(u, v, coeffs, powers, xp=jnp):
    """Evaluate a SIP polynomial sum(c_k * u^p_k * v^q_k) for packed coeffs."""
    if coeffs is None or len(coeffs) == 0:
        return xp.zeros_like(u)
    coeffs = xp.asarray(coeffs)
    powers = xp.asarray(powers)
    p = powers[:, 0][:, None]
    q = powers[:, 1][:, None]
    uu = u[None, :] ** p
    vv = v[None, :] ** q
    return (coeffs[:, None] * uu * vv).sum(axis=0)


def tan_pixel_to_world(x, y, crpix, crval, cd, sip_a=None, sip_a_pow=None,
                       sip_b=None, sip_b_pow=None, xp=jnp):
    """(x, y) 1-based pixels -> (ra, dec) degrees.

    Namespace-generic: pass ``xp=numpy`` for float64 host transforms (what
    :class:`TanWCS` does) or leave the default ``jnp`` for use under jit,
    where float32 suffices for *relative* quantities like jitter offsets.
    """
    x = xp.atleast_1d(xp.asarray(x))
    y = xp.atleast_1d(xp.asarray(y))
    u = x - crpix[0]
    v = y - crpix[1]
    if sip_a is not None:
        du = _sip_eval(u, v, sip_a, sip_a_pow, xp)
        dv = _sip_eval(u, v, sip_b, sip_b_pow, xp)
        u, v = u + du, v + dv
    xi = (cd[0, 0] * u + cd[0, 1] * v) * _D2R
    eta = (cd[1, 0] * u + cd[1, 1] * v) * _D2R
    ra0 = crval[0] * _D2R
    dec0 = crval[1] * _D2R
    # Gnomonic deprojection:
    denom = xp.cos(dec0) - eta * xp.sin(dec0)
    ra = ra0 + xp.arctan2(xi, denom)
    dec = xp.arctan((xp.sin(dec0) + eta * xp.cos(dec0)) / xp.sqrt(xi**2 + denom**2))
    ra = xp.rad2deg(ra) % 360.0
    return ra, xp.rad2deg(dec)


def _tan_project(ra, dec, crval, xp=jnp):
    """(ra, dec) deg -> gnomonic plane coords (xi, eta) in degrees."""
    ra = xp.deg2rad(xp.atleast_1d(xp.asarray(ra)))
    dec = xp.deg2rad(xp.atleast_1d(xp.asarray(dec)))
    ra0 = crval[0] * _D2R
    dec0 = crval[1] * _D2R
    cosc = xp.sin(dec0) * xp.sin(dec) + xp.cos(dec0) * xp.cos(dec) * xp.cos(ra - ra0)
    xi = xp.cos(dec) * xp.sin(ra - ra0) / cosc
    eta = (xp.cos(dec0) * xp.sin(dec) - xp.sin(dec0) * xp.cos(dec) * xp.cos(ra - ra0)) / cosc
    return xp.rad2deg(xi), xp.rad2deg(eta)


def tan_world_to_pixel(ra, dec, crpix, crval, cd, sip_a=None, sip_a_pow=None,
                       sip_b=None, sip_b_pow=None, newton_iters: int = 3, xp=jnp):
    """(ra, dec) degrees -> (x, y) 1-based pixels.  Namespace-generic.

    SIP inversion uses fixed-count Newton iterations on the forward
    polynomial (no AP/BP tables needed), which converges to < 1e-6 px for
    TESS-scale distortions in 2-3 iterations.
    """
    xi, eta = _tan_project(ra, dec, crval, xp)
    inv = np.linalg.inv(np.asarray(cd)) if xp is np else jnp.linalg.inv(cd)
    up = inv[0, 0] * xi + inv[0, 1] * eta
    vp = inv[1, 0] * xi + inv[1, 1] * eta
    if sip_a is not None:
        u, v = up, vp
        for _ in range(newton_iters):
            fu = u + _sip_eval(u, v, sip_a, sip_a_pow, xp) - up
            fv = v + _sip_eval(u, v, sip_b, sip_b_pow, xp) - vp
            u = u - fu
            v = v - fv
        up, vp = u, v
    return up + crpix[0], vp + crpix[1]


# ---------------------------------------------------------------------------
# Host-side object with header round-trip
# ---------------------------------------------------------------------------

@dataclass
class TanWCS:
    """A TAN(+SIP) world coordinate system."""

    crpix: np.ndarray                 #: (2,) reference pixel, 1-based (x, y)
    crval: np.ndarray                 #: (2,) reference (ra, dec) in degrees
    cd: np.ndarray                    #: (2,2) CD matrix, degrees/pixel
    sip_a: Optional[np.ndarray] = None      #: packed A coefficients
    sip_a_pow: Optional[np.ndarray] = None  #: (n,2) powers (p,q) for A
    sip_b: Optional[np.ndarray] = None
    sip_b_pow: Optional[np.ndarray] = None
    sip_order: int = 0

    def __post_init__(self):
        self.crpix = np.asarray(self.crpix, dtype=np.float64)
        self.crval = np.asarray(self.crval, dtype=np.float64)
        self.cd = np.asarray(self.cd, dtype=np.float64)

    # -- transforms ----------------------------------------------------------
    def pixel_to_world(self, x, y):
        ra, dec = tan_pixel_to_world(np.asarray(x, np.float64), np.asarray(y, np.float64),
                                     self.crpix, self.crval, self.cd,
                                     self.sip_a, self.sip_a_pow, self.sip_b, self.sip_b_pow,
                                     xp=np)
        return np.asarray(ra), np.asarray(dec)

    def world_to_pixel(self, ra, dec):
        x, y = tan_world_to_pixel(np.asarray(ra, np.float64), np.asarray(dec, np.float64),
                                  self.crpix, self.crval, self.cd,
                                  self.sip_a, self.sip_a_pow, self.sip_b, self.sip_b_pow,
                                  xp=np)
        return np.asarray(x), np.asarray(y)

    def radec_of_rowcol(self, row, col):
        """Convenience: 0-based (row, col) -> (ra, dec)."""
        return self.pixel_to_world(np.asarray(col) + 1.0, np.asarray(row) + 1.0)

    def rowcol_of_radec(self, ra, dec):
        """Convenience: (ra, dec) -> 0-based (row, col)."""
        x, y = self.world_to_pixel(ra, dec)
        return y - 1.0, x - 1.0

    @property
    def pixel_scale(self) -> float:
        """Approximate pixel scale in arcsec/pixel."""
        return float(np.sqrt(np.abs(np.linalg.det(self.cd))) * 3600.0)

    def shifted(self, drow: float = 0.0, dcol: float = 0.0) -> "TanWCS":
        """The same sky solution on a cropped/translated pixel grid where
        new (row, col) = old (row, col) - (drow, dcol).

        A pure CRPIX shift: SIP u/v are CRPIX-relative, so the distortion
        coefficients carry over unchanged.  Used to convert the raw-frame
        WCS of flight FFIs (columns 1..2136 incl. overscan) into the
        science-area frame the whole pipeline works in (io/tess.read_ffi).
        """
        import dataclasses
        return dataclasses.replace(
            self, crpix=self.crpix - np.array([dcol, drow], np.float64))

    # -- header round-trip -----------------------------------------------------
    @classmethod
    def from_header(cls, hdr) -> "TanWCS":
        """Parse from a FITS header (mapping-like; photometry_tpu Header or dict)."""
        get = hdr.get if hasattr(hdr, "get") else hdr.__getitem__
        crpix = np.array([float(get("CRPIX1", 0.0)), float(get("CRPIX2", 0.0))])
        crval = np.array([float(get("CRVAL1", 0.0)), float(get("CRVAL2", 0.0))])
        if get("CD1_1", None) is not None:
            cd = np.array([[float(get("CD1_1")), float(get("CD1_2", 0.0) or 0.0)],
                           [float(get("CD2_1", 0.0) or 0.0), float(get("CD2_2"))]])
        else:
            # PC + CDELT convention
            cdelt = np.array([float(get("CDELT1", 1.0)), float(get("CDELT2", 1.0))])
            pc = np.array([[float(get("PC1_1", 1.0)), float(get("PC1_2", 0.0))],
                           [float(get("PC2_1", 0.0)), float(get("PC2_2", 1.0))]])
            cd = pc * cdelt[:, None]
        sip_a = sip_a_pow = sip_b = sip_b_pow = None
        order = int(get("A_ORDER", 0) or 0)
        if order:
            a_c, a_p, b_c, b_p = [], [], [], []
            for p in range(order + 1):
                for q in range(order + 1 - p):
                    if p + q < 1:
                        continue
                    av = get(f"A_{p}_{q}", None)
                    bv = get(f"B_{p}_{q}", None)
                    if av:
                        a_c.append(float(av)); a_p.append((p, q))
                    if bv:
                        b_c.append(float(bv)); b_p.append((p, q))
            if a_c:
                sip_a = np.array(a_c); sip_a_pow = np.array(a_p, dtype=np.int32)
            if b_c:
                sip_b = np.array(b_c); sip_b_pow = np.array(b_p, dtype=np.int32)
            if sip_a is None or sip_b is None:
                sip_a = sip_a if sip_a is not None else np.zeros(1)
                sip_a_pow = sip_a_pow if sip_a_pow is not None else np.array([[1, 0]], np.int32) * 0 + 1
                sip_b = sip_b if sip_b is not None else np.zeros(1)
                sip_b_pow = sip_b_pow if sip_b_pow is not None else np.array([[1, 1]], np.int32)
        return cls(crpix=crpix, crval=crval, cd=cd, sip_a=sip_a, sip_a_pow=sip_a_pow,
                   sip_b=sip_b, sip_b_pow=sip_b_pow, sip_order=order)

    def to_header(self, hdr=None):
        """Write WCS keywords into a header (photometry_tpu Header or dict)."""
        if hdr is None:
            from .fits import Header
            hdr = Header()
        setter = hdr.set if hasattr(hdr, "set") else hdr.__setitem__
        suffix = "-SIP" if self.sip_a is not None else ""
        setter("CTYPE1", "RA---TAN" + suffix)
        setter("CTYPE2", "DEC--TAN" + suffix)
        setter("CRPIX1", float(self.crpix[0]))
        setter("CRPIX2", float(self.crpix[1]))
        setter("CRVAL1", float(self.crval[0]))
        setter("CRVAL2", float(self.crval[1]))
        setter("CD1_1", float(self.cd[0, 0]))
        setter("CD1_2", float(self.cd[0, 1]))
        setter("CD2_1", float(self.cd[1, 0]))
        setter("CD2_2", float(self.cd[1, 1]))
        if self.sip_a is not None:
            order = int(self.sip_order or max(self.sip_a_pow.sum(axis=1).max(),
                                              self.sip_b_pow.sum(axis=1).max()))
            setter("A_ORDER", order)
            setter("B_ORDER", order)
            for c, (p, q) in zip(self.sip_a, self.sip_a_pow):
                setter(f"A_{p}_{q}", float(c))
            for c, (p, q) in zip(self.sip_b, self.sip_b_pow):
                setter(f"B_{p}_{q}", float(c))
        return hdr

    def copy(self) -> "TanWCS":
        return TanWCS(self.crpix.copy(), self.crval.copy(), self.cd.copy(),
                      None if self.sip_a is None else self.sip_a.copy(),
                      None if self.sip_a_pow is None else self.sip_a_pow.copy(),
                      None if self.sip_b is None else self.sip_b.copy(),
                      None if self.sip_b_pow is None else self.sip_b_pow.copy(),
                      self.sip_order)


# ---------------------------------------------------------------------------
# WCS fitting (used by prepare / image-motion 'wcs' mode)
# ---------------------------------------------------------------------------

def fit_tan_wcs(x, y, ra, dec, crpix=None) -> TanWCS:
    """Fit a linear TAN WCS to matched (pixel, sky) points.

    Counterpart of astropy's ``fit_wcs_from_points`` as used by the reference
    for per-frame WCS refinement.  A gnomonic projection composed with an
    affine pixel map sends homogeneous pixel coords to sky *directions*
    linearly: ``u ∝ M @ (x, y, 1)`` with ``M = R_crval @ K`` where K's last
    row is (0,0,1).  We therefore solve M by direct linear transform (DLT),
    recover the tangent point as the third row of ``M^-1`` (since
    ``K^-T e3 = e3`` implies ``M^-T e3 = R e3``), then solve the exact affine
    (CD + CRPIX shift) about that tangent point by least squares.  Exact on
    noise-free TAN data; least-squares otherwise.  Needs >= 4 points.
    """
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    ra = np.asarray(ra, np.float64)
    dec = np.asarray(dec, np.float64)
    if x.size < 4:
        raise ValueError("Need at least 4 points to fit a TAN WCS "
                         "(the 9-parameter DLT is underdetermined below 4: "
                         "3 points return an arbitrary nullspace vector)")
    if crpix is None:
        crpix = np.array([np.mean(x), np.mean(y)])
    crpix = np.asarray(crpix, np.float64)

    # Normalised homogeneous pixel coordinates (conditioning):
    sx = max(np.std(x), 1.0)
    sy = max(np.std(y), 1.0)
    hx = (x - crpix[0]) / sx
    hy = (y - crpix[1]) / sy
    H = np.stack([hx, hy, np.ones_like(hx)], axis=1)          # (N, 3)
    rr, dd = np.deg2rad(ra), np.deg2rad(dec)
    V = np.stack([np.cos(dd) * np.cos(rr), np.cos(dd) * np.sin(rr), np.sin(dd)], axis=1)

    # DLT: v x (M h) = 0 -> rows of the constraint matrix.
    n = len(x)
    C = np.zeros((3 * n, 9))
    for k in range(3):
        i, j = (k + 1) % 3, (k + 2) % 3
        # row block: v_i*(M h)_j - v_j*(M h)_i = 0
        C[k::3, 3 * j:3 * j + 3] = V[:, i:i + 1] * H
        C[k::3, 3 * i:3 * i + 3] = -V[:, j:j + 1] * H
    _, _, vt = np.linalg.svd(C, full_matrices=False)
    M = vt[-1].reshape(3, 3)
    # Fix the overall sign so M h points along v (not -v):
    if np.sum(np.einsum("nk,nk->n", V, H @ M.T)) < 0:
        M = -M

    # Tangent point = direction of the third row of M^-1:
    p = np.linalg.inv(M)[2]
    p /= np.linalg.norm(p)
    if np.dot(p, V.mean(axis=0)) < 0:
        p = -p
    crval = np.array([np.rad2deg(np.arctan2(p[1], p[0])) % 360.0,
                      np.rad2deg(np.arcsin(np.clip(p[2], -1, 1)))])

    # Exact affine about the recovered tangent point:
    xi, eta = _tan_project(ra, dec, crval, xp=np)
    A = np.stack([x - crpix[0], y - crpix[1], np.ones_like(x)], axis=1)
    cx, *_ = np.linalg.lstsq(A, np.asarray(xi), rcond=None)
    cy, *_ = np.linalg.lstsq(A, np.asarray(eta), rcond=None)
    cd = np.array([[cx[0], cx[1]], [cy[0], cy[1]]])
    # Fold the constant terms into CRPIX (xi = CD (p - crpix_new)):
    shift = np.linalg.solve(cd, np.array([cx[2], cy[2]]))
    return TanWCS(crpix=crpix - shift, crval=crval, cd=cd)
