"""Tests of the TAN+SIP WCS implementation."""

import numpy as np
import pytest

from photometry_tpu.io.fits import Header
from photometry_tpu.io.wcs import TanWCS, fit_tan_wcs


def _tess_like_wcs(with_sip=False):
    # ~21 arcsec/px, slight rotation, TESS-like
    scale = 21.0 / 3600
    th = np.deg2rad(12.0)
    cd = scale * np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    kw = {}
    if with_sip:
        kw = dict(
            sip_a=np.array([1e-6, -2e-7, 5e-7]),
            sip_a_pow=np.array([[2, 0], [1, 1], [0, 2]], np.int32),
            sip_b=np.array([-8e-7, 3e-7, 1e-6]),
            sip_b_pow=np.array([[2, 0], [1, 1], [0, 2]], np.int32),
            sip_order=2,
        )
    return TanWCS(crpix=np.array([1024.5, 1024.5]), crval=np.array([324.5, -33.2]),
                  cd=cd, **kw)


@pytest.mark.parametrize("with_sip", [False, True])
def test_roundtrip(with_sip):
    w = _tess_like_wcs(with_sip)
    rng = np.random.default_rng(3)
    x = rng.uniform(1, 2048, 50)
    y = rng.uniform(1, 2048, 50)
    ra, dec = w.pixel_to_world(x, y)
    x2, y2 = w.world_to_pixel(ra, dec)
    np.testing.assert_allclose(x2, x, atol=1e-4)
    np.testing.assert_allclose(y2, y, atol=1e-4)


def test_reference_pixel_maps_to_crval():
    w = _tess_like_wcs()
    ra, dec = w.pixel_to_world(1024.5, 1024.5)
    assert float(ra[0]) == pytest.approx(324.5, abs=1e-9)
    assert float(dec[0]) == pytest.approx(-33.2, abs=1e-9)


def test_pixel_scale():
    w = _tess_like_wcs()
    assert w.pixel_scale == pytest.approx(21.0, rel=1e-6)


@pytest.mark.parametrize("with_sip", [False, True])
def test_header_roundtrip(with_sip):
    w = _tess_like_wcs(with_sip)
    hdr = w.to_header(Header())
    assert hdr["CTYPE1"] == ("RA---TAN-SIP" if with_sip else "RA---TAN")
    w2 = TanWCS.from_header(hdr)
    rng = np.random.default_rng(5)
    x = rng.uniform(1, 2048, 20)
    y = rng.uniform(1, 2048, 20)
    ra1, dec1 = w.pixel_to_world(x, y)
    ra2, dec2 = w2.pixel_to_world(x, y)
    np.testing.assert_allclose(ra2, ra1, atol=1e-10)
    np.testing.assert_allclose(dec2, dec1, atol=1e-10)


def test_rowcol_convenience():
    w = _tess_like_wcs()
    ra, dec = w.radec_of_rowcol(10.0, 20.0)
    row, col = w.rowcol_of_radec(ra, dec)
    assert float(row[0]) == pytest.approx(10.0, abs=1e-5)
    assert float(col[0]) == pytest.approx(20.0, abs=1e-5)


def test_fit_tan_wcs_recovers_truth():
    w = _tess_like_wcs()
    rng = np.random.default_rng(7)
    x = rng.uniform(1, 2048, 100)
    y = rng.uniform(1, 2048, 100)
    ra, dec = w.pixel_to_world(x, y)
    fitted = fit_tan_wcs(x, y, ra, dec)
    # The fitted WCS must reproduce the same pixel->sky mapping
    # (distance computed in float64 on host for precision):
    ra2, dec2 = fitted.pixel_to_world(x, y)
    dra = (ra2 - ra) * np.cos(np.deg2rad(dec))
    d = np.hypot(dra, dec2 - dec) * 3600
    assert np.max(d) < 0.01  # < 0.01 arcsec


def test_fit_requires_three_points():
    with pytest.raises(ValueError):
        fit_tan_wcs([1, 2], [1, 2], [10, 11], [20, 21])
