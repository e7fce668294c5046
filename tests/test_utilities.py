"""Tests of math utilities (counterpart of reference tests/test_utilities.py)."""

import numpy as np
import pytest

from photometry_tpu.utils import mathutils as mu


def test_mag2flux_roundtrip():
    mag = np.array([2.0, 10.0, 15.0])
    flux = np.asarray(mu.mag2flux(mag))
    np.testing.assert_allclose(np.asarray(mu.flux2mag(flux)), mag, rtol=1e-4)
    # Known value: at mag == zeropoint, flux == 1
    np.testing.assert_allclose(np.asarray(mu.mag2flux(mu.TESS_ZEROPOINT)), 1.0, rtol=1e-6)


def test_sphere_distance():
    assert np.asarray(mu.sphere_distance(0, 0, 90, 0)) == pytest.approx(90)
    assert np.asarray(mu.sphere_distance(90, 0, 0, 0)) == pytest.approx(90)
    assert np.asarray(mu.sphere_distance(0, -90, 0, 90)) == pytest.approx(180)
    assert np.asarray(mu.sphere_distance(45, 45, 45, 45)) == pytest.approx(0, abs=1e-6)
    assert np.asarray(mu.sphere_distance(33.2, 45.2, 33.2, -45.2)) == pytest.approx(90.4, rel=1e-6)


def test_coordtransforms_roundtrip():
    inp = np.array([[0, 0], [0, 90], [0, -90], [30, 0], [345, -87.5]], dtype=float)
    xyz = np.asarray(mu.radec_to_cartesian(inp))
    np.testing.assert_allclose(np.linalg.norm(xyz, axis=1), 1.0, rtol=1e-6)
    back = np.asarray(mu.cartesian_to_radec(xyz))
    # At the poles RA is degenerate; compare via sphere distance instead:
    for a, b in zip(inp, back):
        assert float(np.asarray(mu.sphere_distance(a[0], a[1], b[0], b[1]))) == pytest.approx(0, abs=1e-4)


def test_integrated_gaussian_matches_reference_values():
    X, Y = np.meshgrid(np.arange(-1, 2), np.arange(-1, 2))
    vals = np.asarray(mu.integrated_gaussian(X, Y, 10, 0, 0))
    expect = np.array([
        [0.58433556, 0.92564571, 0.58433556],
        [0.92564571, 1.46631496, 0.92564571],
        [0.58433556, 0.92564571, 0.58433556]])
    np.testing.assert_allclose(vals, expect, rtol=1e-5)


def test_proper_motion():
    # No proper motion -> unchanged:
    ra, dec = mu.add_proper_motion(45.0, 60.0, 0.0, 0.0, 2458351.5)
    assert float(ra) == pytest.approx(45.0)
    assert float(dec) == pytest.approx(60.0)
    # 1000 mas/yr in dec over ~18.6 years is ~5.17 arcsec:
    ra, dec = mu.add_proper_motion(45.0, 60.0, 0.0, 1000.0, 2458351.5)
    years = (2458351.5 - 2451544.5) / 365.25
    assert float(dec) - 60.0 == pytest.approx(years * 1000 / 3.6e6, rel=1e-3)


def test_rms_timescale():
    rng = np.random.default_rng(42)
    time = np.linspace(0, 27, 1000)
    flux = np.zeros(len(time))
    assert float(np.asarray(mu.rms_timescale(time, flux))) == pytest.approx(0)
    flux = rng.standard_normal(len(time))
    r = float(np.asarray(mu.rms_timescale(time, flux)))
    # ~1.5 points per hour-bin -> binned scatter ~ 1/sqrt(1.5) ~ 0.8
    assert 0.5 < r < 1.2
    # Binning to a 1-day timescale averages ~37 points -> much smaller RMS:
    r_day = float(np.asarray(mu.rms_timescale(time, flux, timescale=1.0)))
    assert r_day < 0.5 * r
    # All-NaN flux -> NaN
    assert np.isnan(float(np.asarray(mu.rms_timescale(time, np.full_like(flux, np.nan)))))
    # Host-path parity with reference utilities.py:242-252: invalid time
    # vector raises when the flux has valid samples...
    with pytest.raises(ValueError):
        mu.rms_timescale(np.full_like(time, np.nan), flux)
    with pytest.raises(ValueError):
        mu.rms_timescale(np.zeros(5), np.ones(5))  # zero span
    # ...but all-NaN flux short-circuits to NaN before the time check:
    assert np.isnan(float(np.asarray(
        mu.rms_timescale(np.full_like(time, np.nan), np.full_like(flux, np.nan)))))
    # and under jit (traced), the same invalid input returns NaN instead:
    import jax
    jitted = jax.jit(mu.rms_timescale)
    assert np.isnan(float(np.asarray(jitted(np.full_like(time, np.nan), flux))))


def test_moving_median_central_matches_host():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(50)
    x[7] = np.nan
    for width in (3, 5, 9):
        got = np.asarray(mu.moving_median_central(x, width))
        want = mu.np_moving_median_central(x, width)
        np.testing.assert_allclose(got, want, rtol=1e-6, equal_nan=True)


def test_find_nearest():
    arr = np.array([1.0, 2.0, np.nan, 4.0])
    assert int(mu.find_nearest(arr, 2.2)) == 1
    assert int(mu.find_nearest(arr, 3.9)) == 3


def test_polyfit_detrend():
    t = np.linspace(0, 10, 100)
    flux = 1.0 + 0.5 * t - 0.02 * t**2 + 0.001 * t**3
    err = np.full_like(t, 0.1)
    fit = np.asarray(mu.polyfit_detrend(t, flux, err))
    np.testing.assert_allclose(fit, flux, rtol=1e-3, atol=1e-3)
