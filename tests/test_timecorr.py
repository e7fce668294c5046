"""Tests of the ephemeris-based barycentric time correction."""

import numpy as np
import pytest

from photometry_tpu.core.timecorr import SpacecraftEphemeris, TimeCorrector, AU_KM


@pytest.fixture(scope="module")
def tc():
    eph = SpacecraftEphemeris.synthetic(2458300.0, 2458400.0, step_days=0.25)
    return TimeCorrector(eph)


def test_correction_magnitude(tc):
    """Romer delay must be bounded by the light travel time of 1 AU (~8.3 min)."""
    t = np.linspace(1325.0, 1353.0, 50)
    corr = np.asarray(tc.barycentric_correction(t, 65.0, -25.0))
    assert corr.shape == (50,)
    assert np.all(np.abs(corr) < 520.0 / 86400)  # < ~8.7 minutes
    assert np.all(np.abs(corr) > 1.0 / 86400)    # but not degenerate


def test_opposite_directions_cancel(tc):
    """Corrections toward opposite sky directions are equal and opposite."""
    t = np.array([1330.0])
    c1 = float(np.asarray(tc.barycentric_correction(t, 100.0, 30.0))[0])
    c2 = float(np.asarray(tc.barycentric_correction(t, 280.0, -30.0))[0])
    assert c1 == pytest.approx(-c2, rel=1e-9)


def test_batched_over_targets(tc):
    t = np.linspace(1325.0, 1353.0, 20)
    ra = np.array([10.0, 100.0, 200.0])
    dec = np.array([-60.0, 0.0, 60.0])
    corr = np.asarray(tc.barycentric_correction(t, ra, dec))
    assert corr.shape == (3, 20)
    # Each row matches the scalar computation:
    for i in range(3):
        single = np.asarray(tc.barycentric_correction(t, float(ra[i]), float(dec[i])))
        np.testing.assert_allclose(corr[i], single, rtol=1e-12)


def test_differential_correction_small_across_ccd(tc):
    """Across a 12-degree CCD the differential correction is < 1.5 minutes."""
    t = np.array([1330.0])
    c1 = float(np.asarray(tc.barycentric_correction(t, 60.0, -30.0))[0])
    c2 = float(np.asarray(tc.barycentric_correction(t, 72.0, -30.0))[0])
    assert abs(c1 - c2) < 90.0 / 86400
    assert abs(c1 - c2) > 0  # but nonzero — it is position dependent


def test_annual_modulation(tc):
    """The correction toward the ecliptic varies over the ephemeris span."""
    t = np.linspace(1310.0, 1390.0, 30)
    corr = np.asarray(tc.barycentric_correction(t, 0.0, 0.0))
    assert corr.max() - corr.min() > 20.0 / 86400


def test_apply_and_roundtrip(tc, tmp_path):
    t = np.linspace(1325.0, 1326.0, 5)
    t2, corr = tc.apply(t, 65.0, -25.0)
    np.testing.assert_allclose(np.asarray(t2), t + np.asarray(corr), rtol=1e-12)
    # Save/load ephemeris:
    p = str(tmp_path / "eph.npz")
    tc.eph.save(p)
    eph2 = SpacecraftEphemeris.load(p)
    np.testing.assert_allclose(eph2.pos, tc.eph.pos)
    tc2 = TimeCorrector(eph2)
    c1 = np.asarray(tc.barycentric_correction(t, 65.0, -25.0))
    c2 = np.asarray(tc2.barycentric_correction(t, 65.0, -25.0))
    np.testing.assert_allclose(c1, c2, rtol=1e-12)


def test_earth_distance_sane():
    eph = SpacecraftEphemeris.synthetic(2458300.0, 2458310.0)
    r = np.linalg.norm(eph.pos, axis=1)
    assert np.all(r > 0.97 * AU_KM)
    assert np.all(r < 1.03 * AU_KM)


def test_position_velocity(tc):
    """Velocity from finite differences is orbital-speed sized (~30 km/s)."""
    pos, vel = tc.position_velocity(2458350.0)
    assert pos.shape == (1, 3) and vel.shape == (1, 3)
    speed = np.linalg.norm(vel[0])
    assert 20.0 < speed < 40.0


def test_time_coverage(tc):
    lo, hi = tc.time_coverage()
    assert lo < hi
    assert lo <= 2458350.0 <= hi


def test_sclk2jd_linear_model(tc):
    jd = tc.sclk2jd(86400.0)
    assert jd == 2457001.0
    jd2 = tc.sclk2jd(np.array([0.0, 43200.0]), epoch_jd=2458000.0)
    np.testing.assert_allclose(jd2, [2458000.0, 2458000.5])


def test_full_correction_romer_plus_shapiro(tc):
    """Shapiro term is tiny (<~50 us) and full ~= Romer away from the Sun."""
    t = np.linspace(1325.0, 1326.0, 5)
    romer = np.asarray(tc.barycentric_correction(t, 65.0, -25.0))
    full = np.asarray(tc.barycentric_correction_full(t, 65.0, -25.0))
    dshap = full - romer
    assert np.all(np.abs(dshap) < 100e-6 / 86400.0)   # < 100 us, in days
    assert np.all(np.abs(dshap) > 0)
    # batched form:
    full_b = np.asarray(tc.barycentric_correction_full(
        t, np.array([65.0, 66.0]), np.array([-25.0, -25.0])))
    assert full_b.shape == (2, 5)
