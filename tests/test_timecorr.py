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
    # not degenerate (individual samples may legitimately cross zero):
    assert np.max(np.abs(corr)) > 60.0 / 86400


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
    """Shapiro+Einstein terms are tiny and full ~= Romer away from the Sun."""
    t = np.linspace(1325.0, 1326.0, 5)
    romer = np.asarray(tc.barycentric_correction(t, 65.0, -25.0))
    full = np.asarray(tc.barycentric_correction_full(t, 65.0, -25.0))
    extra = full - romer
    # Shapiro <= ~20 us; Einstein (site term) <= ~|r_geo| v_earth / c^2
    # ~ 80 us at apogee:
    assert np.all(np.abs(extra) < 120e-6 / 86400.0)   # < 120 us, in days
    assert np.all(np.abs(extra) > 0)
    # batched form:
    full_b = np.asarray(tc.barycentric_correction_full(
        t, np.array([65.0, 66.0]), np.array([-25.0, -25.0])))
    assert full_b.shape == (2, 5)


def test_einstein_term_parity(tc):
    """The Einstein clock term matches the reference's formulation
    (spice.py:424-428): dot(r_sc/geocentre, v_earth/SSB) / c^2 — computed
    here independently from the ephemeris tables — and is absent when the
    ephemeris carries no Earth positions."""
    t = np.linspace(1325.0, 1335.0, 9)
    jd = t + 2457000.0
    eph = tc.eph
    # independent reconstruction:
    full = np.asarray(tc.barycentric_correction_full(t, 65.0, -25.0))
    eph_noearth = SpacecraftEphemeris(time=eph.time, pos=eph.pos)
    tc2 = TimeCorrector(eph_noearth)
    base = np.asarray(tc2.barycentric_correction_full(t, 65.0, -25.0))
    got_einstein = (full - base) * 86400.0                       # seconds

    pos = tc.position(jd)
    earth = tc._interp_earth(jd)
    dt = 60.0 / 86400.0
    v_earth = (tc._interp_earth(jd + dt) - tc._interp_earth(jd - dt)) \
        / (2 * dt * 86400.0)
    want = np.sum((pos - earth) * v_earth, axis=1) / 299792.458**2
    np.testing.assert_allclose(got_einstein, want, rtol=1e-9, atol=1e-12)
    # physical scale: the synthetic TESS HEO reaches ~376,000 km apogee,
    # Earth moves ~30 km/s -> |Einstein| <= ~160 us, and it must move:
    assert np.max(np.abs(want)) < 160e-6
    assert np.ptp(want) > 1e-6


def test_pos_earth_roundtrip(tc, tmp_path):
    path = str(tmp_path / "eph.npz")
    tc.eph.save(path)
    back = SpacecraftEphemeris.load(path)
    assert back.pos_earth is not None
    np.testing.assert_array_equal(back.pos_earth, tc.eph.pos_earth)
    # tables without Earth positions load as None (pre-round-4 files):
    SpacecraftEphemeris(time=tc.eph.time, pos=tc.eph.pos).save(path)
    assert SpacecraftEphemeris.load(path).pos_earth is None


# Pinned regression values of the synthetic-ephemeris barycentric
# correction (reference tests/test_fixes.py:48-110 style: precomputed
# truth table).  These pin the *implementation* — interpolation, unit
# chain, dot product — against silent drift; the synthetic Earth model's
# absolute accuracy is bounded analytically at ~0.1 s (mean-longitude
# formula good to ~0.01 deg -> <= 499 s * sin(0.01 deg) ~ 0.09 s; the
# round-5 model also carries the Sun-SSB barycentre offset from
# giant-planet Kepler elements, which the earlier heliocentric-only model
# omitted at up to 2.5 s absolute error), well inside the reference's
# 0.5 s fixes-scale tolerance.  Independent physics cross-validation:
# tests/test_ephemeris_golden.py.
_REGRESSION = [
    # (btjd_nocorr, ra, dec, timecorr_days)
    (1325.0, 65.0, -25.0, -0.0016611966428264),
    (1330.0, 65.0, -25.0, -0.0013556866028844),
    (1340.0, 65.0, -25.0, -0.0006850829591080),
    (1330.0, 0.0, 0.0, 0.0035423731920687),
    (1330.0, 180.0, 60.0, -0.0033646995481974),
    (1330.0, 280.0, -30.0, 0.0050765920535354),
]


def test_barycentric_regression_table(tc):
    for btjd, ra, dec, want in _REGRESSION:
        got = float(np.asarray(tc.barycentric_correction(
            np.array([btjd]), ra, dec))[0])
        assert got == pytest.approx(want, abs=1e-12), (btjd, ra, dec)
