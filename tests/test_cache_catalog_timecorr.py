"""Tests: download-cache equivalent, TIC-extract catalogs, per-target timecorr."""

import os

import numpy as np
import pytest

from photometry_tpu.core.timecorr import SpacecraftEphemeris, TimeCorrector


def test_download_cache_offline(tmp_path, monkeypatch):
    monkeypatch.setenv("PHOTOMETRY_TPU_CACHE", str(tmp_path))
    monkeypatch.delenv("PHOTOMETRY_TPU_EPHEMERIS_URL", raising=False)
    from photometry_tpu.download_cache import download_cache, load_cached_ephemeris
    p = download_cache(testing=True)
    assert os.path.exists(p)
    eph = load_cached_ephemeris()
    # Covers sectors 1 and 27 reference times:
    from photometry_tpu.io.settings import sector_info
    for s in (1, 27):
        t = sector_info(s).reference_time
        assert eph.time[0] <= t <= eph.time[-1]
    # Idempotent:
    assert download_cache() == p


def test_download_cache_url_fetch(tmp_path, monkeypatch):
    """The real-ephemeris acquisition path: fetch a published table by URL."""
    src = tmp_path / "real_ephemeris.npz"
    t = np.arange(2458300.0, 2458400.0, 0.5)
    pos = np.stack([1.0e8 + 1e5 * t % 7, 2.0e7 + np.sin(t) * 1e5,
                    np.cos(t) * 1e5], axis=1)
    SpacecraftEphemeris(time=t, pos=pos).save(str(src))
    cache = tmp_path / "cache"
    monkeypatch.setenv("PHOTOMETRY_TPU_CACHE", str(cache))
    monkeypatch.setenv("PHOTOMETRY_TPU_EPHEMERIS_URL", src.as_uri())
    from photometry_tpu.download_cache import download_cache, load_cached_ephemeris
    p = download_cache()
    assert os.path.exists(p)
    eph = load_cached_ephemeris()
    np.testing.assert_array_equal(eph.time, t)
    np.testing.assert_array_equal(eph.pos, pos)


def test_horizons_sample_ingestion(tmp_path):
    """The shipped Horizons-format sample parses and drives a TimeCorrector
    (tools/make_ephemeris.py path; reference acquires SPICE kernels instead,
    spice.py:104-158)."""
    import photometry_tpu
    from photometry_tpu.download_cache import horizons_to_ephemeris
    sample = os.path.join(os.path.dirname(photometry_tpu.__file__),
                          "data", "ephemeris", "tess_horizons_sample.txt")
    out = str(tmp_path / "eph.npz")
    eph = horizons_to_ephemeris(sample, output=out)
    assert os.path.exists(out)
    assert len(eph.time) >= 50
    # Positions are SSB-centric, ~1 AU scale:
    r = np.linalg.norm(eph.pos, axis=1)
    assert 0.9e8 < r.mean() < 1.8e8
    # Drives barycentric corrections of the right magnitude (<= ~500 s):
    tc = TimeCorrector(eph)
    t = eph.time[5:-5] - 2457000.0
    corr = tc.barycentric_correction(t, ra=35.0, dec=-65.0)
    assert np.all(np.abs(corr) < 550.0 / 86400.0)
    assert np.std(corr) > 0  # actually varies along the orbit


def test_horizons_verbose_format_and_au_units(tmp_path):
    """Parser handles the default (non-CSV) Horizons block and AU units."""
    from photometry_tpu.download_cache import AU_KM, horizons_to_ephemeris
    text = """Output units    : AU-D
*******************************************************************************
$$SOE
2458324.500000000 = A.D. 2018-Jul-25 00:00:00.0000 TDB
 X = 5.000000000000000E-01 Y =-8.000000000000000E-01 Z = 1.000000000000000E-02
 VX= 1.0E-02 VY= 2.0E-03 VZ= 1.0E-04
2458325.500000000 = A.D. 2018-Jul-26 00:00:00.0000 TDB
 X = 5.100000000000000E-01 Y =-7.900000000000000E-01 Z = 1.100000000000000E-02
 VX= 1.0E-02 VY= 2.0E-03 VZ= 1.0E-04
$$EOE
"""
    src = tmp_path / "horizons_verbose.txt"
    src.write_text(text)
    eph = horizons_to_ephemeris(str(src))
    np.testing.assert_allclose(eph.time, [2458324.5, 2458325.5])
    np.testing.assert_allclose(eph.pos[0], np.array([0.5, -0.8, 0.01]) * AU_KM)
    np.testing.assert_allclose(eph.pos[1], np.array([0.51, -0.79, 0.011]) * AU_KM)
    # Garbage input raises:
    bad = tmp_path / "bad.txt"
    bad.write_text("no block here")
    with pytest.raises(ValueError):
        horizons_to_ephemeris(str(bad))


def test_make_ephemeris_cli(tmp_path):
    import subprocess, sys
    import photometry_tpu
    sample = os.path.join(os.path.dirname(photometry_tpu.__file__),
                          "data", "ephemeris", "tess_horizons_sample.txt")
    out = str(tmp_path / "cli_eph.npz")
    repo = os.path.dirname(os.path.dirname(photometry_tpu.__file__))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "make_ephemeris.py"),
         sample, "-o", out],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr
    assert "samples" in proc.stdout
    assert os.path.exists(out)


def test_download_cache_url_from_settings(tmp_path, monkeypatch):
    """[timecorr] ephemeris_url provisions the cache when no env URL is set."""
    src = tmp_path / "eph.npz"
    t = np.arange(2458300.0, 2458320.0, 0.5)
    pos = np.stack([t, t * 0 + 1e8, t * 0], axis=1)
    SpacecraftEphemeris(time=t, pos=pos).save(str(src))
    ini = tmp_path / "settings.ini"
    ini.write_text(f"[timecorr]\nephemeris_url = {src.as_uri()}\n")
    cache = tmp_path / "cache"
    monkeypatch.setenv("PHOTOMETRY_TPU_CACHE", str(cache))
    monkeypatch.delenv("PHOTOMETRY_TPU_EPHEMERIS_URL", raising=False)
    monkeypatch.setenv("PHOTOMETRY_TPU_SETTINGS", str(ini))
    from photometry_tpu.io.settings import load_settings
    load_settings.cache_clear()
    try:
        from photometry_tpu.download_cache import download_cache
        p = download_cache()
        with np.load(p) as d:
            np.testing.assert_array_equal(d["time"], t)
    finally:
        load_settings.cache_clear()


def test_make_catalog_from_tic_extract(tmp_path):
    from photometry_tpu.catalog import make_catalog, StarCatalog
    n = 12
    rng = np.random.default_rng(5)
    np.savez(str(tmp_path / "tic.npz"),
             starid=np.arange(1, n + 1), ra=rng.uniform(10, 12, n),
             dec=rng.uniform(-40, -38, n), pm_ra=np.zeros(n),
             pm_dec=np.zeros(n), tmag=rng.uniform(6, 14, n))
    path = make_catalog(str(tmp_path), 1, 1, 1, tic_source=str(tmp_path / "tic.npz"))
    with StarCatalog(path) as cat:
        assert len(cat) == n
        assert cat.settings.ticver == "tic-extract"
    with pytest.raises(ValueError):
        make_catalog(str(tmp_path), 1, 1, 2)


def test_per_target_time_correction(tmp_path):
    """SectorContext with a TimeCorrector produces position-dependent times."""
    from photometry_tpu.sim.simulator import SimConfig, simulate_sector
    from photometry_tpu.prepare import prepare_photometry
    from photometry_tpu.core.engine import SectorContext, extract_aperture_batch
    d = str(tmp_path)
    sim = simulate_sector(SimConfig(shape=(64, 64), n_times=6, n_stars=8, seed=81))
    sim.write_ffis(d)
    sim.write_catalog(d)
    prepare_photometry(d)
    eph = SpacecraftEphemeris.synthetic(2458300.0, 2458400.0)
    tc = TimeCorrector(eph)
    ctx = SectorContext(d, 1, 3, 2, time_corrector=tc)
    res = extract_aperture_batch(ctx, [int(sim.starid[0]), int(sim.starid[1])])
    t0 = res[0].lightcurve["time"]
    t1 = res[1].lightcurve["time"]
    tc0 = res[0].lightcurve["timecorr"]
    # Correction applied (non-zero) and position dependent:
    assert np.all(np.abs(tc0) > 0)
    # Position-dependent: neighbouring stars differ at the sub-second level,
    # but not by more than a minute across one CCD:
    assert np.max(np.abs(t0 - t1)) > 0.001 / 86400
    assert np.max(np.abs(t0 - t1)) < 60.0 / 86400
    ctx.close()


def test_open_context_default_barycentric(tmp_path, monkeypatch):
    """Production path (open_context) recomputes barycorr per target
    position by default, matching BasePhotometry.py:443-453; the TIME
    difference between two targets equals the differential Romer delay
    predicted by the wired corrector."""
    from photometry_tpu.sim.simulator import SimConfig, simulate_sector
    from photometry_tpu.prepare import prepare_photometry
    from photometry_tpu.core.dispatcher import (open_context,
                                                default_time_corrector)
    from photometry_tpu.core.engine import extract_aperture_batch
    monkeypatch.setenv("PHOTOMETRY_TPU_CACHE", str(tmp_path / "cache"))
    default_time_corrector.cache_clear()
    d = str(tmp_path)
    sim = simulate_sector(SimConfig(shape=(64, 64), n_times=6, n_stars=8, seed=82))
    sim.write_ffis(d)
    sim.write_catalog(d)
    prepare_photometry(d)
    task = {"datasource": "ffi", "sector": 1, "camera": 3, "ccd": 2}
    ctx = open_context(d, task, cache="host")
    try:
        assert ctx.time_corrector is not None
        sids = [int(sim.starid[0]), int(sim.starid[-1])]
        res = extract_aperture_batch(ctx, sids)
        t0, t1 = res[0].lightcurve["time"], res[1].lightcurve["time"]
        tc0, tc1 = res[0].lightcurve["timecorr"], res[1].lightcurve["timecorr"]
        # TIMECORR is per-target (differs between the two stars):
        assert np.any(tc0 != tc1)
        # TIME differs by the corrector's own differential Romer delay:
        tgt0 = ctx.catalog.target(sids[0])
        tgt1 = ctx.catalog.target(sids[1])
        t_nocorr = ctx.time - ctx.timecorr
        c0 = ctx.time_corrector.barycentric_correction(
            t_nocorr, tgt0["ra"], tgt0["decl"])
        c1 = ctx.time_corrector.barycentric_correction(
            t_nocorr, tgt1["ra"], tgt1["decl"])
        np.testing.assert_allclose(t0 - t1, c0 - c1, atol=1e-9)
        # ... and the sim header correction is consistent with the recomputed
        # one at the sub-second level (same ephemeris family, mid-CCD vs
        # per-target position):
        assert np.max(np.abs(tc0 - ctx.timecorr)) < 30.0 / 86400.0
    finally:
        ctx.close()
        default_time_corrector.cache_clear()


def test_timecorr_settings_gate(monkeypatch, tmp_path):
    """[timecorr] pertarget=False disables the default corrector."""
    import configparser
    from photometry_tpu.core import dispatcher
    cfg = configparser.ConfigParser()
    cfg.read_dict({"timecorr": {"pertarget": "False"}})
    monkeypatch.setattr(dispatcher, "load_settings", lambda: cfg)
    dispatcher.default_time_corrector.cache_clear()
    try:
        assert dispatcher.default_time_corrector() is None
    finally:
        dispatcher.default_time_corrector.cache_clear()



def test_query_footprint_ra0_straddle(tmp_path):
    """A footprint straddling RA=0 must return exactly the stars in its
    own RA band (round-3 review find: the reference-mirrored trigger only
    fired when a corner sat within the buffer of the line, so a generic
    straddle ran the plain BETWEEN query and returned the COMPLEMENT)."""
    import sqlite3
    import numpy as np
    from photometry_tpu.catalog import make_catalog_from_arrays, query_footprint

    ras = np.array([359.7, 359.95, 0.05, 0.3, 90.0, 180.0, 270.0])
    n = len(ras)
    path = make_catalog_from_arrays(
        str(tmp_path / "catalog_sector001_camera1_ccd1.sqlite"),
        starid=np.arange(1, n + 1), ra_j2000=ras,
        dec_j2000=np.zeros(n), pm_ra=np.zeros(n), pm_dec=np.zeros(n),
        tmag=np.full(n, 10.0), sector=1, camera=1, ccd=1,
        reference_time=2458325.5, epoch=2000.0,
        camera_centre=(0.0, 0.0),
        footprint=np.array([[359.5, -1.0], [359.5, 1.0],
                            [0.5, 1.0], [0.5, -1.0]]))
    with sqlite3.connect(path) as conn:
        conn.row_factory = sqlite3.Row
        cur = conn.cursor()
        # straddling stamp: corners at 359.9 and 0.1 (NOT within the
        # ~0.03-deg buffer of the line -> the old trigger missed it):
        foot = np.array([[359.9, -0.5], [359.9, 0.5],
                         [0.1, 0.5], [0.1, -0.5]])
        got = sorted(r["starid"] for r in query_footprint(cur, foot))
        assert got == [2, 3], got
        # wider straddle:
        foot = np.array([[355.0, -0.5], [355.0, 0.5],
                         [5.0, 0.5], [5.0, -0.5]])
        got = sorted(r["starid"] for r in query_footprint(cur, foot))
        assert got == [1, 2, 3, 4], got
        # normal box away from the line still works:
        foot = np.array([[89.0, -0.5], [89.0, 0.5],
                         [91.0, 0.5], [91.0, -0.5]])
        got = sorted(r["starid"] for r in query_footprint(cur, foot))
        assert got == [5], got
