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
