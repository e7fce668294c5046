"""Tests of the single-star dispatcher API and PSF likelihood variants."""

import numpy as np
import pytest

from photometry_tpu.sim.simulator import SimConfig, simulate_sector
from photometry_tpu.prepare import prepare_photometry
from photometry_tpu.core.status import STATUS

SIGMA = 1.1


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("disp"))
    sim = simulate_sector(SimConfig(shape=(96, 96), n_times=8, n_stars=10,
                                    seed=33, tmag_range=(8.5, 12.0),
                                    psf_sigma=SIGMA))
    sim.write_ffis(d)
    sim.write_catalog(d)
    prepare_photometry(d)
    return sim, d


def test_photometry_single(setup, tmp_path):
    from photometry_tpu.core.dispatcher import photometry_single
    sim, d = setup
    res = photometry_single(int(sim.starid[2]), d, datasource="ffi",
                            sector=1, camera=3, ccd=2,
                            output_folder=str(tmp_path), version=2)
    assert res.status in (STATUS.OK, STATUS.WARNING)
    assert res.method == "aperture"
    assert "filepath_lightcurve" in res.details
    import os
    assert os.path.exists(res.details["filepath_lightcurve"])
    ratio = np.nanmedian(res.lightcurve["flux"] / sim.flux_true[2])
    assert 0.7 < ratio < 1.2


def test_photometry_single_explicit_methods(setup):
    from photometry_tpu.core.dispatcher import photometry_single
    sim, d = setup
    for method in ("psf", "linpsf"):
        res = photometry_single(int(sim.starid[3]), d, method=method,
                                datasource="ffi", sector=1, camera=3, ccd=2,
                                save=False)
        assert res.method == method
        assert res.status in (STATUS.OK, STATUS.WARNING)


def test_photometry_single_invalid_method(setup):
    from photometry_tpu.core.dispatcher import photometry_single
    sim, d = setup
    res = photometry_single(int(sim.starid[0]), d, method="bogus",
                            datasource="ffi", sector=1, camera=3, ccd=2,
                            save=False)
    # Invalid methods degrade to an ERROR result (batch never raises):
    assert res.status == STATUS.ERROR
    assert any("Invalid method" in e for e in res.details.get("errors", []))


@pytest.mark.parametrize("stat", ["Gaussian_d", "Gaussian_m", "Poisson"])
def test_psf_likelihood_variants(setup, stat):
    from photometry_tpu.core.engine import SectorContext
    from photometry_tpu.models.prf import PRF
    from photometry_tpu.models.psf_fit import extract_psf_batch
    sim, d = setup
    ctx = SectorContext(d, 1, 3, 2)
    res = extract_psf_batch(ctx, [int(sim.starid[1])],
                            lhood_stat=stat, prf=PRF.gaussian(sigma=SIGMA))[0]
    assert res.status in (STATUS.OK, STATUS.WARNING)
    ratio = np.nanmedian(res.lightcurve["flux"] / sim.flux_true[1])
    assert 0.8 < ratio < 1.2, f"{stat}: {ratio}"
    ctx.close()


def test_psf_invalid_stat(setup):
    from photometry_tpu.core.engine import SectorContext
    from photometry_tpu.models.psf_fit import extract_psf_batch
    sim, d = setup
    ctx = SectorContext(d, 1, 3, 2)
    with pytest.raises(ValueError):
        extract_psf_batch(ctx, [int(sim.starid[1])], lhood_stat="nope")
    ctx.close()


def test_warning_capture_into_errors(setup, monkeypatch):
    """Warnings logged during photometry land in details['errors']
    (reference ListHandler, BasePhotometry.py:171-179, 1409-1414)."""
    import logging
    from photometry_tpu.core import dispatcher
    sim, d = setup
    orig = dispatcher._run_method

    def noisy(ctx, starids, method, **kw):
        logging.getLogger("photometry_tpu.models.test").warning(
            "synthetic warning %d", 42)
        return orig(ctx, starids, method, **kw)

    monkeypatch.setattr(dispatcher, "_run_method", noisy)
    res = dispatcher.photometry_single(int(sim.starid[4]), d, datasource="ffi",
                                       sector=1, camera=3, ccd=2, save=False)
    errors = res.details.get("errors", [])
    assert any("WARNING: synthetic warning 42" in e for e in errors), errors


def test_context_cache_reuse_and_eviction(setup):
    """FFI contexts are reused across same-CCD fetches (the cube upload is
    the per-batch cost the cache removes); distinct CCD keys evict at
    capacity; TPF requests bypass the cache."""
    from photometry_tpu.core.dispatcher import ContextCache
    sim, d = setup
    task = {"datasource": "ffi", "sector": 1, "camera": 3, "ccd": 2}
    with ContextCache(capacity=1) as cache:
        c1, cached1 = cache.get(d, task)
        assert cached1
        c2, cached2 = cache.get(d, task)
        assert c2 is c1 and cached2
