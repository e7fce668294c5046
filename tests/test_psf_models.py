"""Tests of the PRF model, nonlinear PSF fit and linear PSF photometry.

Counterpart of reference tests/test_psf.py plus the (skipped-in-reference)
PSF/linPSF end-to-end tests — with truth assertions via the simulator.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from photometry_tpu.models.prf import PRF
from photometry_tpu.sim.simulator import SimConfig, simulate_sector
from photometry_tpu.prepare import prepare_photometry
from photometry_tpu.core.engine import SectorContext
from photometry_tpu.core.status import STATUS

SIGMA = 1.1


@pytest.fixture(scope="module")
def prf():
    return PRF.gaussian(sigma=SIGMA)


def test_prf_pixel_fraction_matches_integrated_gaussian(prf):
    from photometry_tpu.utils.mathutils import integrated_gaussian
    # Fractions at a grid of offsets must match the analytic pixel integral:
    dr = np.linspace(-3, 3, 13)
    dc = np.linspace(-3, 3, 13)
    got = np.asarray(prf.pixel_fraction(dr[:, None], dc[None, :]))
    want = np.asarray(integrated_gaussian(dc[None, :], dr[:, None], 1.0, 0.0, 0.0, SIGMA))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_prf_integrate_to_image_flux_conservation(prf):
    img = np.asarray(prf.integrate_to_image(
        np.array([[10.0, 11.0, 1000.0]]), (21, 21), cutoff_radius=8.0))
    assert img.sum() == pytest.approx(1000.0, rel=1e-3)
    # Peak at the star position:
    assert np.unravel_index(img.argmax(), img.shape) == (10, 11)


def test_prf_cutoff_radius(prf):
    img = np.asarray(prf.integrate_to_image(
        np.array([[10.0, 10.0, 1000.0]]), (21, 21), cutoff_radius=3.0))
    assert img[10, 16] == 0.0
    assert img[10, 12] > 0


def test_prf_mat_roundtrip(prf, tmp_path):
    """Write a reference-layout .mat PRF and load it back."""
    # Build an oversampled Gaussian PRF grid (density, not integrated):
    oversample, radius = 9, 8.0
    n = int(radius * oversample)
    offs = np.arange(-n, n + 1) / oversample
    g = np.exp(-0.5 * (offs[:, None] ** 2 + offs[None, :] ** 2) / SIGMA ** 2)
    g /= g.sum() * (1 / oversample) ** 2
    path = str(tmp_path / "tess-test-3-2-characterized-prf.mat")
    PRF.write_mat(path, [g, g * 1.0], ccd_columns=[0.0, 2048.0], ccd_rows=[0.0, 2048.0])
    loaded = PRF.from_mat(path, sector=1, camera=3, ccd=2, stamp=(0, 15, 0, 15))
    img = np.asarray(loaded.integrate_to_image(
        np.array([[7.0, 7.0, 100.0]]), (15, 15), cutoff_radius=None))
    assert img.sum() == pytest.approx(100.0, rel=0.01)
    want = np.asarray(prf.integrate_to_image(
        np.array([[7.0, 7.0, 100.0]]), (15, 15), cutoff_radius=None))
    np.testing.assert_allclose(img, want, atol=0.2)


def test_prf_design_matrix(prf):
    A = np.asarray(prf.design_matrix(np.array([5.0, 9.0]), np.array([5.0, 9.0]),
                                     (15, 15)))
    assert A.shape == (225, 2)
    np.testing.assert_allclose(A.sum(axis=0), [1.0, 1.0], rtol=2e-2)


@pytest.fixture(scope="module")
def psf_setup(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("psf"))
    sim = simulate_sector(SimConfig(shape=(96, 96), n_times=12, n_stars=18,
                                    seed=51, tmag_range=(8.0, 12.5),
                                    psf_sigma=SIGMA))
    sim.write_ffis(d)
    sim.write_catalog(d)
    prepare_photometry(d)
    ctx = SectorContext(d, 1, 3, 2)
    return sim, ctx


def test_psf_fit_recovers_truth(psf_setup, prf):
    from photometry_tpu.models.psf_fit import extract_psf_batch
    sim, ctx = psf_setup
    sids = [int(s) for s in sim.starid[:6]]
    results = extract_psf_batch(ctx, sids, prf=prf)
    assert len(results) == 6
    n_good = 0
    for i, r in enumerate(results):
        assert r.status in (STATUS.OK, STATUS.WARNING)
        ratio = np.nanmedian(r.lightcurve["flux"] / sim.flux_true[i])
        # PSF fit recovers total flux (not aperture-limited):
        if 0.9 < ratio < 1.1:
            n_good += 1
        # errors are finite (improvement over reference NaN):
        assert np.all(np.isfinite(r.lightcurve["flux_err"]))
        # fitted position lands on the star:
        cx = np.nanmedian(r.lightcurve["pos_centroid"][:, 0])
        cy = np.nanmedian(r.lightcurve["pos_centroid"][:, 1])
        assert abs(cx - (sim.col_ref[i] + 1)) < 0.7
        assert abs(cy - (sim.row_ref[i] + 1)) < 0.7
    assert n_good >= 5


def test_psf_fit_tracks_variability(psf_setup, prf):
    from photometry_tpu.models.psf_fit import extract_psf_batch
    sim, ctx = psf_setup
    amps = sim.flux_true.std(axis=1) / sim.flux_true.mean(axis=1)
    var_idx = int(np.argmax(amps))
    if amps[var_idx] < 0.005:
        pytest.skip("no variable star in this draw")
    r = extract_psf_batch(ctx, [int(sim.starid[var_idx])], prf=prf)[0]
    rel = r.lightcurve["flux"] / np.nanmedian(r.lightcurve["flux"]) - 1
    rel_truth = sim.flux_true[var_idx] / sim.flux_true[var_idx].mean() - 1
    c = np.corrcoef(rel, rel_truth)[0, 1]
    assert c > 0.9


def test_linpsf_recovers_truth(psf_setup, prf):
    from photometry_tpu.models.linpsf import extract_linpsf_batch
    sim, ctx = psf_setup
    sids = [int(s) for s in sim.starid[:6]]
    results = extract_linpsf_batch(ctx, sids, prf=prf)
    n_good = 0
    for i, r in enumerate(results):
        assert r.status in (STATUS.OK, STATUS.WARNING)
        ratio = np.nanmedian(r.lightcurve["flux"] / sim.flux_true[i])
        if 0.85 < ratio < 1.15:
            n_good += 1
    assert n_good >= 5


def test_linpsf_contamination_reported(psf_setup, prf):
    from photometry_tpu.models.linpsf import extract_linpsf_batch
    sim, ctx = psf_setup
    r = extract_linpsf_batch(ctx, [int(sim.starid[0])], prf=prf)[0]
    assert "contamination" in r.details
    assert r.details["n_stars_fit"] >= 1


def test_dispatcher_psf_methods(psf_setup):
    from photometry_tpu.core.dispatcher import photometry_batch
    sim, ctx = psf_setup
    tasks = [{"starid": int(sim.starid[1]), "datasource": "ffi", "method": "psf",
              "sector": 1, "camera": 3, "ccd": 2, "cadence": 1800, "priority": 1},
             {"starid": int(sim.starid[2]), "datasource": "ffi", "method": "linpsf",
              "sector": 1, "camera": 3, "ccd": 2, "cadence": 1800, "priority": 2}]
    results = photometry_batch(ctx, tasks, save=False)
    assert results[0].method == "psf"
    assert results[1].method == "linpsf"
    for r in results:
        assert r.status in (STATUS.OK, STATUS.WARNING)


def test_psf_batching_groups_and_consistency(psf_setup, prf):
    """Multi-target PSF extraction runs bucketed+vmapped and agrees with
    single-target extraction (bucket NaN-padding is numerically transparent)."""
    from photometry_tpu.models.psf_fit import extract_psf_batch
    from photometry_tpu.models.psf_common import (bucket_psf_groups,
                                                  setup_psf_target)
    sim, ctx = psf_setup
    sids = [int(s) for s in sim.starid[:6]]
    setups = [setup_psf_target(ctx, sid) for sid in sids]
    groups = bucket_psf_groups(ctx, setups)
    # Bucketing keeps the number of compiled shapes small (<=2 per batch):
    assert len(groups) <= 2
    batched = extract_psf_batch(ctx, sids, prf=prf)
    singles = [extract_psf_batch(ctx, [sid], prf=prf)[0] for sid in sids[:3]]
    for one in singles:
        many = next(r for r in batched if r.starid == one.starid)
        np.testing.assert_allclose(many.lightcurve["flux"],
                                   one.lightcurve["flux"], rtol=1e-4)


def test_linpsf_batching_consistency(psf_setup, prf):
    from photometry_tpu.models.linpsf import extract_linpsf_batch
    sim, ctx = psf_setup
    sids = [int(s) for s in sim.starid[:5]]
    batched = extract_linpsf_batch(ctx, sids, prf=prf)
    singles = [extract_linpsf_batch(ctx, [sid], prf=prf)[0] for sid in sids[:3]]
    for one in singles:
        many = next(r for r in batched if r.starid == one.starid)
        np.testing.assert_allclose(many.lightcurve["flux"],
                                   one.lightcurve["flux"], rtol=1e-4)
        assert many.status == one.status


def test_table_prf_closed_form_jacobian_matches_jacfwd():
    """Calibrated-table PRFs now build the LM Jacobian in closed form
    (Catmull-Rom derivative weights on the shared axis slices,
    prf.render_separable_with_grads).  The whole fit must agree with the
    autodiff (jacfwd) formulation to float32 precision, and recover
    injected fluxes."""
    from photometry_tpu.models.psf_fit import fit_psf_timeseries_batch

    g = PRF.gaussian(sigma=1.2, oversample=9, radius=6.0)
    tab = PRF(g.iprf.copy(), g.oversample, g.center_x, g.center_y)
    assert tab._grid_separable and not tab.has_analytic_grads

    class ForceJacfwd:
        """Same PRF with the closed-form tags hidden -> jacfwd branch."""
        _grid_separable = False
        has_analytic_grads = False
        def __init__(self, p): object.__setattr__(self, "_p", p)
        def __getattr__(self, k):
            return getattr(object.__getattribute__(self, "_p"), k)
        def integrate_to_image(self, params, shape, cutoff_radius=5.0):
            # keep the separable render (only the Jacobian branch differs):
            return object.__getattribute__(self, "_p").integrate_to_image(
                params, shape, cutoff_radius)

    N, T, h, w, S = 3, 4, 13, 13, 2
    rng = np.random.default_rng(0)
    rows = jnp.asarray(6.0 + rng.uniform(-1.5, 1.5, (N, S)), jnp.float32)
    cols = jnp.asarray(6.0 + rng.uniform(-1.5, 1.5, (N, S)), jnp.float32)
    fx_true = jnp.asarray(rng.uniform(2000, 8000, (N, S)), jnp.float32)
    imgs = jnp.stack([tab.integrate_to_image(
        jnp.stack([rows[i], cols[i], fx_true[i]], 1), (h, w), 5.0)
        for i in range(N)])
    imgs = jnp.broadcast_to(imgs[:, None], (N, T, h, w))
    imgs = imgs + jnp.asarray(rng.normal(0, 0.5, (N, T, h, w)), jnp.float32)
    bkgs = jnp.zeros((N, T, h, w), jnp.float32)
    # perturbed init:
    p0 = jnp.concatenate([rows + 0.3, cols - 0.2, fx_true * 0.7], axis=1)
    valid = jnp.ones((N, S), bool)
    mini = jnp.ones((N, h, w), bool)
    tidx = jnp.zeros((N,), jnp.int32)

    out_new = fit_psf_timeseries_batch(imgs, bkgs, 1.0, p0, valid, mini,
                                       tidx, tab, (h, w), S)
    out_ref = fit_psf_timeseries_batch(imgs, bkgs, 1.0, p0, valid, mini,
                                       tidx, ForceJacfwd(tab), (h, w), S)
    np.testing.assert_allclose(np.asarray(out_new["params"]),
                               np.asarray(out_ref["params"]),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_new["flux"]),
                               np.asarray(out_ref["flux"]),
                               rtol=2e-4, atol=0.5)
    # truth recovery (MOMF-corrected flux ~ injected):
    ratio = np.asarray(out_new["flux"]).mean(axis=1) / np.asarray(fx_true[:, 0])
    assert np.all((ratio > 0.95) & (ratio < 1.05)), ratio


def test_context_prf_memoized_and_prefetch_consumable(psf_setup):
    """The prefetch pipeline regression (round 3): context_prf must return
    the SAME object per context (the jitted programs key statically on PRF
    identity, and the AOT cache keys on id(prf)), and a prefetch from the
    dispatcher thread must produce entries a later extract_psf_batch
    actually consumes."""
    from photometry_tpu.models.psf_common import context_prf
    from photometry_tpu.models.psf_fit import prefetch_psf_programs
    from photometry_tpu.utils import aot
    sim, ctx = psf_setup
    assert context_prf(ctx) is context_prf(ctx)

    aot.clear()
    sids = [int(s) for s in sim.starid[:3]]
    prefetch_psf_programs(ctx, sids)
    keys_before = set(aot._futures)
    assert keys_before, "prefetch submitted no compiles"
    from photometry_tpu.models.psf_fit import extract_psf_batch
    results = extract_psf_batch(ctx, sids)
    assert len(results) == 3
    # extraction reused the prefetched programs instead of adding new keys:
    assert set(aot._futures) == keys_before
    aot.clear()
