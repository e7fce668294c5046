"""Tests of TV-min halo photometry (counterpart of reference tests/test_halo.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from photometry_tpu.models.halo import tvmin_weights, find_split_times, extract_halo_batch
from photometry_tpu.sim.simulator import SimConfig, simulate_sector
from photometry_tpu.prepare import prepare_photometry
from photometry_tpu.core.engine import SectorContext
from photometry_tpu.core.status import STATUS


def test_tvmin_downweights_noisy_pixels():
    """TV-min must shift weight to the pixels with the cleanest signal."""
    rng = np.random.default_rng(3)
    T, P = 200, 10
    signal = 1.0 + 0.01 * np.sin(np.linspace(0, 8 * np.pi, T))
    fn = np.empty((T, P))
    for p in range(P):
        noise = 0.001 if p < 5 else 0.1   # pixels 5..9 are junk
        fn[:, p] = signal * (1 + rng.normal(0, noise, T))
    w, tv = tvmin_weights(jnp.asarray(fn, jnp.float32), jnp.ones(T, bool))
    w = np.asarray(w)
    assert w.sum() == pytest.approx(1.0, rel=1e-5)
    assert w[:5].sum() > 0.9
    # The weighted flux tracks the signal better than a plain mean:
    F = fn @ w
    Fm = fn.mean(axis=1)
    assert np.std(F - signal) < 0.3 * np.std(Fm - signal)


def test_tvmin_batch_padding_parity():
    """The batched production path (padded pixel axes + masked softmax)
    must match per-target tvmin_weights on the unpadded matrices: the
    descent is deterministic and masked logits pin padded weights to 0, so
    weights and objectives agree to f32 reduction-order tolerance."""
    from photometry_tpu.models.halo import tvmin_weights_batch
    rng = np.random.default_rng(11)
    T = 150
    sizes = (7, 12, 5)                       # heterogeneous pixel counts
    Ppad = 16
    signal = 1.0 + 0.02 * np.sin(np.linspace(0, 6 * np.pi, T))
    fns, goods = [], []
    for i, P in enumerate(sizes):
        fn = signal[:, None] * (1 + rng.normal(0, 0.01, (T, P)))
        good = np.ones(T, bool)
        good[rng.integers(0, T, 5 + 3 * i)] = False   # per-target cadence masks
        fns.append(fn.astype(np.float32))
        goods.append(good)
    fn_pad = np.ones((len(sizes), T, Ppad), np.float32)
    pix_ok = np.zeros((len(sizes), Ppad), bool)
    for i, fn in enumerate(fns):
        fn_pad[i, :, :fn.shape[1]] = fn
        pix_ok[i, :fn.shape[1]] = True
    w_b, tv_b = tvmin_weights_batch(jnp.asarray(fn_pad),
                                    jnp.asarray(np.stack(goods)),
                                    jnp.asarray(pix_ok))
    w_b, tv_b = np.asarray(w_b), np.asarray(tv_b)
    for i, (fn, good) in enumerate(zip(fns, goods)):
        w_i, tv_i = tvmin_weights(jnp.asarray(fn), jnp.asarray(good))
        P = fn.shape[1]
        np.testing.assert_allclose(w_b[i, :P], np.asarray(w_i),
                                   rtol=5e-4, atol=1e-6)
        assert np.all(w_b[i, P:] == 0.0), "padded pixels must get weight 0"
        assert w_b[i].sum() == pytest.approx(1.0, rel=1e-5)
        assert tv_b[i] == pytest.approx(float(tv_i), rel=1e-3)


def test_find_split_times_sector_table():
    t = np.linspace(1330, 1355, 100)
    s = find_split_times(1, t, np.zeros(100))
    # Only splits inside the time range are kept:
    assert s == (1339.0, 1347.366, 1349.315)
    s = find_split_times(2, t, np.zeros(100))
    assert s is None  # 1368 outside the range


def test_find_split_times_gap_finder():
    # Sector with no table entry and a mid-series gap:
    t = np.concatenate([np.linspace(2000, 2012, 50), np.linspace(2014, 2026, 50)])
    s = find_split_times(42, t, np.zeros(100))
    assert s is not None and len(s) == 1
    assert 2012 < s[0] < 2014
    # No gap -> no split:
    t2 = np.linspace(2000, 2026, 100)
    assert find_split_times(42, t2, np.zeros(100)) is None


@pytest.fixture(scope="module")
def halo_setup(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("halo"))
    # One bright star (tmag ~4.8) in the field:
    sim = simulate_sector(SimConfig(shape=(96, 96), n_times=20, n_stars=12,
                                    seed=61, tmag_range=(4.8, 12.0)))
    sim.write_ffis(d)
    sim.write_catalog(d)
    prepare_photometry(d)
    ctx = SectorContext(d, 1, 3, 2)
    return sim, ctx


def test_halo_extraction(halo_setup):
    sim, ctx = halo_setup
    sid = int(sim.starid[0])  # brightest
    res = extract_halo_batch(ctx, [sid])[0]
    assert res.status == STATUS.OK
    assert res.method == "halo"
    lc = res.lightcurve
    n_finite = np.isfinite(lc["flux"]).sum()
    assert n_finite >= 18
    # Scaled to the expected flux level of the target:
    from photometry_tpu.utils.mathutils import mag2flux
    expect = float(np.asarray(mag2flux(sim.tmag[0])))
    assert np.nanmedian(lc["flux"]) == pytest.approx(expect, rel=0.3)
    # Relative variability of the halo curve tracks the injected signal:
    rel = lc["flux"] / np.nanmedian(lc["flux"])
    truth = sim.flux_true[0] / sim.flux_true[0].mean()
    good = np.isfinite(rel)
    if np.std(truth) > 1e-4:
        c = np.corrcoef(rel[good], truth[good])[0, 1]
        assert c > 0.5
    # Weightmap recorded for the FITS product:
    wm = res.details["halo_weightmap"]
    assert wm["weightmap"].shape[0] == len(wm["initial_cadence"])
    assert np.isfinite(lc["flux_err"][np.isfinite(lc["flux"])]).all()


def test_halo_in_dispatcher_and_save(halo_setup, tmp_path):
    from photometry_tpu.core.dispatcher import photometry_batch
    from photometry_tpu.io import fits as pf
    sim, ctx = halo_setup
    task = {"starid": int(sim.starid[0]), "datasource": "ffi", "method": "halo",
            "sector": 1, "camera": 3, "ccd": 2, "cadence": 1800, "priority": 1}
    res = photometry_batch(ctx, [task], output_folder=str(tmp_path), version=1)[0]
    assert res.status == STATUS.OK
    path = res.details["filepath_lightcurve"]
    hdus = pf.read_fits(path)
    names = [h.name for h in hdus]
    assert "WEIGHTMAP" in names
    wm = hdus[names.index("WEIGHTMAP")]
    assert wm.data["WEIGHTMAP"].ndim == 3


@pytest.mark.parametrize("objective", ["tv", "tv_o2", "l2v", "l3v"])
def test_tvmin_objective_variants(objective):
    """Every halophot objective variant converges to the clean pixels
    (halo_photometry.py:87-97 objective option)."""
    rng = np.random.default_rng(4)
    T, P = 150, 8
    signal = 1.0 + 0.01 * np.sin(np.linspace(0, 6 * np.pi, T))
    fn = np.empty((T, P))
    for p in range(P):
        noise = 0.001 if p < 4 else 0.1
        fn[:, p] = signal * (1 + rng.normal(0, noise, T))
    w, val = tvmin_weights(jnp.asarray(fn, jnp.float32), jnp.ones(T, bool),
                           objective=objective)
    w = np.asarray(w)
    assert w.sum() == pytest.approx(1.0, rel=1e-5)
    assert w[:4].sum() > 0.8, f"{objective}: weights {w}"
    assert np.isfinite(float(val))


def test_tvmin_invalid_objective():
    with pytest.raises(ValueError, match="Invalid halo objective"):
        tvmin_weights(jnp.ones((10, 3)), jnp.ones(10, bool), objective="nope")


def test_halo_objective_and_sigclip_on_saturated_sim(halo_setup):
    """Objective/sigclip options flow through extraction; SAT_PIXELS counts
    pixels above the saturation flux (halo_photometry.py:210-226)."""
    from photometry_tpu.models import halo as halo_mod
    sim, ctx = halo_setup
    bright = int(sim.starid[np.argmin(sim.tmag)])
    for objective in ("tv_o2", "l2v"):
        res = extract_halo_batch(ctx, [bright], maxiter=41,
                                 objective=objective, sigclip=True)[0]
        assert res.status == STATUS.OK
        assert res.additional_headers["HALO_OBJ"][0] == objective
        assert res.additional_headers["HALO_SCL"][0] is True
        wm = res.details["halo_weightmap"]
        assert all(s >= 0 for s in wm["sat_pixels"])

    # Saturate the cube around the target and check SAT_PIXELS > 0:
    import jax.numpy as jnp2
    tgt = ctx.catalog.target(bright)
    row, col = ctx.target_position(tgt["ra"], tgt["decl"])
    r, c = int(round(row)), int(round(col))
    images = np.array(ctx.images)  # writable copy
    images[:, r - 1:r + 2, c - 1:c + 2] = 2.0 * halo_mod.SATURATION_FLUX
    old = ctx.images
    ctx.images = jnp2.asarray(images)
    try:
        res = extract_halo_batch(ctx, [bright], maxiter=21)[0]
        wm = res.details["halo_weightmap"]
        assert all(s >= 9 for s in wm["sat_pixels"]), wm["sat_pixels"]
    finally:
        ctx.images = old


def test_halo_switch_queue_defers_and_flushes(halo_setup, tmp_path, monkeypatch):
    """Deferred halo switching (VERDICT r4 #4): candidates accumulate across
    lease batches and rerun as ONE halo batch, with the same decoration as
    the inline switch (reference tessphot.py:86-111)."""
    import glob
    import os
    from photometry_tpu.core import dispatcher as disp

    sim, ctx = halo_setup
    bright = [int(s) for s in sim.starid[np.argsort(sim.tmag)[:2]]]
    # Force the switch condition for our two brightest targets:
    monkeypatch.setattr(
        disp, "_needs_halo_switch",
        lambda res, tmag_limit, flux_limit: res.starid in bright)

    def task(sid, prio):
        return {"starid": sid, "datasource": "ffi", "sector": 1, "camera": 3,
                "ccd": 2, "cadence": 1800, "priority": prio, "method": None,
                "tmag": float(sim.tmag[sim.starid == sid][0])}

    hq = disp.HaloSwitchQueue(min_flush=2)
    out = str(tmp_path / "lc")

    # Batch 1: candidate deferred, nothing written, result flagged:
    res1 = disp.photometry_batch(ctx, [task(bright[0], 1)],
                                 output_folder=out, version=1, halo_queue=hq)[0]
    assert res1.details.get("halo_switch_deferred")
    assert hq.pending == 1 and not hq.should_flush()
    assert not glob.glob(os.path.join(out, "*.fits.gz"))

    # Batch 2: second candidate reaches min_flush:
    disp.photometry_batch(ctx, [task(bright[1], 2)],
                          output_folder=out, version=1, halo_queue=hq)
    assert hq.pending == 2 and hq.should_flush()
    flushed = hq.flush()
    assert hq.pending == 0
    assert sorted(int(t["starid"]) for t, _ in flushed) == sorted(bright)
    for t, res in flushed:
        assert res.method == "halo"
        assert res.status in (STATUS.OK, STATUS.WARNING)
        assert any("Automatically switched to Halo" in e
                   for e in res.details["errors"])
        assert not res.details.get("halo_switch_deferred")
        assert os.path.exists(res.details["filepath_lightcurve"])
    # Flushed fluxes match a direct batched halo run on the same context:
    direct = extract_halo_batch(ctx, [int(t["starid"]) for t, _ in flushed])
    for (t, res), ref in zip(flushed, direct):
        np.testing.assert_allclose(res.lightcurve["flux"], ref.lightcurve["flux"],
                                   rtol=1e-5, equal_nan=True)

    # Context pinning: a task from another CCD must force a flush first:
    assert hq.matches(task(bright[0], 9))
    other = dict(task(bright[0], 9), ccd=1)
    hq.add(ctx, task(bright[0], 9), res1, save=False)
    assert not hq.matches(other)
    assert len(hq.flush(force=True)) == 1
