"""Dispatcher deblend auto-switch: truncated blends re-run as linPSF.

VERDICT r3 #4: the tie-break corpus bounds blend-split |flux| deltas at up
to 23% vs the reference mask composition; flagging (FLFRCSAP) alone does
not fix the delivered light curve.  photometry_batch now re-runs aperture
targets whose mask completeness < [deblend] completeness_limit AND that
have a close catalog neighbour with linear-PSF photometry (the joint-fit
model has no truncation), mirroring the halo auto-switch machinery
(reference tessphot.py:86-111 pattern; linpsf_photometry.py:116-133 is the
reference's linPSF).
"""

import os
import sqlite3

import numpy as np

from photometry_tpu.core.status import STATUS
from photometry_tpu.sim.simulator import SimConfig, simulate_sector


def _crowded_sector(tmp_path):
    """Sector with deliberate split blends (3.5-6 px) + isolated stars.

    At psf_sigma 1.1 these separations keep the above-threshold blobs
    connected, so the watershed must SPLIT them — the regime where the
    tie-break corpus measures mask truncation (closer pairs stay merged in
    one shared mask and are flagged by contamination instead).
    """
    H = W = 96
    stars = [(15.0, 15.0, 9.5), (15.0, 75.0, 9.8), (75.0, 15.0, 10.1)]
    pairs = []
    for i, sep in enumerate([3.5, 4.0, 4.5, 5.0, 5.5, 6.0]):
        r = 30.0 + 10.0 * (i % 3)
        c = 25.0 + 22.0 * (i // 3)
        pairs.append(((r, c), (r + sep * 0.7, c + sep * 0.714)))
    for (r1, c1), (r2, c2) in pairs:
        stars.append((r1, c1, 10.0))
        stars.append((r2, c2, 10.3))
    sim = simulate_sector(SimConfig(
        shape=(H, W), n_times=8, n_stars=len(stars), stars=tuple(stars),
        seed=23, jitter_amp=0.02, variable_fraction=0.0))
    d = str(tmp_path)
    sim.write_ffis(d)
    sim.write_catalog(d)
    from photometry_tpu.cli import prepare_cmd, todo_cmd
    assert prepare_cmd.main(["-q", d]) == 0
    assert todo_cmd.main(["-q", d]) == 0
    return sim, d


def test_deblend_autoswitch_to_linpsf(tmp_path):
    sim, d = _crowded_sector(tmp_path)
    from photometry_tpu.core.dispatcher import open_context, photometry_batch

    with sqlite3.connect(os.path.join(d, "todo.sqlite")) as conn:
        conn.row_factory = sqlite3.Row
        tasks = [dict(r) for r in conn.execute(
            "SELECT priority, starid, sector, camera, ccd, cadence, "
            "datasource, method, tmag FROM todolist "
            "WHERE datasource='ffi' ORDER BY priority;")]
    assert len(tasks) >= 8

    ctx = open_context(d, tasks[0])
    try:
        results = photometry_batch(ctx, tasks, save=False)
    finally:
        ctx.close()

    switched = [r for r in results if r.method == "linpsf"
                and any("switched to linPSF" in e
                        for e in r.details.get("errors", []))]
    assert switched, "no blend was auto-switched to linPSF"
    # every pair member is a significant blend within the radius -> switched:
    assert len(switched) == 12
    # the reroute keeps the aperture diagnostics:
    for r in switched:
        assert r.details.get("completeness") is not None
        assert r.details.get("nearest_significant_neighbour_px") <= 6.0
    # isolated stars never switch (wing loss is not a blend):
    for r in results:
        if r.details.get("nearest_neighbour_px") is None:
            assert r.method == "aperture"

    # Delivered-quality gate (VERDICT r3 #4): every delivered OK/WARNING
    # light curve — remaining apertures AND linPSF reruns — recovers the
    # injected mean flux to < 5% (vs the corpus' un-fixed worst case of 23%).
    deltas = []
    for r in results:
        if r.status not in (STATUS.OK, STATUS.WARNING) or not r.lightcurve:
            continue
        if r.method == "aperture" and r.details.get("contamination", 0.0) \
                and r.details["contamination"] > 0.25:
            continue  # merged-mask blends are flagged by contamination
        # (linPSF results are the target's own fitted flux — contamination
        # does not bias them, so they are always checked)
        idx = np.where(sim.starid == r.starid)[0][0]
        truth = float(sim.mean_flux_true[idx])
        got = float(np.nanmean(np.asarray(r.lightcurve["flux"], np.float64)))
        deltas.append((r.starid, r.method, abs(got - truth) / truth))
    assert len(deltas) >= 10
    worst = max(d_ for _, _, d_ in deltas)
    assert worst < 0.05, sorted(deltas, key=lambda x: -x[2])[:5]


def test_deblend_switch_respects_disable(tmp_path, monkeypatch):
    """completeness_limit = 0 disables the reroute entirely."""
    sim, d = _crowded_sector(tmp_path)
    from photometry_tpu.core import dispatcher as disp
    from photometry_tpu.io import settings as settings_mod

    base = settings_mod.load_settings()

    class _NoDeblend:
        def getfloat(self, section, option, fallback=None):
            if (section, option) == ("deblend", "completeness_limit"):
                return 0.0
            return base.getfloat(section, option, fallback=fallback)

        def getboolean(self, section, option, fallback=None):
            return base.getboolean(section, option, fallback=fallback)

    monkeypatch.setattr(disp, "load_settings", lambda: _NoDeblend())

    with sqlite3.connect(os.path.join(d, "todo.sqlite")) as conn:
        conn.row_factory = sqlite3.Row
        tasks = [dict(r) for r in conn.execute(
            "SELECT priority, starid, sector, camera, ccd, cadence, "
            "datasource, method, tmag FROM todolist "
            "WHERE datasource='ffi' ORDER BY priority;")]
    ctx = disp.open_context(d, tasks[0])
    try:
        results = disp.photometry_batch(ctx, tasks, save=False)
    finally:
        ctx.close()
    assert all(r.method != "linpsf" for r in results)
