"""Per-target diagnostic figures behind --plot.

Counterpart of the reference's plot-folder behavior: run_tessphot.py --plot
-> BasePhotometry.plot_folder (BasePhotometry.py:394-397) with the K2P2
5-panel (k2p2v2.py:664-744), PSF fit/residual (psf_photometry.py:178-185)
and halo weight-map (halo_photometry.py:229-241) figures.
"""

import glob
import os

import numpy as np
import pytest

from photometry_tpu.sim.simulator import SimConfig, simulate_sector
from photometry_tpu.prepare import prepare_photometry
from photometry_tpu.core.status import STATUS


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("diagplots"))
    sim = simulate_sector(SimConfig(shape=(96, 96), n_times=10, n_stars=12,
                                    seed=71, tmag_range=(4.8, 12.5)))
    sim.write_ffis(d)
    sim.write_catalog(d)
    prepare_photometry(d)
    from photometry_tpu.cli import todo_cmd
    assert todo_cmd.main(["-q", d]) == 0
    return sim, d


def _task_for(sim, d, starid, method=None):
    return {"starid": int(starid), "datasource": "ffi", "sector": 1,
            "camera": 3, "ccd": 2, "cadence": 1800, "method": method,
            "priority": 1, "tmag": float(sim.tmag[sim.starid == starid][0])}


def test_cli_plot_flag_aperture(setup):
    """--plot on the CLI produces sumimage + K2P2 5-panel for the target."""
    sim, d = setup
    from photometry_tpu.cli import photometry_cmd
    sid = int(sim.starid[3])
    rc = photometry_cmd.main(["-q", "--starid", str(sid), "--version", "5",
                              "--plot", d])
    assert rc == 0
    folder = os.path.join(d, "plots", f"{sid:011d}")
    assert os.path.isfile(os.path.join(folder, "sumimage.png"))
    assert os.path.isfile(os.path.join(folder, "masks_flux.png"))


@pytest.mark.parametrize("method", ["psf", "linpsf"])
def test_fit_residual_figures(setup, method):
    sim, d = setup
    from photometry_tpu.core.dispatcher import open_context, photometry_batch
    sid = int(sim.starid[4])
    task = _task_for(sim, d, sid, method)
    ctx = open_context(d, task)
    try:
        res = photometry_batch(ctx, [task], save=False, plot_folder=d)[0]
    finally:
        ctx.close()
    assert res.status in (STATUS.OK, STATUS.WARNING)
    folder = os.path.join(d, "plots", f"{sid:011d}")
    assert os.path.isfile(os.path.join(folder, "psf_fit.png"))
    assert os.path.isfile(os.path.join(folder, "sumimage.png"))


def test_halo_weightmap_figure(setup):
    sim, d = setup
    from photometry_tpu.core.dispatcher import open_context, photometry_batch
    sid = int(sim.starid[0])          # brightest (tmag ~4.8)
    task = _task_for(sim, d, sid, "halo")
    ctx = open_context(d, task)
    try:
        res = photometry_batch(ctx, [task], save=False, plot_folder=d)[0]
    finally:
        ctx.close()
    assert res.status in (STATUS.OK, STATUS.WARNING)
    folder = os.path.join(d, "plots", f"{sid:011d}")
    maps = glob.glob(os.path.join(folder, f"{sid}_weightmap_*.png"))
    assert len(maps) >= 1
