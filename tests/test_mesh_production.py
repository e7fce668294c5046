"""Multi-chip production path: the dispatcher on a mesh-sharded context.

VERDICT r3 #1: the sharded layer must be the *production* path, not a demo —
the full pipeline (K2P2 masks -> sharded extraction -> metrics -> FITS save)
runs on an 8-CPU-device (time x targets) mesh through the same
photometry_batch/CLI entry points users invoke, and the flux is
bit-identical to the single-device engine.  (Reference counterpart: the MPI
path IS the production path, run_tessphot_mpi.py:36-209.)
"""

import glob
import os
import sqlite3

import numpy as np
import pytest

from photometry_tpu.sim.simulator import SimConfig, simulate_sector


@pytest.fixture(scope="module")
def prepared_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mesh_e2e"))
    sim = simulate_sector(SimConfig(shape=(96, 96), n_times=10, n_stars=18,
                                    seed=77, tmag_range=(8.0, 13.0)))
    sim.write_ffis(d)
    sim.write_catalog(d)
    from photometry_tpu.cli import prepare_cmd, todo_cmd
    assert prepare_cmd.main(["-q", d]) == 0
    assert todo_cmd.main(["-q", d]) == 0
    return sim, d


def _ffi_tasks(d):
    with sqlite3.connect(os.path.join(d, "todo.sqlite")) as conn:
        conn.row_factory = sqlite3.Row
        rows = conn.execute(
            "SELECT priority, starid, sector, camera, ccd, cadence, "
            "datasource, method, tmag FROM todolist "
            "WHERE datasource='ffi' ORDER BY priority;").fetchall()
    return [dict(r) for r in rows]


def test_parse_mesh_spec():
    import jax
    from photometry_tpu.parallel.mesh import (TARGET_AXIS, TIME_AXIS,
                                              parse_mesh_spec)
    m = parse_mesh_spec("time=4,targets=2")
    assert m.shape[TIME_AXIS] == 4 and m.shape[TARGET_AXIS] == 2
    m = parse_mesh_spec("time=2")
    assert m.shape[TIME_AXIS] == 2 and m.shape[TARGET_AXIS] == 1
    m = parse_mesh_spec("auto")
    assert m.size == len(jax.devices())
    with pytest.raises(ValueError):
        parse_mesh_spec("rows=4")
    with pytest.raises(ValueError):
        parse_mesh_spec("time=999")


def test_mesh_batch_bitwise_vs_single_device(prepared_dir):
    """photometry_batch on a (4 time x 2 targets) mesh context produces
    bit-identical light curves to the single-device engine — including a
    time axis (T=10) that does NOT divide the mesh (padded to 12)."""
    sim, d = prepared_dir
    from photometry_tpu.core.dispatcher import open_context, photometry_batch
    from photometry_tpu.parallel.mesh import make_mesh

    tasks = _ffi_tasks(d)
    assert len(tasks) >= 8

    ctx1 = open_context(d, tasks[0])
    try:
        res1 = photometry_batch(ctx1, tasks, save=False)
    finally:
        ctx1.close()

    mesh = make_mesh(n_time=4, n_targets=2)
    ctx2 = open_context(d, tasks[0], mesh=mesh)
    assert ctx2.mesh is mesh
    # cube uploaded time-padded (10 -> 12) and sharded across the mesh:
    assert ctx2.images.shape[0] == 12 and ctx2.n_times == 10
    assert len(ctx2.images.sharding.device_set) == 8
    try:
        res2 = photometry_batch(ctx2, tasks, save=False)
    finally:
        ctx2.close()

    assert [r.status for r in res1] == [r.status for r in res2]
    n_checked = 0
    for r1, r2 in zip(res1, res2):
        assert r1.starid == r2.starid and r1.method == r2.method
        if not r1.lightcurve:
            continue
        for key in ("flux", "flux_err", "flux_background"):
            a = np.asarray(r1.lightcurve[key])
            b = np.asarray(r2.lightcurve[key])
            assert a.shape == b.shape == (10,)
            same = (a == b) | (np.isnan(a) & np.isnan(b))
            assert same.all(), (r1.starid, key, a, b)
        n_checked += 1
    assert n_checked >= 6


def test_mesh_cli_end_to_end(prepared_dir):
    """The --mesh CLI flag drives the full production pipeline (task leases,
    sharded extraction, FITS products, diagnostics) on the mesh."""
    sim, d = prepared_dir
    from photometry_tpu.cli import photometry_cmd
    assert photometry_cmd.main(["-q", "--all", "--version", "5",
                                "--mesh", "time=4,targets=2", d]) == 0
    with sqlite3.connect(os.path.join(d, "todo.sqlite")) as conn:
        rows = conn.execute(
            "SELECT status, COUNT(*) FROM todolist GROUP BY status;").fetchall()
        by = dict(rows)
        assert by.get(None, 0) == 0, "unprocessed tasks remain"
    files = glob.glob(os.path.join(d, "c1800", "*", "*.fits.gz"))
    assert len(files) >= 8
    from photometry_tpu.io import fits as pf
    hdus = pf.read_fits(files[0])
    names = [h.name for h in hdus]
    assert "LIGHTCURVE" in names
    lc = hdus[names.index("LIGHTCURVE")]
    assert len(lc.data["TIME"]) == 10  # true cadence count, not the padded 12
    assert np.isfinite(lc.data["FLUX_RAW"]).sum() >= 5
