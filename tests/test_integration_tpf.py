"""End-to-end pipeline with mixed FFI + TPF (+ secondary) targets."""

import glob
import os
import sqlite3

import numpy as np
import pytest

from photometry_tpu.sim.simulator import SimConfig, simulate_sector
from photometry_tpu.core.status import STATUS


@pytest.fixture(scope="module")
def mixed_pipeline(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mix"))
    sim = simulate_sector(SimConfig(shape=(96, 96), n_times=8, n_stars=14,
                                    seed=23, tmag_range=(8.0, 12.0)))
    sim.write_ffis(d)
    sim.write_catalog(d)
    # Two TPFs; the second star's stamp likely contains secondaries:
    sim.write_tpf(d, int(sim.starid[0]), stamp=(13, 13), n_times=40)
    sim.write_tpf(d, int(sim.starid[1]), stamp=(13, 13), n_times=40)
    from photometry_tpu.cli import prepare_cmd, todo_cmd, photometry_cmd
    assert prepare_cmd.main(["-q", d]) == 0
    assert todo_cmd.main(["-q", d]) == 0
    assert photometry_cmd.main(["-q", "--all", "--version", "7", d]) == 0
    return sim, d


def test_tpf_tasks_processed(mixed_pipeline):
    sim, d = mixed_pipeline
    with sqlite3.connect(os.path.join(d, "todo.sqlite")) as conn:
        conn.row_factory = sqlite3.Row
        rows = conn.execute("SELECT datasource, status, starid FROM todolist;").fetchall()
    ds = {}
    for r in rows:
        ds.setdefault("tpf" if r["datasource"].startswith("tpf") else r["datasource"], []).append(r)
    assert "tpf" in ds and "ffi" in ds
    # Everything processed:
    assert all(r["status"] is not None for r in rows)
    # TPF primary targets succeeded or were skipped by arbitration:
    good = (STATUS.OK.value, STATUS.WARNING.value, STATUS.SKIPPED.value)
    for r in rows:
        if r["datasource"] == "tpf":
            assert r["status"] in good, f"tpf task {r['starid']}: {r['status']}"


def test_tpf_lightcurves_written(mixed_pipeline):
    sim, d = mixed_pipeline
    files = glob.glob(os.path.join(d, "c0120", "*", "*.fits.gz"))
    # TPF cadence is 120s -> separate output directory tree:
    with sqlite3.connect(os.path.join(d, "todo.sqlite")) as conn:
        n_ok_tpf = conn.execute(
            "SELECT COUNT(*) FROM todolist WHERE datasource LIKE 'tpf%' AND status IN (1,3);").fetchone()[0]
    assert len(files) >= max(n_ok_tpf, 1)


def test_diagnostics_complete(mixed_pipeline):
    sim, d = mixed_pipeline
    with sqlite3.connect(os.path.join(d, "todo.sqlite")) as conn:
        rows = conn.execute(
            "SELECT d.method_used, d.mean_flux, t.datasource FROM diagnostics d "
            "JOIN todolist t ON t.priority=d.priority;").fetchall()
    assert len(rows) > 0
    methods = {r[0] for r in rows}
    assert "aperture" in methods
