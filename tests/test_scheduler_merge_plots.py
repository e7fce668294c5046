"""Tests: distributed scheduler, todo merge, plots, movies, graft entry.

The scheduler test is the counterpart of reference tests/test_run_tessphot_mpi.py
(mpiexec -n 2) using spawned worker processes instead of MPI ranks.
"""

import json
import os
import sqlite3

import numpy as np
import pytest

from photometry_tpu.sim.simulator import SimConfig, simulate_sector
from photometry_tpu.core.status import STATUS


@pytest.fixture(scope="module")
def prepared_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sched"))
    sim = simulate_sector(SimConfig(shape=(96, 96), n_times=8, n_stars=14,
                                    seed=71, tmag_range=(8.5, 12.5)))
    sim.write_ffis(d)
    sim.write_catalog(d)
    from photometry_tpu.prepare import prepare_photometry
    from photometry_tpu.todolist import make_todo
    prepare_photometry(d)
    make_todo(d)
    return sim, d


@pytest.mark.mpi
def test_distributed_scheduler(prepared_dir):
    """Master + 2 workers drain the queue (multiprocess pull-model)."""
    sim, d = prepared_dir
    from photometry_tpu.parallel.scheduler import run_distributed
    summary = run_distributed(d, n_workers=2, version=3, batch_size=5,
                              platform="cpu")
    assert summary["tasks_run"] >= summary["numtasks"] - summary["SKIPPED"] - 2
    assert summary["OK"] + summary["WARNING"] + summary["SKIPPED"] >= 0.9 * summary["numtasks"]
    # Diagnostics persisted by the master:
    with sqlite3.connect(os.path.join(d, "todo.sqlite")) as conn:
        n = conn.execute("SELECT COUNT(*) FROM diagnostics;").fetchone()[0]
        assert n > 5
        pending = conn.execute(
            "SELECT COUNT(*) FROM todolist WHERE status IS NULL;").fetchone()[0]
        assert pending == 0
    # Light curves written by the workers:
    import glob
    assert len(glob.glob(os.path.join(d, "c1800", "*", "*.fits.gz"))) > 5


def test_todo_merge(prepared_dir, tmp_path):
    sim, d = prepared_dir
    import shutil
    from photometry_tpu.todo_merge import todo_merge
    # Private original with all tasks done (status=1):
    todo = str(tmp_path / "todo.sqlite")
    shutil.copy(os.path.join(d, "todo.sqlite"), todo)
    with sqlite3.connect(todo) as conn:
        conn.execute("UPDATE todolist SET status=1;")
        conn.commit()
    derived = str(tmp_path / "todo-corr.sqlite")
    shutil.copy(todo, derived)
    # Simulate the corrections stage: add corr_status + an extra table,
    # and change one row's photometry status so it gets invalidated:
    with sqlite3.connect(derived) as conn:
        conn.execute("ALTER TABLE todolist ADD COLUMN corr_status INTEGER DEFAULT NULL;")
        conn.execute("UPDATE todolist SET corr_status=1;")
        conn.execute("CREATE TABLE diagnostics_corr (priority INTEGER PRIMARY KEY, lightcurve TEXT);")
        conn.execute("INSERT INTO diagnostics_corr SELECT priority, 'x.fits' FROM todolist;")
        conn.execute("UPDATE todolist SET status=3 WHERE priority=2;")
        conn.commit()
    out = str(tmp_path / "merged.sqlite")
    todo_merge(todo, derived, out)
    with sqlite3.connect(out) as conn:
        conn.row_factory = sqlite3.Row
        # corr_status transferred, but invalidated for the changed row:
        r = conn.execute("SELECT corr_status FROM todolist WHERE priority=1;").fetchone()
        assert r["corr_status"] == 1
        r = conn.execute("SELECT corr_status FROM todolist WHERE priority=2;").fetchone()
        assert r["corr_status"] is None
        # Extra table copied, minus invalidated rows:
        n = conn.execute("SELECT COUNT(*) FROM diagnostics_corr;").fetchone()[0]
        total = conn.execute("SELECT COUNT(*) FROM todolist;").fetchone()[0]
        assert n == total - 1
    # Incompatible file is rejected:
    with sqlite3.connect(derived) as conn:
        conn.execute("DELETE FROM todolist WHERE priority=1;")
        conn.commit()
    with pytest.raises(RuntimeError):
        todo_merge(todo, derived, str(tmp_path / "m2.sqlite"))


def test_plots(tmp_path):
    from photometry_tpu.plots import plot_image, plot_outline, save_figure, plt, \
        plot_image_fit_residuals
    rng = np.random.default_rng(0)
    img = rng.normal(100, 5, (32, 32))
    img[10, 10] = np.nan
    fig = plt.figure()
    ax = fig.add_subplot(111)
    for scale in ("log", "sqrt", "linear"):
        plot_image(img, ax=ax, scale=scale, cbar="right")
    with pytest.raises(ValueError):
        plot_image(img, ax=ax, scale="bogus")
    mask = np.zeros((32, 32), bool)
    mask[5:9, 5:9] = True
    pts = plot_outline(mask, ax=ax)
    assert len(pts) == 32  # 16 edge segments x 2 points
    p = save_figure(str(tmp_path / "sub" / "fig"), fig=fig)
    assert os.path.exists(p)
    plt.close(fig)
    fig = plt.figure(figsize=(9, 3))
    plot_image_fit_residuals(fig, img, img * 0.9)
    plt.close(fig)


def test_movie(prepared_dir, tmp_path):
    from photometry_tpu.movie import make_movie, mosaic_frame
    sim, d = prepared_dir
    from photometry_tpu.io.discovery import find_cube_files
    cube = find_cube_files(d)[0]
    out = make_movie(cube, output=str(tmp_path / "m.gif"), max_frames=3, dpi=40)
    assert os.path.exists(out) and os.path.getsize(out) > 1000
    mos = mosaic_frame(d, 1)
    assert mos.shape == (4 * 96, 4 * 96)
    # camera 3 / ccd 2 block has data, others NaN:
    assert np.isfinite(mos[2 * 96:3 * 96, 1 * 96:2 * 96]).all()
    assert np.isnan(mos[0:96, 0:96]).all()


def test_graft_entry_runs():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                              "__graft_entry__.py"))
    g = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(g)
    import jax
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out[0].shape == (4, 8)
    g.dryrun_multichip(len(jax.devices()))


@pytest.mark.mpi
def test_distributed_scheduler_tcp_transport(prepared_dir):
    """Cross-host (DCN) transport: master listens on TCP, workers join as
    remote processes (SURVEY §5: MPI point-to-point -> coordinator over
    hosts). Same pull-model protocol, queue drains over sockets."""
    import multiprocessing
    import socket
    sim, d = prepared_dir
    # reopen the queue fresh (the pipe-transport test already drained it):
    with sqlite3.connect(os.path.join(d, "todo.sqlite")) as conn:
        conn.execute("UPDATE todolist SET status=NULL;")
        conn.execute("DROP TABLE IF EXISTS diagnostics;")
        conn.execute("DROP TABLE IF EXISTS photometry_skipped;")
        conn.commit()
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    from photometry_tpu.parallel.scheduler import run_distributed, worker_remote
    mp = multiprocessing.get_context("spawn")
    procs = [mp.Process(target=worker_remote,
                        args=(("127.0.0.1", port), d),
                        kwargs={"version": 4, "platform": "cpu"})
             for _ in range(2)]
    for p in procs:
        p.start()
    try:
        summary = run_distributed(d, n_workers=2, version=4, batch_size=5,
                                  platform="cpu",
                                  listen=("127.0.0.1", port))
    finally:
        for p in procs:
            p.join(timeout=60)
            if p.is_alive():
                p.terminate()
    assert summary["OK"] + summary["WARNING"] + summary["SKIPPED"] >= \
        0.9 * summary["numtasks"]
    with sqlite3.connect(os.path.join(d, "todo.sqlite")) as conn:
        pending = conn.execute(
            "SELECT COUNT(*) FROM todolist WHERE status IS NULL;").fetchone()[0]
        assert pending == 0


@pytest.mark.mpi
def test_worker_crash_respawn(prepared_dir, tmp_path, monkeypatch):
    """A worker crashing mid-batch has its lease reclaimed and a replacement
    spawned; the queue still drains (the reference's MPI master hangs —
    run_tessphot_mpi.py:198)."""
    sim, d = prepared_dir
    with sqlite3.connect(os.path.join(d, "todo.sqlite")) as conn:
        conn.execute("UPDATE todolist SET status=NULL;")
        conn.execute("DROP TABLE IF EXISTS diagnostics;")
        conn.execute("DROP TABLE IF EXISTS photometry_skipped;")
        conn.commit()
    marker = str(tmp_path / "crash_once")
    monkeypatch.setenv("PHOTOMETRY_TPU_TEST_CRASH_ONCE", marker)
    from photometry_tpu.parallel.scheduler import run_distributed
    summary = run_distributed(d, n_workers=2, version=7, batch_size=5,
                              platform="cpu")
    assert os.path.exists(marker), "crash hook never fired"
    with sqlite3.connect(os.path.join(d, "todo.sqlite")) as conn:
        pending = conn.execute(
            "SELECT COUNT(*) FROM todolist WHERE status IS NULL "
            "OR status=6;").fetchone()[0]
        assert pending == 0, "crashed worker's lease was not reclaimed"
        # No lost or duplicated diagnostics rows — exactly one per
        # processed (non-skipped) task:
        dup = conn.execute(
            "SELECT COUNT(*) FROM (SELECT priority FROM diagnostics "
            "GROUP BY priority HAVING COUNT(*) > 1);").fetchone()[0]
        assert dup == 0, "duplicate diagnostics rows after crash recovery"
        n_diag = conn.execute("SELECT COUNT(*) FROM diagnostics;").fetchone()[0]
        n_done = conn.execute(
            "SELECT COUNT(*) FROM todolist WHERE status IN (1, 2, 3);"
        ).fetchone()[0]
        assert n_diag >= n_done
    assert summary["OK"] + summary["WARNING"] + summary["SKIPPED"] >= \
        0.9 * summary["numtasks"]
    # summary.json records the respawn:
    assert summary["respawns"] >= 1
    with open(os.path.join(d, "summary.json")) as fh:
        assert json.load(fh)["respawns"] == summary["respawns"]


@pytest.mark.mpi
def test_all_workers_dead_is_a_failure(prepared_dir, monkeypatch):
    """When every worker dies and respawns are exhausted, the master must
    exit reporting drained=False (the CLI maps it to a nonzero exit code)
    instead of masquerading as success — the reference aborts the MPI job
    on master failure for the same reason (run_tessphot_mpi.py:146-149)."""
    sim, d = prepared_dir
    with sqlite3.connect(os.path.join(d, "todo.sqlite")) as conn:
        conn.execute("UPDATE todolist SET status=NULL;")
        conn.execute("DROP TABLE IF EXISTS diagnostics;")
        conn.execute("DROP TABLE IF EXISTS photometry_skipped;")
        conn.commit()
    monkeypatch.setenv("PHOTOMETRY_TPU_TEST_CRASH_ALWAYS", "1")
    from photometry_tpu.parallel.scheduler import run_distributed
    summary = run_distributed(d, n_workers=2, version=7, batch_size=5,
                              platform="cpu", max_respawns=1)
    assert summary["drained"] is False
    assert summary["tasks_run"] == 0
    with sqlite3.connect(os.path.join(d, "todo.sqlite")) as conn:
        pending = conn.execute(
            "SELECT COUNT(*) FROM todolist WHERE status IS NULL;").fetchone()[0]
    assert pending > 0
