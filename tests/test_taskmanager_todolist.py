"""Tests of TODO-list generation and the TaskManager work queue.

Counterparts of reference tests/test_taskmanager.py and the todolist tests,
running against a fully simulated sector.
"""

import os
import sqlite3

import numpy as np
import pytest

from photometry_tpu.sim.simulator import SimConfig, simulate_sector
from photometry_tpu.prepare import prepare_photometry
from photometry_tpu.todolist import make_todo, calc_cbv_area, edge_distance
from photometry_tpu.taskmanager import TaskManager, build_constraints
from photometry_tpu.core.status import STATUS


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("queue"))
    sim = simulate_sector(SimConfig(shape=(96, 96), n_times=10, n_stars=25, seed=31))
    sim.write_ffis(d)
    sim.write_catalog(d)
    sim.write_tpf(d, int(sim.starid[0]), n_times=20)
    prepare_photometry(d)
    todo = make_todo(d)
    return sim, d, todo


def _fake_result(task, status=STATUS.OK, **details):
    base = {"mean_flux": 100.0, "pos_centroid": (5.0, 6.0), "stamp": (0, 15, 0, 15)}
    base.update(details)
    return {
        "priority": task["priority"], "starid": task["starid"],
        "sector": task["sector"], "camera": task["camera"], "ccd": task["ccd"],
        "cadence": task["cadence"], "datasource": task["datasource"],
        "tmag": task["tmag"], "status": status, "method_used": "aperture",
        "time": 1.5, "worker_wait_time": 0.1, "details": base,
    }


def test_make_todo_contents(workdir):
    sim, d, todo = workdir
    assert os.path.exists(todo)
    with sqlite3.connect(todo) as conn:
        conn.row_factory = sqlite3.Row
        rows = conn.execute("SELECT * FROM todolist ORDER BY priority;").fetchall()
    # All FFI targets (tmag < 15) + 1 TPF primary + secondaries:
    datasources = {r["datasource"] for r in rows}
    assert "ffi" in datasources and "tpf" in datasources
    # Priorities sorted by tmag:
    tmags = [r["tmag"] for r in rows]
    assert tmags == sorted(tmags)
    # Unique (starid, datasource, ...) pairs:
    keys = [(r["starid"], r["datasource"], r["cadence"]) for r in rows]
    assert len(keys) == len(set(keys))
    # cbv areas encode camera/ccd:
    for r in rows:
        assert 321 <= r["cbv_area"] <= 324


def test_make_todo_idempotent(workdir):
    sim, d, todo = workdir
    assert make_todo(d) == todo  # no overwrite -> same file kept


def test_calc_cbv_area_and_edge_distance():
    class S:
        camera = 3
        ccd = 2
        camera_centre_ra = 100.0
        camera_centre_dec = 0.0
    assert calc_cbv_area(100.0, 0.0, S()) == 321
    assert calc_cbv_area(100.0, 16.0, S()) == 324
    ed = edge_distance(np.array([0.0, 5.0]), np.array([0.0, 5.0]), image_shape=(11, 11))
    np.testing.assert_allclose(ed, [0.5, 5.5])
    ap = np.ones((11, 11), bool)
    ap[5, 5] = False
    ed = edge_distance(np.array([5.0]), np.array([3.0]), aperture=ap)
    assert ed[0] == pytest.approx(1.5)
    with pytest.raises(ValueError):
        edge_distance(1, 1)


def test_taskmanager_lease_and_save(workdir, tmp_path):
    sim, d, todo = workdir
    import shutil
    private = str(tmp_path / "todo.sqlite")
    shutil.copy(todo, private)
    summary_file = str(tmp_path / "summary.json")
    with TaskManager(private, summary=summary_file, summary_interval=1) as tm:
        n0 = tm.get_number_tasks()
        assert n0 > 10
        task = tm.get_task()
        assert task["priority"] == 1
        tm.start_task(task["priority"])
        # Leased task no longer offered:
        t2 = tm.get_task()
        assert t2["priority"] != task["priority"]
        tm.save_result(_fake_result(task))
        assert tm.summary["OK"] == 1
        assert tm.summary["mean_elaptime"] == pytest.approx(1.5)
    # Summary file written:
    import json
    with open(summary_file) as fh:
        s = json.load(fh)
    assert s["OK"] == 1

    # Reopening: OK tasks stay done:
    with TaskManager(private) as tm:
        assert tm.get_number_tasks() == n0 - 1


def test_taskmanager_error_reset(workdir, tmp_path):
    sim, d, todo = workdir
    import shutil
    private = str(tmp_path / "todo.sqlite")
    shutil.copy(todo, private)
    with TaskManager(private) as tm:
        n0 = tm.get_number_tasks()
        task = tm.get_task()
        tm.start_task(task["priority"])
        tm.save_result(_fake_result(task, status=STATUS.ERROR,
                                    errors=["Something bad"]))
        assert tm.get_number_tasks() == n0 - 1
        assert tm.summary["last_error"] == "Something bad"
    # ERROR rows are reset for a retry on restart:
    with TaskManager(private) as tm:
        assert tm.get_number_tasks() == n0


def test_taskmanager_skip_arbitration(workdir, tmp_path):
    sim, d, todo = workdir
    import shutil
    private = str(tmp_path / "todo.sqlite")
    shutil.copy(private if os.path.exists(private) else todo, private)
    with TaskManager(private) as tm:
        # Find two FFI tasks; brighter target reports the fainter as skippable:
        bright = tm.get_task(datasource="ffi")
        tm.start_task(bright["priority"])
        faint = tm.get_task(datasource="ffi")
        assert faint["tmag"] >= bright["tmag"]
        res = _fake_result(bright)
        res["details"]["skip_targets"] = [faint["starid"]]
        tm.save_result(res)
        # Fainter task is now SKIPPED:
        with sqlite3.connect(private if tm.load_into_memory is False else private) as conn:
            pass
        row = tm.cursor.execute("SELECT status FROM todolist WHERE priority=?;",
                                (faint["priority"],)).fetchone()
        assert row[0] == STATUS.SKIPPED.value
        skiprow = tm.cursor.execute(
            "SELECT skipped_by FROM photometry_skipped WHERE priority=?;",
            (faint["priority"],)).fetchone()
        assert skiprow[0] == bright["priority"]

        # Now the reverse: a faint target claims a brighter one -> itself skipped:
        t3 = tm.get_task(datasource="ffi", tmag_min=bright["tmag"] + 0.1)
        if t3 is not None:
            tm.start_task(t3["priority"])
            res3 = _fake_result(t3)
            res3["details"]["skip_targets"] = [bright["starid"]]
            tm.save_result(res3)
            row = tm.cursor.execute("SELECT status FROM todolist WHERE priority=?;",
                                    (t3["priority"],)).fetchone()
            assert row[0] == STATUS.SKIPPED.value


def test_taskmanager_batch_lease(workdir, tmp_path):
    sim, d, todo = workdir
    import shutil
    private = str(tmp_path / "todo.sqlite")
    shutil.copy(todo, private)
    with TaskManager(private) as tm:
        batch = tm.get_task_batch(batch_size=8)
        assert 1 <= len(batch) <= 8
        ds = {(t["sector"], t["camera"], t["ccd"], t["datasource"], t["cadence"])
              for t in batch}
        assert len(ds) == 1
        pris = [t["priority"] for t in batch]
        assert pris == sorted(pris)
        tm.start_tasks(pris)
        batch2 = tm.get_task_batch(batch_size=100)
        assert not (set(p["priority"] for p in batch2) & set(pris))


def test_taskmanager_in_memory_backup(workdir, tmp_path):
    sim, d, todo = workdir
    import shutil
    private = str(tmp_path / "todo.sqlite")
    shutil.copy(todo, private)
    with TaskManager(private, load_into_memory=True, backup_interval=1) as tm:
        task = tm.get_task()
        tm.start_task(task["priority"])
        tm.save_result(_fake_result(task))
        pri = task["priority"]
    # After close, the on-disk file has the saved status:
    with sqlite3.connect(private) as conn:
        row = conn.execute("SELECT status FROM todolist WHERE priority=?;", (pri,)).fetchone()
        assert row[0] == STATUS.OK.value
        diag = conn.execute("SELECT method_used,mean_flux FROM diagnostics WHERE priority=?;",
                            (pri,)).fetchone()
        assert diag[0] == "aperture"
        assert diag[1] == 100.0


def test_build_constraints():
    assert build_constraints() == ""
    c = build_constraints(camera=3, ccd=[1, 2])
    assert "todolist.camera IN (3)" in c and "todolist.ccd IN (1,2)" in c
    c = build_constraints(datasource="ffi")
    assert "datasource='ffi'" in c
    c = build_constraints(tmag_min=5, tmag_max=10)
    assert "BETWEEN" in c and "tpf:%" in c
    lst = build_constraints(sector=1, return_list=True)
    assert isinstance(lst, list) and len(lst) == 1


def test_taskmanager_missing_file(tmp_path):
    with pytest.raises(FileNotFoundError):
        TaskManager(str(tmp_path / "nope.sqlite"))


@pytest.mark.slow
def test_queue_at_reference_scale(tmp_path):
    """Queue behavior at the reference's scale anchor: 168,642 tasks
    (reference tests/test_taskmanager.py:45) — batch leasing, result saving
    with skip arbitration, in-memory backups, and a measured tasks/sec."""
    import time as _time
    n_tasks = 168_642
    todo = str(tmp_path / "todo.sqlite")
    rng = np.random.default_rng(7)
    tmag = np.sort(rng.uniform(2.0, 15.0, n_tasks))
    with sqlite3.connect(todo) as conn:
        cur = conn.cursor()
        cur.execute("""CREATE TABLE todolist (
            priority INTEGER PRIMARY KEY ASC NOT NULL,
            starid INTEGER NOT NULL,
            sector INTEGER NOT NULL,
            datasource TEXT NOT NULL DEFAULT 'ffi',
            camera INTEGER NOT NULL,
            ccd INTEGER NOT NULL,
            cadence INTEGER NOT NULL,
            method TEXT DEFAULT NULL,
            tmag REAL,
            status INTEGER DEFAULT NULL,
            cbv_area INTEGER NOT NULL);""")
        cur.executemany(
            "INSERT INTO todolist (priority,starid,sector,camera,ccd,cadence,"
            "datasource,tmag,cbv_area) VALUES (?,?,?,?,?,?,?,?,?);",
            ((i + 1, 100000 + i, 1, 3, 2, 1800, "ffi", float(tmag[i]), 132)
             for i in range(n_tasks)))
        cur.execute("CREATE UNIQUE INDEX unique_target_idx ON todolist "
                    "(starid, datasource, sector, camera, ccd, cadence);")
        cur.execute("CREATE INDEX status_idx ON todolist (status);")
        conn.commit()

    n_process = 20_000
    batch = 512
    tic = _time.perf_counter()
    with TaskManager(todo, cleanup=True, load_into_memory=True,
                     backup_interval=10_000) as tm:
        assert tm.get_number_tasks() == n_tasks
        done = 0
        while done < n_process:
            tasks = tm.get_task_batch(batch_size=batch)
            assert tasks, "queue starved early"
            tm.start_tasks([t["priority"] for t in tasks])
            results = [_fake_result(t) for t in tasks]
            # a couple of results carry skip_targets to exercise arbitration:
            results[0]["details"]["skip_targets"] = [results[1]["starid"]]
            tm.save_results(results)
            done += len(tasks)
        remaining = tm.get_number_tasks()
    dt = _time.perf_counter() - tic
    rate = n_process / dt
    # Reopen from disk: the backup must carry the saved statuses:
    with sqlite3.connect(todo) as conn:
        n_done = conn.execute(
            "SELECT COUNT(*) FROM todolist WHERE status IS NOT NULL;").fetchone()[0]
        n_diag = conn.execute("SELECT COUNT(*) FROM diagnostics;").fetchone()[0]
        n_skip = conn.execute(
            "SELECT COUNT(*) FROM photometry_skipped;").fetchone()[0]
    assert n_done >= n_process - batch  # last partial backup may lag one interval
    assert n_diag > 0 and n_skip > 0
    # skip arbitration marks additional co-mask tasks SKIPPED, so at most
    # n_tasks - n_process remain:
    assert remaining <= n_tasks - n_process
    # Throughput: well above what any worker fleet needs from the master
    # (reference's per-task elaptime is seconds; require >2000 tasks/s here):
    assert rate > 2000, f"queue throughput too low: {rate:.0f} tasks/s"
    print(f"queue throughput: {rate:.0f} tasks/s over {n_process} of {n_tasks}")


def test_batched_lease_arbitration_preserves_skipped(workdir, tmp_path):
    """Round-3 review fix: with batch leasing, a target demoted to SKIPPED
    by a batch-mate's arbitration must STAY skipped when its own (already
    computed) result arrives — and must not skip third parties.  In the
    reference's sequential order the skipped target would never have run
    at all (a SKIPPED task is never leased again)."""
    import shutil
    sim, d, todo = workdir
    private = str(tmp_path / "todo.sqlite")
    shutil.copy(todo, private)
    with TaskManager(private) as tm:
        batch = tm.get_task_batch(batch_size=6, datasource="ffi")
        assert len(batch) >= 3
        tm.start_tasks([t["priority"] for t in batch])
        a, b, c = batch[0], batch[1], batch[2]   # priority order = brightness
        # A's mask contains B -> arbitration skips B:
        res_a = _fake_result(a)
        res_a["details"]["skip_targets"] = [b["starid"]]
        tm.save_result(res_a)
        # B's own result arrives later (same lease); it claims the fainter
        # C in its mask.  B must stay SKIPPED and C must stay unprocessed:
        res_b = _fake_result(b)
        res_b["details"]["skip_targets"] = [c["starid"]]
        tm.save_result(res_b)
        st_b = tm.cursor.execute("SELECT status FROM todolist WHERE priority=?;",
                                 (b["priority"],)).fetchone()[0]
        assert st_b == STATUS.SKIPPED.value, "OK result overwrote SKIPPED"
        st_c = tm.cursor.execute("SELECT status FROM todolist WHERE priority=?;",
                                 (c["priority"],)).fetchone()[0]
        assert st_c == STATUS.STARTED.value, \
            "a skipped target's stale result skipped a third party"
        # B's diagnostics are still recorded, and provenance is singular:
        n_diag = tm.cursor.execute("SELECT COUNT(*) FROM diagnostics WHERE priority=?;",
                                   (b["priority"],)).fetchone()[0]
        assert n_diag == 1
        rows = tm.cursor.execute(
            "SELECT COUNT(*) FROM photometry_skipped WHERE priority=?;",
            (b["priority"],)).fetchone()[0]
        assert rows == 1
        # summary counted B as SKIPPED, not OK:
        assert tm.summary["OK"] == 1 and tm.summary["SKIPPED"] >= 1


def test_symmetric_overlap_no_duplicate_skip_rows(workdir, tmp_path):
    """Both sides of a symmetric mask overlap saved from one batch lease
    must leave exactly one photometry_skipped row."""
    import shutil
    sim, d, todo = workdir
    private = str(tmp_path / "todo.sqlite")
    shutil.copy(todo, private)
    with TaskManager(private) as tm:
        batch = tm.get_task_batch(batch_size=4, datasource="ffi")
        tm.start_tasks([t["priority"] for t in batch])
        a, b = batch[0], batch[1]
        res_a = _fake_result(a)
        res_a["details"]["skip_targets"] = [b["starid"]]
        tm.save_result(res_a)
        res_b = _fake_result(b)
        res_b["details"]["skip_targets"] = [a["starid"]]
        tm.save_result(res_b)
        rows = tm.cursor.execute(
            "SELECT priority, skipped_by, COUNT(*) c FROM photometry_skipped "
            "GROUP BY priority, skipped_by HAVING c > 1;").fetchall()
        assert rows == []
        st_a = tm.cursor.execute("SELECT status FROM todolist WHERE priority=?;",
                                 (a["priority"],)).fetchone()[0]
        assert st_a == STATUS.OK.value
