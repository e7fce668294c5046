"""TaskManager arbitration for TPF secondary targets (tpf:NNN datasource).

Covers the rule of reference taskmanager.py:459-491: a secondary target that
reports its own primary among the skippable stars is itself SKIPPED (a
secondary never beats its primary), with provenance in photometry_skipped.
"""

import sqlite3

import pytest

from photometry_tpu.core.status import STATUS
from photometry_tpu.taskmanager import TaskManager


@pytest.fixture
def todo_file(tmp_path):
    path = str(tmp_path / "todo.sqlite")
    with sqlite3.connect(path) as conn:
        conn.execute("""CREATE TABLE todolist (
            priority INTEGER PRIMARY KEY ASC NOT NULL,
            starid INTEGER NOT NULL, sector INTEGER NOT NULL,
            datasource TEXT NOT NULL DEFAULT 'ffi',
            camera INTEGER NOT NULL, ccd INTEGER NOT NULL,
            cadence INTEGER NOT NULL, method TEXT DEFAULT NULL,
            tmag REAL, status INTEGER DEFAULT NULL, cbv_area INTEGER NOT NULL);""")
        rows = [
            (1, 1001, 1, "tpf", 3, 2, 120, None, 8.0, None, 321),
            (2, 2002, 1, "tpf:1001", 3, 2, 120, None, 10.5, None, 321),
            (3, 3003, 1, "tpf", 3, 2, 120, None, 9.0, None, 321),
        ]
        conn.executemany("INSERT INTO todolist VALUES (?,?,?,?,?,?,?,?,?,?,?);", rows)
        conn.commit()
    return path


def _result(task, skip_targets):
    return {
        "priority": task["priority"], "starid": task["starid"],
        "sector": task["sector"], "camera": task["camera"], "ccd": task["ccd"],
        "cadence": task["cadence"], "datasource": task["datasource"],
        "tmag": task["tmag"], "status": STATUS.OK, "method_used": "aperture",
        "time": 1.0, "details": {"skip_targets": skip_targets,
                                 "pos_centroid": (1.0, 2.0)},
    }


def test_secondary_overlapping_primary_is_skipped(todo_file):
    with TaskManager(todo_file) as tm:
        sec = tm.get_task(starid=2002)
        assert sec["datasource"] == "tpf:1001"
        tm.start_task(sec["priority"])
        # The secondary's mask contains its own primary:
        tm.save_result(_result(sec, skip_targets=[1001]))
        status = tm.cursor.execute(
            "SELECT status FROM todolist WHERE priority=?;", (sec["priority"],)).fetchone()[0]
        assert status == STATUS.SKIPPED.value
        skipped_by = tm.cursor.execute(
            "SELECT skipped_by FROM photometry_skipped WHERE priority=?;",
            (sec["priority"],)).fetchone()[0]
        assert skipped_by == 1  # the primary's priority
        # Primary itself is untouched (still pending):
        assert tm.cursor.execute(
            "SELECT status FROM todolist WHERE priority=1;").fetchone()[0] is None


def test_secondary_missing_primary_records_error(todo_file):
    with TaskManager(todo_file) as tm:
        sec = tm.get_task(starid=2002)
        tm.start_task(sec["priority"])
        res = _result(sec, skip_targets=[9999999])
        # skip target is not the primary -> plain arbitration branch; the
        # 9999999 star has no todo row, so nothing is skipped and this
        # target keeps its own status:
        tm.save_result(res)
        status = tm.cursor.execute(
            "SELECT status FROM todolist WHERE priority=?;", (sec["priority"],)).fetchone()[0]
        assert status == STATUS.OK.value


def test_batch_lease_isolates_tpf_primaries(todo_file):
    with TaskManager(todo_file) as tm:
        batch = tm.get_task_batch(batch_size=10)
        # Head is the tpf primary (priority 1); must lease alone:
        assert len(batch) == 1
        assert batch[0]["datasource"] == "tpf"
        tm.start_task(batch[0]["priority"])
        batch2 = tm.get_task_batch(batch_size=10)
        assert len(batch2) == 1
        assert batch2[0]["datasource"] == "tpf:1001"


def test_tmag_constraint_follows_primary(todo_file):
    with TaskManager(todo_file) as tm:
        # tmag_max=9.5 excludes the faint secondary by its own tmag (10.5),
        # but the tpf: rule keys on the PRIMARY's tmag (8.0) -> included:
        t = tm.get_task(tmag_max=9.5, starid=2002)
        assert t is not None
        # A primary fainter than the limit is excluded:
        t = tm.get_task(tmag_max=8.5, starid=3003)
        assert t is None
