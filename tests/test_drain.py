"""core.drain.run_drain: the shared production drain loop + phase timers.

The loop itself is exercised end-to-end by test_integration_pipeline (via
the photometry CLI); this module covers the drain-specific surface bench.py
relies on: the timers decomposition and single-task mode.
"""

import os
import sqlite3

import numpy as np
import pytest

from photometry_tpu.core.drain import new_timers, run_drain
from photometry_tpu.core.status import STATUS
from photometry_tpu.sim.simulator import SimConfig, simulate_sector


@pytest.fixture(scope="module")
def prepared(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("drain"))
    sim = simulate_sector(SimConfig(shape=(96, 96), n_times=6, n_stars=8,
                                    seed=21, tmag_range=(9.0, 12.0)))
    sim.write_ffis(d)
    sim.write_catalog(d)
    from photometry_tpu.cli import prepare_cmd, todo_cmd
    assert prepare_cmd.main(["-q", d]) == 0
    assert todo_cmd.main(["-q", d]) == 0
    return sim, d


def test_run_drain_timers_and_products(prepared):
    sim, d = prepared
    t = new_timers()
    n = run_drain(d, 7, timers=t, summary=os.path.join(d, "summary.json"))
    assert n > 0
    assert t["n_done"] == n
    assert t["n_batches"] >= 1
    # phases that must have run accumulate nonzero wall; the wall covers
    # the phases (plus loop overhead):
    assert t["photometry"] > 0
    assert t["save"] > 0
    assert t["sqlite"] > 0
    assert t["wall"] >= t["photometry"] + t["save"] + t["sqlite"]
    assert t.get("n_products", 0) > 0
    assert os.path.isfile(os.path.join(d, "summary.json"))
    # every task resolved in the queue:
    with sqlite3.connect(os.path.join(d, "todo.sqlite")) as conn:
        left = conn.execute(
            "SELECT COUNT(*) FROM todolist WHERE status IS NULL "
            "OR status = ?", (STATUS.STARTED.value,)).fetchone()[0]
    assert left == 0


def test_run_drain_single_task(prepared):
    sim, d = prepared
    # Every NEW drain session re-opens STARTED/ABORT/ERROR tasks for retry
    # (TaskManager init — the reference's semantics), so the number of
    # tasks a single-task call may process is bounded by the re-openable
    # set, and it processes AT MOST one:
    retryable = (STATUS.STARTED.value, STATUS.ABORT.value, STATUS.ERROR.value)
    with sqlite3.connect(os.path.join(d, "todo.sqlite")) as conn:
        n_open = conn.execute(
            "SELECT COUNT(*) FROM todolist WHERE status IS NULL "
            f"OR status IN ({','.join('?' * len(retryable))})",
            retryable).fetchone()[0]
    n = run_drain(d, 7, all_tasks=False)
    assert n in (0, 1)
    if n_open == 0:
        assert n == 0
