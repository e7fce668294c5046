"""
Distributed master/worker photometry scheduler.

Behavioral counterpart of reference run_tessphot_mpi.py: a pull-based
master/worker loop — workers announce READY, the master leases work, workers
return DONE with results, EXIT when the queue drains (tags at
run_tessphot_mpi.py:74; loop at :112-142/:151-209).  Pull scheduling
self-balances heterogeneous task times; only the master touches the TODO
database; killed runs recover via the STARTED-reset on restart.

Re-design for the TPU fleet: MPI ranks become worker *processes* (one per
host/chip — no mpi4py dependency), and the unit of work is a **task batch**
sharing one device context (hundreds of targets per lease) instead of a
single star, so each worker amortises one jitted program across the batch.
Workers write their own light-curve files; only small result dicts return
to the master, exactly like the reference's design where bulk data never
crosses ranks.

Two interchangeable transports carry the READY/START/DONE/EXIT messages
(SURVEY §5 maps MPI point-to-point onto a coordinator over hosts):

- local mode (default): spawned processes over ``multiprocessing`` pipes;
- cross-host mode: the master listens on TCP
  (``run_distributed(listen=(host, port), n_workers=N)``) and remote hosts
  join with :func:`worker_remote` / ``scheduler_cmd --connect host:port`` —
  the DCN seam for a real fleet.  Both transports expose the same
  ``send``/``recv`` connection API, so the master loop is transport-blind.
"""

from __future__ import annotations

import logging
import multiprocessing
import os
import traceback
from timeit import default_timer
from typing import Optional

logger = logging.getLogger(__name__)

__all__ = ["run_distributed", "worker_loop", "worker_remote"]

#: Shared secret for the TCP transport handshake (override per deployment).
_AUTHKEY_ENV = "PHOTOMETRY_TPU_SECRET"


def _authkey() -> bytes:
    return os.environ.get(_AUTHKEY_ENV, "photometry-tpu").encode()

# Message tags (run_tessphot_mpi.py:74).  BYE is ours: EXIT is a *request*
# the worker acknowledges, so a worker holding deferred halo-switch work can
# still flush it (as DONE payloads) before saying BYE and closing.
READY, START, DONE, EXIT, BYE = "READY", "START", "DONE", "EXIT", "BYE"


def _result_to_dict(task, res, elaptime, worker_wait_time):
    details = dict(res.details)
    details["skip_targets"] = getattr(res, "skip_targets", [])
    details.pop("halo_weightmap", None)  # bulk data stays on the worker
    return {
        "priority": task["priority"], "starid": task["starid"],
        "sector": task["sector"], "camera": task["camera"], "ccd": task["ccd"],
        "cadence": task["cadence"], "datasource": task["datasource"],
        "tmag": task["tmag"], "status": res.status.value,
        "method_used": res.method, "time": elaptime,
        "worker_wait_time": worker_wait_time, "details": details,
    }


def worker_loop(conn, input_folder: str, output_folder: Optional[str],
                version: int, platform: Optional[str] = None,
                mesh_spec: Optional[str] = None):
    """Worker process: READY -> recv batch -> photometry -> DONE ... EXIT.

    ``mesh_spec`` (e.g. 'time=4,targets=2') makes this worker run FFI
    extraction over a multi-chip device mesh (parallel.mesh.parse_mesh_spec);
    the mesh is built here, inside the worker process, after the platform is
    configured.
    """
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)
    from ..core.dispatcher import ContextCache, HaloSwitchQueue, photometry_batch
    from ..core.status import STATUS

    mesh = None
    if mesh_spec:
        from .mesh import parse_mesh_spec
        mesh = parse_mesh_spec(mesh_spec)
    ctx_cache = ContextCache(mesh=mesh)
    halo_queue = HaloSwitchQueue()

    def _flush_halo(force=False):
        """Resolve queued halo-switch candidates -> result dicts."""
        if not halo_queue.pending:
            return []
        tic = default_timer()
        flushed = halo_queue.flush(force=force)
        if not flushed:
            return []
        elap = (default_timer() - tic) / len(flushed)
        return [_result_to_dict(t, r, elap, None) for t, r in flushed]

    tic_wait = default_timer()
    conn.send((READY, None))
    while True:
        tag, payload = conn.recv()
        if tag == EXIT:
            # Deferred halo-switch work still pending?  Flush and deliver
            # it as one more DONE; the master will answer with EXIT again.
            leftovers = _flush_halo(force=True)
            if leftovers:
                conn.send((DONE, leftovers))
                continue
            ctx_cache.close()
            conn.send((BYE, None))
            conn.close()
            return
        assert tag == START
        batch = payload
        # Test hook: crash exactly once after receiving a lease (exercises
        # the master's respawn + lease-reclaim path; marker file gates it):
        marker = os.environ.get("PHOTOMETRY_TPU_TEST_CRASH_ONCE")
        if marker and not os.path.exists(marker):
            with open(marker, "w"):
                pass
            os._exit(17)
        if os.environ.get("PHOTOMETRY_TPU_TEST_CRASH_ALWAYS"):
            # Unrecoverable-fleet hook: every worker dies on every lease,
            # exercising the master's respawn-exhausted failure exit.
            os._exit(17)
        worker_wait_time = default_timer() - tic_wait
        tic = default_timer()
        results = []
        ctx = None
        cached = False
        try:
            # The halo queue pins its SectorContext; resolve it before the
            # cache evicts that context for a different CCD:
            results = (_flush_halo(force=True)
                       if not halo_queue.matches(batch[0]) else [])
            from ..utils.profiling import StageTimer
            timer = StageTimer()
            with timer.stage("context"):
                # FFI contexts (cube uploads) are reused across consecutive
                # same-CCD batches:
                ctx, cached = ctx_cache.get(input_folder, batch[0])
            with timer.stage("photometry"):
                out = photometry_batch(ctx, batch, output_folder=output_folder,
                                       version=version, halo_queue=halo_queue)
            elap = (default_timer() - tic) / max(len(batch), 1)
            # Deferred halo-switch candidates stay leased (the master sees
            # no result for them yet) until a later flush resolves them:
            results += [_result_to_dict(t, r, elap, worker_wait_time)
                        for t, r in zip(batch, out)
                        if not r.details.get("halo_switch_deferred")]
            if halo_queue.should_flush():
                results += _flush_halo()
            if results:
                results[-1]["details"].update(timer.as_details())
        except Exception:
            tb = traceback.format_exc().strip()
            elap = (default_timer() - tic) / max(len(batch), 1)
            # += keeps any already-flushed halo results gathered above —
            # their queue entries are consumed, so dropping the dicts here
            # would leave those tasks leased (STARTED) until a restart:
            results += [{
                "priority": t["priority"], "starid": t["starid"],
                "sector": t["sector"], "camera": t["camera"], "ccd": t["ccd"],
                "cadence": t["cadence"], "datasource": t["datasource"],
                "tmag": t["tmag"], "status": STATUS.ERROR.value,
                "method_used": "error", "time": elap,
                "worker_wait_time": worker_wait_time,
                "details": {"errors": [tb]},
            } for t in batch]
        finally:
            if ctx is not None:
                ctx_cache.release(ctx, cached)
        tic_wait = default_timer()
        conn.send((DONE, results))


def worker_remote(address, input_folder: str,
                  output_folder: Optional[str] = None, version: int = 1,
                  platform: Optional[str] = None, connect_timeout: float = 60.0,
                  mesh_spec: Optional[str] = None):
    """Join a master listening at ``address`` = (host, port) over TCP.

    The cross-host (DCN) worker entry point: connects (retrying until the
    master's listener is up, like MPI ranks waiting at init), then runs the
    same READY/START/DONE/EXIT protocol as a local worker.  Paths are this
    host's own view of the shared filesystem (like MPI ranks on a cluster).
    """
    import time
    from multiprocessing.connection import Client
    deadline = default_timer() + connect_timeout
    while True:
        try:
            conn = Client(tuple(address), authkey=_authkey())
            break
        except (ConnectionRefusedError, OSError):
            if default_timer() > deadline:
                raise
            time.sleep(0.25)
    worker_loop(conn, input_folder, output_folder, version, platform,
                mesh_spec=mesh_spec)


def run_distributed(input_folder: str, n_workers: int = 2,
                    version: int = 1, output_folder: Optional[str] = None,
                    batch_size: int = 256, platform: Optional[str] = None,
                    summary: Optional[str] = None, listen=None,
                    max_respawns: int = 3, mesh_spec: Optional[str] = None,
                    **constraints) -> dict:
    """Master loop: lease batches to workers until the queue drains.

    With ``listen=(host, port)`` the master accepts ``n_workers`` TCP
    connections from :func:`worker_remote` processes on any host instead of
    spawning local ones.  A local worker that dies mid-batch has its lease
    returned to the queue and is replaced (up to ``max_respawns`` times) —
    the reference's MPI master hangs in this situation
    (run_tessphot_mpi.py:198).  Returns the final summary dict.
    """
    from ..core.status import STATUS
    from ..taskmanager import TaskManager

    mp = multiprocessing.get_context("spawn")
    if summary is None:
        summary = os.path.join(output_folder or input_folder, "summary.json")

    with TaskManager(input_folder, cleanup=True, load_into_memory=True,
                     summary=summary) as tm:
        workers = []
        if listen is not None:
            from multiprocessing.connection import Listener
            with Listener(tuple(listen), authkey=_authkey()) as listener:
                logger.info("Waiting for %d remote workers on %s...",
                            n_workers, listen)
                for _ in range(n_workers):
                    conn = listener.accept()
                    logger.info("Worker joined from %s", listener.last_accepted)
                    workers.append({"proc": None, "conn": conn, "alive": True})
        else:
            for _ in range(n_workers):
                parent_conn, child_conn = mp.Pipe()
                proc = mp.Process(target=worker_loop,
                                  args=(child_conn, input_folder, output_folder,
                                        version, platform, mesh_spec))
                proc.start()
                workers.append({"proc": proc, "conn": parent_conn, "alive": True})

        n_active = len(workers)
        respawns_left = max_respawns

        def _spawn_local():
            parent_conn, child_conn = mp.Pipe()
            proc = mp.Process(target=worker_loop,
                              args=(child_conn, input_folder, output_folder,
                                    version, platform, mesh_spec))
            proc.start()
            return {"proc": proc, "conn": parent_conn, "alive": True}

        def _reap(w):
            """Worker died: reclaim its lease, respawn a local replacement."""
            nonlocal n_active, respawns_left
            w["alive"] = False
            n_active -= 1
            leased = w.pop("batch", None)
            if leased:
                n = tm.release_tasks([t["priority"] for t in leased])
                logger.error("Worker died mid-batch; released %d leased "
                             "task(s) back to the queue.", n)
            if (w["proc"] is not None and respawns_left > 0
                    and tm.get_task(**constraints) is not None):
                respawns_left -= 1
                workers.append(_spawn_local())
                n_active += 1
                logger.warning("Respawned a replacement worker "
                               "(%d respawns left).", respawns_left)

        import multiprocessing.connection as mpc
        while n_active > 0:
            conns = [w["conn"] for w in workers if w["alive"]]
            ready = mpc.wait(conns, timeout=60.0)
            if not ready:
                # Heartbeat timeout: check for dead local workers (the
                # reference hangs here — run_tessphot_mpi.py:198 known
                # limitation).
                for w in list(workers):
                    if (w["alive"] and w["proc"] is not None
                            and not w["proc"].is_alive()):
                        _reap(w)
                continue
            for conn in ready:
                w = next(x for x in workers if x["conn"] is conn)
                try:
                    tag, payload = conn.recv()
                except (EOFError, OSError):
                    _reap(w)
                    continue
                if tag == BYE:
                    # Worker acknowledged EXIT (after flushing any deferred
                    # halo work) and closed its end:
                    w.pop("batch", None)
                    w["alive"] = False
                    n_active -= 1
                    continue
                if tag == DONE:
                    w.pop("batch", None)
                    for r in payload:
                        r["status"] = STATUS(r["status"])
                    tm.save_results(payload)  # one commit per worker batch
                if tag in (READY, DONE):
                    batch = tm.get_task_batch(batch_size=batch_size, **constraints)
                    if batch:
                        tm.start_tasks([t["priority"] for t in batch])
                        w["batch"] = batch
                        try:
                            conn.send((START, batch))
                        except (BrokenPipeError, OSError):
                            # Worker died between its READY/DONE and our
                            # reply: reclaim the fresh lease and respawn
                            # instead of crashing the whole run.
                            _reap(w)
                    else:
                        # EXIT is a request — the worker may still flush
                        # deferred halo-switch results (as DONE) before it
                        # answers BYE, so keep listening to it:
                        try:
                            conn.send((EXIT, None))
                        except (BrokenPipeError, OSError):
                            w["alive"] = False
                            n_active -= 1

        for w in workers:
            if w["proc"] is None:      # remote worker: just drop the socket
                w["conn"].close()
                continue
            w["proc"].join(timeout=30)
            if w["proc"].is_alive():  # pragma: no cover
                w["proc"].terminate()
        tm.backup()
        # summary.json records how many replacement workers were spawned:
        tm.summary["respawns"] = max_respawns - respawns_left
        tm.write_summary()
        summary = dict(tm.summary)
        # Distinguish a drained queue from "every worker died before the
        # work was done" (reference master would hang; ours exits — but the
        # exit must not look like success, run_tessphot_mpi.py:146-149
        # aborts the job on master failure for the same reason):
        summary["drained"] = not tm.get_task_batch(batch_size=1, **constraints)
        if not summary["drained"]:
            logger.error("Scheduler exiting with unprocessed tasks remaining "
                         "(all workers lost, respawns exhausted).")
        return summary
