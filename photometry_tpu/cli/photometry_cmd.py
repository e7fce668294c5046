"""
CLI: run photometry from the TODO list.

Counterpart of reference run_tessphot.py: select a task by --starid,
--priority, --random or queue order; or drain the whole queue with --all.
The TPU-native default drains the queue in *batches* leased per
(sector, camera, ccd, datasource, cadence) so a single device context is
reused across hundreds of targets.

Usage:
    python -m photometry_tpu.cli.photometry_cmd [options] [input_folder]
"""

from __future__ import annotations

import argparse
import os
import sys
from timeit import default_timer

from .common import add_logging_args, resolve_input_folder, setup_logging


def task_to_result(task, res, elaptime, worker_wait_time=None) -> dict:
    details = dict(res.details)
    details["skip_targets"] = res.skip_targets
    return {
        "priority": task["priority"], "starid": task["starid"],
        "sector": task["sector"], "camera": task["camera"], "ccd": task["ccd"],
        "cadence": task["cadence"], "datasource": task["datasource"],
        "tmag": task["tmag"], "status": res.status, "method_used": res.method,
        "time": elaptime, "worker_wait_time": worker_wait_time,
        "details": details,
    }


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Run TESS photometry (TPU).")
    add_logging_args(parser)
    parser.add_argument("-m", "--method", default=None,
                        choices=("aperture", "psf", "linpsf", "halo"))
    parser.add_argument("-t", "--test", action="store_true", help=argparse.SUPPRESS)
    parser.add_argument("--starid", type=int, default=None)
    parser.add_argument("--priority", type=int, default=None)
    parser.add_argument("-r", "--random", action="store_true")
    parser.add_argument("--all", action="store_true", help="Process all pending tasks.")
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--datasource", default=None, choices=("ffi", "tpf"))
    parser.add_argument("--camera", type=int, default=None)
    parser.add_argument("--ccd", type=int, default=None)
    parser.add_argument("--version", type=int, required=True,
                        help="Data release version to put in output files.")
    parser.add_argument("-o", "--output", default=None,
                        help="Output directory (default: alongside input).")
    parser.add_argument("-p", "--plot", action="store_true",
                        help="Render per-target diagnostic figures into "
                             "<output>/plots/<starid>/ (reference run_tessphot.py --plot).")
    parser.add_argument("--mesh", default=None, metavar="SPEC",
                        help="Run FFI extraction over a multi-chip device "
                             "mesh, e.g. 'time=4,targets=2' or 'auto' (all "
                             "devices time-sharded). Cubes upload sharded "
                             "across the mesh HBM.")
    parser.add_argument("input_folder", nargs="?", default=None)
    args = parser.parse_args(argv)
    logger = setup_logging(args)

    input_folder = resolve_input_folder(args.input_folder)
    output_folder = args.output or os.environ.get("TESSPHOT_OUTPUT") or input_folder

    from ..taskmanager import TaskManager
    from ..core.dispatcher import (ContextCache, HaloSwitchQueue,
                                   photometry_batch)

    constraints = {}
    if args.starid is not None:
        constraints["starid"] = args.starid
    if args.priority is not None:
        constraints["priority"] = args.priority
    if args.datasource:
        constraints["datasource"] = args.datasource
    if args.camera:
        constraints["camera"] = args.camera
    if args.ccd:
        constraints["ccd"] = args.ccd

    mesh = None
    if args.mesh:
        from ..parallel.mesh import parse_mesh_spec
        mesh = parse_mesh_spec(args.mesh)
        logger.info("Multi-chip mesh: %s",
                    dict(zip(mesh.axis_names, mesh.devices.shape)))

    summary = os.path.join(output_folder, "summary.json") if args.all else None
    with TaskManager(input_folder, cleanup=args.all, summary=summary) as tm, \
            ContextCache(mesh=mesh) as ctx_cache:
        n_done = 0
        # Halo-switch candidates accumulate across lease batches and rerun
        # as ONE halo batch (the TV-min program is latency-bound below ~32
        # targets); single-task modes keep the inline switch:
        halo_queue = HaloSwitchQueue() if args.all and not args.method else None

        def flush_halo(force=False):
            nonlocal n_done
            if halo_queue is None or not halo_queue.pending:
                return
            tic = default_timer()
            flushed = halo_queue.flush(force=force)
            if not flushed:
                return
            elap = (default_timer() - tic) / len(flushed)
            tm.save_results([task_to_result(t, res, elap)
                             for t, res in flushed])
            for t, res in flushed:
                n_done += 1
                logger.info("Priority %d: TIC %d -> %s (halo flush)",
                            t["priority"], t["starid"], res.status.name)

        while True:
            if args.random and not args.all:
                batch = [tm.get_random_task()]
                if batch[0] is None:
                    batch = []
            elif args.all:
                batch = tm.get_task_batch(batch_size=args.batch_size, **constraints)
            else:
                t = tm.get_task(**constraints)
                batch = [t] if t else []
            if not batch:
                break
            # The queue pins its SectorContext: resolve it before the
            # ContextCache evicts that context for a different CCD.
            if halo_queue is not None and not halo_queue.matches(batch[0]):
                flush_halo(force=True)
            tm.start_tasks([t["priority"] for t in batch])

            tic = default_timer()
            # FFI contexts (the expensive cube uploads) are reused across
            # consecutive same-CCD batches via the cache:
            ctx, cached = ctx_cache.get(input_folder, batch[0])
            try:
                if args.method:
                    for t in batch:
                        t["method"] = args.method
                # get_task_batch groups by exact datasource, so every task in
                # the batch shares this context (tpf:NNN groups are per-primary).
                results = photometry_batch(ctx, batch,
                                           output_folder=None if args.output is None else output_folder,
                                           version=args.version,
                                           plot_folder=output_folder if args.plot else None,
                                           halo_queue=halo_queue)
            finally:
                ctx_cache.release(ctx, cached)
            elaptime = (default_timer() - tic) / max(len(batch), 1)
            # One transaction/commit for the whole device batch; deferred
            # halo-switch candidates stay leased until their flush:
            ready = [(t, res) for t, res in zip(batch, results)
                     if not res.details.get("halo_switch_deferred")]
            tm.save_results([task_to_result(t, res, elaptime)
                             for t, res in ready])
            for t, res in ready:
                n_done += 1
                logger.info("Priority %d: TIC %d -> %s", t["priority"],
                            t["starid"], res.status.name)
            if halo_queue is not None and halo_queue.should_flush():
                flush_halo()
            if not args.all:
                break
        flush_halo(force=True)
        logger.info("%d task(s) processed.", n_done)
    return 0


if __name__ == "__main__":
    sys.exit(main())
