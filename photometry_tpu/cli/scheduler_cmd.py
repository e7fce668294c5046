"""
CLI: distributed master/worker photometry (counterpart of run_tessphot_mpi.py).

Usage:
    python -m photometry_tpu.cli.scheduler_cmd --workers 4 --version 5 [input_folder]
"""

from __future__ import annotations

import argparse
import json
import sys

from .common import add_logging_args, resolve_input_folder, setup_logging


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Distributed TESS photometry (master/worker pull scheduler).")
    add_logging_args(parser)
    parser.add_argument("--workers", type=int, default=2)
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--version", type=int, required=True)
    parser.add_argument("--camera", type=int, default=None)
    parser.add_argument("--ccd", type=int, default=None)
    parser.add_argument("--datasource", default=None, choices=("ffi", "tpf"))
    parser.add_argument("-o", "--output", default=None)
    parser.add_argument("--listen", default=None, metavar="[HOST:]PORT",
                        help="Master for cross-host workers: accept --workers "
                             "TCP connections instead of spawning local ones.")
    parser.add_argument("--connect", default=None, metavar="HOST:PORT",
                        help="Run as a remote worker joining the master at "
                             "HOST:PORT (no master loop on this host).")
    parser.add_argument("--mesh", default=None, metavar="SPEC",
                        help="Workers run FFI extraction over a multi-chip "
                             "device mesh, e.g. 'time=4,targets=2' or 'auto'.")
    parser.add_argument("input_folder", nargs="?", default=None)
    args = parser.parse_args(argv)
    setup_logging(args)
    input_folder = resolve_input_folder(args.input_folder)

    if args.connect:
        host, port = args.connect.rsplit(":", 1)
        from ..parallel.scheduler import worker_remote
        worker_remote((host, int(port)), input_folder,
                      output_folder=args.output, version=args.version,
                      platform=getattr(args, "jax_platform", None),
                      mesh_spec=args.mesh)
        return 0

    listen = None
    if args.listen:
        host, _, port = args.listen.rpartition(":")
        listen = (host or "0.0.0.0", int(port))

    from ..parallel.scheduler import run_distributed
    constraints = {}
    if args.camera:
        constraints["camera"] = args.camera
    if args.ccd:
        constraints["ccd"] = args.ccd
    if args.datasource:
        constraints["datasource"] = args.datasource
    summary = run_distributed(
        input_folder, n_workers=args.workers, version=args.version,
        output_folder=args.output, batch_size=args.batch_size,
        platform=getattr(args, "jax_platform", None), listen=listen,
        mesh_spec=args.mesh, **constraints)
    print(json.dumps(summary))
    return 0 if summary.get("drained", True) else 1


if __name__ == "__main__":
    sys.exit(main())
