"""
CLI: run photometry from the TODO list.

Counterpart of reference run_tessphot.py: select a task by --starid,
--priority, --random or queue order; or drain the whole queue with --all.
The TPU-native default drains the queue in *batches* leased per
(sector, camera, ccd, datasource, cadence) so a single device context is
reused across hundreds of targets (the loop itself lives in
photometry_tpu.core.drain, shared with bench.py's end-to-end drain row).

Usage:
    python -m photometry_tpu.cli.photometry_cmd [options] [input_folder]
"""

from __future__ import annotations

import argparse
import os
import sys

from .common import add_logging_args, resolve_input_folder, setup_logging

# Re-exported for backwards compatibility (the diagnostics-row builder
# moved to core.drain alongside the loop):
from ..core.drain import task_to_result  # noqa: F401


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

    from ..core.drain import run_drain
    run_drain(
        input_folder, args.version,
        output_folder=output_folder,
        # None keeps the reference's default product layout under the input:
        products_folder=None if args.output is None else output_folder,
        all_tasks=args.all, random_task=args.random,
        batch_size=args.batch_size, method=args.method,
        constraints=constraints, plot=args.plot, mesh=mesh,
        summary=os.path.join(output_folder, "summary.json") if args.all else None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
