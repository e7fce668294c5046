"""
CLI: create (or fetch) catalog files for a sector.

Counterpart of reference run_make_catalog.py:69: generate the
``catalog_sector{S}_camera{C}_ccd{D}.sqlite`` files photometry needs, for
every requested camera/CCD of one sector.  Two sources, tried in order:

1. A prebuilt-catalog URL (``[catalog] url`` settings key or
   ``PHOTOMETRY_TPU_CATALOG_URL``; placeholders ``{sector}``/``{camera}``/
   ``{ccd}``) — the portable analogue of the reference's tasoc.dk download
   (catalog.py:338-388), mirroring the ``[timecorr] ephemeris_url``
   mechanism.
2. A local TIC extract file (``--tic-source``, npz or whitespace table
   with starid/ra/dec/pm_ra/pm_dec/tmag[/teff]) — replacing the reference's
   TASOC-internal PostgreSQL query (catalog.py:109-336, tasoc_db.py).

Usage:
    python -m photometry_tpu.cli.catalog_cmd [options] sector [input_folder]
"""

from __future__ import annotations

import argparse
import os
import sys

from .common import add_logging_args, resolve_input_folder, setup_logging


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Create/fetch catalog files (TPU photometry).")
    add_logging_args(parser)
    parser.add_argument("--camera", type=int, default=None, action="append",
                        choices=(1, 2, 3, 4))
    parser.add_argument("--ccd", type=int, default=None, action="append",
                        choices=(1, 2, 3, 4))
    parser.add_argument("-o", "--overwrite", action="store_true")
    parser.add_argument("--tic-source", default=None,
                        help="TIC extract file (.npz or whitespace table) to "
                             "build catalogs from when no prebuilt source is "
                             "configured.")
    parser.add_argument("--buffer", type=float, default=0.2,
                        help="Coordinate buffer around the footprint, deg "
                             "(reference run_make_catalog.py --buffer).")
    parser.add_argument("sector", type=int,
                        help="TESS observing sector to generate catalogs for.")
    parser.add_argument("input_folder", nargs="?", default=None)
    args = parser.parse_args(argv)
    logger = setup_logging(args)
    input_folder = resolve_input_folder(args.input_folder)

    from ..catalog import (catalog_filename, download_catalogs, make_catalog)

    cameras = args.camera or [1, 2, 3, 4]
    ccds = args.ccd or [1, 2, 3, 4]

    # Source 1: prebuilt catalogs (existing files count as present):
    if args.overwrite:
        for cam in cameras:
            for c in ccds:
                path = os.path.join(input_folder,
                                    catalog_filename(args.sector, cam, c))
                if os.path.exists(path):
                    os.remove(path)
    done = set(download_catalogs(input_folder, args.sector,
                                 camera=cameras, ccd=ccds))

    # Source 2: build missing ones from a TIC extract:
    missing = []
    for cam in cameras:
        for c in ccds:
            path = os.path.join(input_folder,
                                catalog_filename(args.sector, cam, c))
            if path in done or os.path.exists(path):
                continue
            if args.tic_source:
                path = make_catalog(input_folder, args.sector, cam, c,
                                    tic_source=args.tic_source,
                                    overwrite=args.overwrite,
                                    coord_buffer=args.buffer)
                logger.info("Created %s", path)
            else:
                missing.append((cam, c))
    if missing:
        logger.error(
            "No catalog source for %s: configure [catalog] url (or "
            "PHOTOMETRY_TPU_CATALOG_URL) for prebuilt downloads, or pass "
            "--tic-source <extract file>.",
            ", ".join(f"camera={cam} ccd={c}" for cam, c in missing))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
