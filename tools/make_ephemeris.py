#!/usr/bin/env python
"""
Convert a JPL Horizons VECTORS export to the photometry_tpu ephemeris npz.

Offline provisioning path for real spacecraft ephemerides (the reference
pipeline downloads binary SPICE kernels at run time, spice.py:104-158):

1. https://ssd.jpl.nasa.gov/horizons/app/ -> Ephemeris Type "Vector Table",
   Target Body "TESS (spacecraft) [-95]", Coordinate Center "@0" (solar
   system barycenter), reference frame ICRF.  Any time span/step covering
   the sectors to process.  Download the result as a text file.
2. python tools/make_ephemeris.py horizons_export.txt
   (writes the npz into the worker cache, ~/.photometry_tpu/), or
   python tools/make_ephemeris.py horizons_export.txt -o my_ephemeris.npz
   and serve that file at the [timecorr] ephemeris_url settings key.

A synthetic-orbit sample in authentic Horizons format is shipped at
photometry_tpu/data/ephemeris/tess_horizons_sample.txt for format
validation and tests.
"""

import argparse
import os
import sys

# Runnable straight from a source checkout (tools/ sits beside the package):
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_REPO, "photometry_tpu")) and _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Convert a JPL Horizons VECTORS export to the "
                    "photometry_tpu spacecraft-ephemeris npz table.")
    parser.add_argument("horizons_file", help="Horizons text export (VECTORS)")
    parser.add_argument("-o", "--output", default=None,
                        help="Output npz path (default: the worker cache)")
    parser.add_argument("--earth", default=None, metavar="FILE",
                        help="Optional second VECTORS export for the EARTH "
                             "geocentre (target 399, center 500@0); enables "
                             "the Einstein clock term of "
                             "barycentric_correction_full.")
    args = parser.parse_args(argv)

    from photometry_tpu.download_cache import ephemeris_path, horizons_to_ephemeris
    out = args.output or ephemeris_path()
    eph = horizons_to_ephemeris(args.horizons_file, output=out,
                                earth_source=args.earth)
    span = eph.time[-1] - eph.time[0]
    print(f"{out}: {len(eph.time)} samples, JD {eph.time[0]:.3f}..."
          f"{eph.time[-1]:.3f} ({span:.1f} d)"
          + (", with Earth positions (Einstein term enabled)"
             if eph.pos_earth is not None else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
