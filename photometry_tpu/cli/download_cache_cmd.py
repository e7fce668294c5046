"""CLI: pre-populate worker caches (counterpart of run_download_cache.py)."""

from __future__ import annotations

import argparse
import sys

from .common import add_logging_args, setup_logging


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Download/generate worker caches.")
    add_logging_args(parser)
    parser.add_argument("-t", "--testing", action="store_true",
                        help="Only cover the test sectors (1 and 27).")
    args = parser.parse_args(argv)
    setup_logging(args)
    from ..download_cache import download_cache
    print(download_cache(testing=args.testing))
    return 0


if __name__ == "__main__":
    sys.exit(main())
