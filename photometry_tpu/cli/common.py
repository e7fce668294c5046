"""Shared CLI plumbing: logging setup and standard folder arguments."""

from __future__ import annotations

import argparse
import logging
import os


def add_logging_args(parser: argparse.ArgumentParser):
    parser.add_argument("-d", "--debug", action="store_true", help="Print debug messages.")
    parser.add_argument("-q", "--quiet", action="store_true", help="Only report warnings and errors.")
    parser.add_argument("--jax-platform", default=None,
                        help="Force the JAX backend (e.g. 'cpu', 'tpu'). Also "
                             "honoured from PHOTOMETRY_TPU_PLATFORM. Needed "
                             "because in some deployments jax is pre-imported "
                             "before JAX_PLATFORMS can take effect.")


def enable_compile_cache():
    """Persistent XLA compilation cache: first-compile costs are paid once
    per program *shape*, not once per process — essential for a fleet of
    short-lived workers.

    Only enabled for accelerator backends: CPU AOT artifacts bake in the
    compiling machine's feature set, and loading them on a different host
    risks SIGILL (observed with a remote compile service in the cache path).
    """
    import jax
    try:
        if jax.default_backend() == "cpu":
            return
    except Exception:  # pragma: no cover
        return
    cache = os.environ.get("PHOTOMETRY_TPU_COMPILE_CACHE",
                           os.path.join(os.path.expanduser("~"),
                                        ".photometry_tpu", "jax_cache"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax versions
        pass


def setup_logging(args) -> logging.Logger:
    platform = getattr(args, "jax_platform", None) or os.environ.get("PHOTOMETRY_TPU_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)
    enable_compile_cache()
    level = logging.INFO
    if getattr(args, "quiet", False):
        level = logging.WARNING
    if getattr(args, "debug", False):
        level = logging.DEBUG
    logging.basicConfig(level=level,
                        format="%(asctime)s - %(levelname)s - %(message)s")
    return logging.getLogger("photometry_tpu")


def resolve_input_folder(arg) -> str:
    """Input folder from CLI arg or TESSPHOT_INPUT environment variable."""
    folder = arg or os.environ.get("TESSPHOT_INPUT")
    if not folder:
        raise SystemExit("Please specify an input folder (or set TESSPHOT_INPUT).")
    if not os.path.isdir(folder):
        raise SystemExit(f"Not a directory: {folder}")
    return folder
