"""
photometry_tpu — a TPU-native TESS photometry framework.

A from-scratch, JAX/XLA/Pallas re-design of the capabilities of the TASOC
photometry pipeline (reference: tasoc/photometry; Handberg et al. 2021,
AJ 162, 170).  Instead of the reference's one-star-at-a-time, file-thrashing
design, everything here is *batched and array-resident*:

- A sector-CCD is a ``(T, H, W)`` float32 cube living in device HBM
  (shardable over a ``jax.sharding.Mesh`` when it exceeds a single chip).
- Targets are a batch dimension; every photometric algorithm is a pure
  function ``(stamps, catalog_batch, params) -> lightcurve_batch`` under
  ``jax.vmap`` / ``jax.jit``.
- Host-side Python handles FITS/SQLite/HDF5 I/O and the work queue;
  nothing per-star crosses the host boundary in the hot loop.

Subpackages
-----------
``io``        FITS reader/writer, WCS (TAN+SIP), HDF5 cube store, discovery.
``ops``       JAX/Pallas numeric kernels (backgrounds, filters, labeling,
              splines, registration, statistics).
``models``    Photometry algorithms: aperture/K2P2, PSF, linear-PSF, halo.
``core``      Batched target engine, time correction, light-curve products,
              method dispatcher.
``parallel``  Device meshes, sharded cubes, distributed work scheduling.
``sim``       Synthetic FFI/TPF/catalog generation for tests and benchmarks.
"""

from .version import __version__  # noqa: F401
from .core.status import STATUS  # noqa: F401


def __getattr__(name):
    """Lazy top-level API (keeps `import photometry_tpu` light)."""
    lazy = {
        "SectorContext": ("photometry_tpu.core.engine", "SectorContext"),
        "ContextCache": ("photometry_tpu.core.dispatcher", "ContextCache"),
        "band_extract_flux_batch": ("photometry_tpu.ops.bandext", "band_extract_flux_batch"),
        "run_distributed": ("photometry_tpu.parallel.scheduler", "run_distributed"),
        "TpfContext": ("photometry_tpu.core.engine", "TpfContext"),
        "extract_aperture_batch": ("photometry_tpu.core.engine", "extract_aperture_batch"),
        "photometry_single": ("photometry_tpu.core.dispatcher", "photometry_single"),
        "photometry_batch": ("photometry_tpu.core.dispatcher", "photometry_batch"),
        "TaskManager": ("photometry_tpu.taskmanager", "TaskManager"),
        "prepare_photometry": ("photometry_tpu.prepare", "prepare_photometry"),
        "make_todo": ("photometry_tpu.todolist", "make_todo"),
        "make_catalog": ("photometry_tpu.catalog", "make_catalog"),
        "StarCatalog": ("photometry_tpu.catalog", "StarCatalog"),
        "PRF": ("photometry_tpu.models.prf", "PRF"),
        "TESSQualityFlags": ("photometry_tpu.quality", "TESSQualityFlags"),
        "PixelQualityFlags": ("photometry_tpu.quality", "PixelQualityFlags"),
        "CorrectorQualityFlags": ("photometry_tpu.quality", "CorrectorQualityFlags"),
        # Method extractors (reference's AperturePhotometry/PSFPhotometry/
        # LinPSFPhotometry/HaloPhotometry class analogues):
        "extract_psf_batch": ("photometry_tpu.models.psf_fit", "extract_psf_batch"),
        "extract_linpsf_batch": ("photometry_tpu.models.linpsf", "extract_linpsf_batch"),
        "extract_halo_batch": ("photometry_tpu.models.halo", "extract_halo_batch"),
        "MotionModel": ("photometry_tpu.core.motion", "MotionModel"),
        # NOTE: download_cache stays a submodule (photometry_tpu
        # .download_cache.download_cache) — exporting the function here
        # would be shadowed again whenever the submodule is imported.
    }
    if name in lazy:
        import importlib
        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'photometry_tpu' has no attribute {name!r}")


__all__ = ["__version__", "STATUS", "SectorContext", "TpfContext",
           "ContextCache", "band_extract_flux_batch", "run_distributed",
           "extract_aperture_batch", "photometry_single", "photometry_batch",
           "TaskManager", "prepare_photometry", "make_todo", "make_catalog",
           "StarCatalog", "PRF", "TESSQualityFlags", "PixelQualityFlags",
           "CorrectorQualityFlags", "extract_psf_batch", "extract_linpsf_batch",
           "extract_halo_batch", "MotionModel"]
