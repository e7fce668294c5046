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

STATUS_UNKNOWN = 0

__all__ = ["__version__"]
