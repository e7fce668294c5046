"""
Pallas TPU kernel: aperture flux extraction by direct HBM->VMEM stamp DMA.

The XLA formulation of the extraction (core.engine._extract_flux_batch)
expresses per-target stamp reads as gather ops.  This Pallas kernel instead
*streams* each target's (T, h, w) stamp column out of the HBM-resident cube
with an explicit async DMA whose source slice is computed from
scalar-prefetched stamp corners (the PrefetchScalarGridSpec pattern), then
reduces it against the target's mask in VMEM — touching exactly the stamp
bytes, with the DMA double-buffered across the target grid.

Used as an optional fast path by the engine (enable with
``PHOTOMETRY_TPU_PALLAS=1``); the XLA path remains the reference
implementation and the fallback on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pallas_extract_flux", "pallas_available"]


def pallas_available() -> bool:
    try:
        import jax.experimental.pallas  # noqa: F401
        return jax.default_backend() in ("tpu", "cpu")
    except ImportError:  # pragma: no cover
        return False


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def pallas_extract_flux(images, masks, r0s, c0s, h: int, w: int,
                        interpret: bool = False):
    """Masked stamp sums: (T, H, W) cube x (N, h, w) masks -> (N, T) fluxes.

    NaNs in the cube are treated as missing (excluded from the sums); frames
    whose in-mask pixels are all missing yield NaN, matching the XLA path.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, H, W = images.shape
    N = masks.shape[0]

    def kernel(r0s_ref, c0s_ref, images_hbm, mask_ref, out_ref, scratch, sem):
        i = pl.program_id(0)
        r0 = r0s_ref[i]
        c0 = c0s_ref[i]
        dma = pltpu.make_async_copy(
            images_hbm.at[:, pl.ds(r0, h), pl.ds(c0, w)], scratch, sem)
        dma.start()
        dma.wait()
        st = scratch[:]                                  # (T, h, w)
        m = mask_ref[0]                                  # (h, w)
        vals = jnp.where(m[None], st, jnp.nan)
        finite = jnp.isfinite(vals)
        total = jnp.sum(jnp.where(finite, vals, 0.0), axis=(1, 2))
        n_fin = jnp.sum(finite, axis=(1, 2))
        out_ref[0] = jnp.where(n_fin > 0, total, jnp.nan)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                 # cube in HBM
            pl.BlockSpec((1, h, w), lambda i, r0s_, c0s_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T), lambda i, r0s_, c0s_: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((T, h, w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, T), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(r0s, jnp.int32), jnp.asarray(c0s, jnp.int32),
      jnp.asarray(images, jnp.float32), jnp.asarray(masks))
