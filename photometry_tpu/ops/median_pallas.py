"""Pallas exact 15x15 median filter — a KEPT, MEASURED-AND-REJECTED
experiment (round 5).  NOT on any production path.

Hypothesis: the XLA bisection filter (ops.filters._median_block,
~0.44 s per 2048^2 frame) is HBM-bound on its k^2-deep shifted-stack
re-reads, so keeping each block's neighborhood in VMEM should win big.

Measured result: FALSE on this v5e.  Both VMEM formulations are exact
(bit-identical to the XLA path, including the 3.4e38 inf-surrogate case)
but SLOWER:
- shift-on-read (15 col-shift buffers, sublane-offset row reads during
  the counting passes): 818 ms/frame;
- stack-in-VMEM (full 225-window stack materialised per 16-row block,
  fully aligned pass reads): 1,112 ms/frame.
The counting passes are VPU-compute/codegen-bound (~12k int compare-adds
per output element for per-pixel probe bisection — irreducible while the
probes vary per pixel, since windowed counting is only separable for
SHARED thresholds), and Mosaic's generated loop runs them well below the
XLA fusion's streaming rate.  The XLA formulation stays production.

Original design notes:

- the input block (BR+16 rows, padded width) DMAs in once (~16.8 MB/frame
  of total HBM reads instead of ~25 GB);
- the full 225-window stack is materialised ONCE per (16-row, W) block in
  VMEM (~30 MB), so every counting pass reads aligned rows (per-access
  sublane/lane shifts during the passes measured ~2x slower than even the
  XLA path);
- selection runs the same exact int32 bit-pattern bisection as the XLA
  path, tuned for the compute-bound regime: THREE probes per pass
  (passes stream no memory here, so fewer compare-adds per element wins
  over fewer passes), 17 passes to resolve the full int32 range.

Bit-exact vs ops.filters._median_block (same order statistic, same
key mapping); validated by tests/test_ops_stats_filters.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["median15_tpu", "median_pallas_supported"]

BR = 16            #: output rows per grid step (stack fits VMEM)
SIZE = 15
HALF = SIZE // 2


def median_pallas_supported(size: int, W: int) -> bool:
    if size != SIZE or W % 128:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _kernel(inp_hbm, out_ref, shifts, inbuf, sem, *, WP: int, W: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from .stats import _f32_to_ordkey, _ordkey_to_f32

    f = pl.program_id(0)
    j = pl.program_id(1)

    # Whole (BR+16, WP) input block in one aligned DMA:
    pltpu.make_async_copy(
        inp_hbm.at[f, pl.ds(j * BR, BR + 16), pl.ds(0, WP)],
        inbuf, sem).start()
    pltpu.make_async_copy(
        inp_hbm.at[f, pl.ds(j * BR, BR + 16), pl.ds(0, WP)],
        inbuf, sem).wait()

    # Materialise the FULL 225-window stack in VMEM once per block (BR is
    # sized so it fits); every bisection pass then reads fully ALIGNED
    # VMEM rows — per-access sublane/lane shifts during the passes made a
    # shift-on-read formulation ~2x slower than even the XLA path:
    block = _f32_to_ordkey(inbuf[...])            # (BR+16, WP) int32
    for dy in range(SIZE):
        for dx in range(SIZE):
            shifts[dy * SIZE + dx, :, :] = block[dy:dy + BR, dx:dx + W]

    target = (SIZE * SIZE) // 2 + 1

    big = jnp.int32(2**31 - 1)
    small = jnp.int32(-(2**31 - 1) - 1)
    lo = jnp.full((BR, W), big)
    hi = jnp.full((BR, W), small)
    for k in range(SIZE * SIZE):
        v = shifts[k]
        lo = jnp.minimum(lo, v)
        hi = jnp.maximum(hi, v)
    lo = lo - 1

    def _avg(a, b):
        return (a & b) + ((a ^ b) >> 1)

    def body(_, lohi):
        lo, hi = lohi
        m2 = _avg(lo, hi)
        m1, m3 = _avg(lo, m2), _avg(m2, hi)
        c1 = jnp.zeros((BR, W), jnp.int32)
        c2 = jnp.zeros((BR, W), jnp.int32)
        c3 = jnp.zeros((BR, W), jnp.int32)
        for k in range(SIZE * SIZE):
            v = shifts[k]
            c1 += (v <= m1).astype(jnp.int32)
            c2 += (v <= m2).astype(jnp.int32)
            c3 += (v <= m3).astype(jnp.int32)
        g1 = c1 >= target
        g2 = c2 >= target
        g3 = c3 >= target
        new_hi = jnp.where(g1, m1, jnp.where(g2, m2, jnp.where(g3, m3, hi)))
        new_lo = jnp.where(~g3, m3, jnp.where(~g2, m2, jnp.where(~g1, m1, lo)))
        return new_lo, new_hi

    # ceil(33 / 2 bits) + safety = 18 quartering passes resolve int32:
    lo, hi = jax.lax.fori_loop(0, 18, body, (lo, hi))
    out_ref[0] = _ordkey_to_f32(hi)


@functools.partial(jax.jit, static_argnames=("H", "W"))
def _median15_padded(inp, H: int, W: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    F = inp.shape[0]
    WP = inp.shape[2]
    n_blocks = H // BR

    return pl.pallas_call(
        functools.partial(_kernel, WP=WP, W=W),
        grid=(F, n_blocks),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, BR, W), lambda f, j: (f, j, 0)),
        out_shape=jax.ShapeDtypeStruct((F, n_blocks * BR, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((SIZE * SIZE, BR, W), jnp.int32),
            pltpu.VMEM((BR + 16, WP), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(inp)


def median15_tpu(arr: np.ndarray) -> np.ndarray:
    """Exact 15x15 reflect-padded median of (T, H, W) or (H, W) images.

    Same semantics as scipy.ndimage.median_filter(size=15, mode='reflect')
    on NaN-free input (callers nan_to_num first, like the XLA path).
    """
    arr = jnp.asarray(arr, jnp.float32)
    squeeze = arr.ndim == 2
    if squeeze:
        arr = arr[None]
    F, H, W = arr.shape
    # symmetric pad + alignment: rows to a BR multiple (+16 halo slack),
    # cols to a 128 multiple:
    HB = -(-H // BR) * BR
    WP = -(-(W + 2 * HALF) // 128) * 128
    padded = jnp.pad(arr, ((0, 0), (HALF, HALF), (HALF, HALF)),
                     mode="symmetric")
    padded = jnp.pad(padded, ((0, 0), (0, HB + 16 - (H + 2 * HALF)),
                              (0, WP - (W + 2 * HALF))))
    out = _median15_padded(padded, HB, W)
    out = out[:, :H]
    return np.asarray(out[0] if squeeze else out)
