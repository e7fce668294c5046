"""
Banded full-pass aperture extraction (Pallas/MXU).

The gather-based extraction (core.engine.extract_flux_core) reads scattered
17-px windows: on TPU each touched (8, 128) memory tile moves 4 KB to use
~100 useful bytes, capping effective bandwidth at a few % of HBM peak.  At
production target densities (>10k stamps per CCD ~ 70%+ pixel coverage,
BASELINE.md north star) it is cheaper to stream the WHOLE cube once,
sequentially, and reduce every stamp against it:

- The CCD is split into (64 x 128) cells (sublane x lane aligned).  Each
  target stamp intersects 1-4+ cells; each intersection is a "piece" with a
  dense (64, 128) patch holding its mask and its h x w window (for the
  shenanigans-any flag), encoded in one tensor as mask + 2*window ({0,2,3}).
- One Pallas instance per (cell, time-block) DMAs the cell's cube blocks
  (images/err/bkg/flags) into VMEM ONCE and contracts them against all M
  piece patches on the MXU: 10 masked reductions (flux, finite count, zero
  count, positive flux + its row/col moments for centroids, err^2,
  background sum + finite count, shenanigans) as (M, 8192) @ (8192, T_b)
  matmuls.
- Pieces re-assemble into per-target quantities with a segment-sum, and the
  NaN/all-bad semantics of extract_flux_core are applied.

Reference behavior: BasePhotometry.py:720-751, 1323-1414 (per-frame stamp
reads + masked sums); numerically asserted against extract_flux_core in
tests/test_bandext.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..quality import PixelQualityFlags

__all__ = ["band_extract_flux_batch", "build_piece_patches", "bands_supported"]

BH = 64     #: band (cell) height — sublane-aligned
TW = 128    #: tile (cell) width — one lane register
NQ = 10     #: reduction quantities per piece


def bands_supported(shape, T: int = 1, t_block: int = 1) -> bool:
    """The CCD must tile into whole (BH, TW) cells (T is handled by
    remainder launches, kept in the signature for compatibility)."""
    H, W = shape
    return (H % BH == 0) and (W % TW == 0)


def use_banded(ctx) -> bool:
    """Production gate: device-resident f32 cube on TPU-like hardware with a
    cell-tileable CCD (the Pallas kernel has no CPU (non-interpret) path)."""
    images = getattr(ctx, "images", None)
    if images is None or isinstance(images, np.ndarray):
        return False
    if images.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if not bands_supported(ctx.shape):
        return False
    try:
        dev = next(iter(images.devices()))
        return "tpu" in (dev.platform + " "
                         + getattr(dev, "device_kind", "")).lower()
    except Exception:
        return False


def build_piece_patches(masks, r0s, c0s, shape) -> dict:
    """Decompose stamps into per-cell pieces; patches are built ON DEVICE.

    Host work is only the tiny piece table (which stamp intersects which
    cell, at what offset); the dense (n_cells, M, BH*TW) patch tensor —
    ~1 GB at 10k targets — is gathered from the (N, h, w) mask stack by
    :func:`_patches_device`, so no bulk host->device upload happens.

    Returns dict with:
      patches      (n_cells, M, BH*TW) float32 device array — mask + 2*window
      piece_target (n_cells*M,) int32 — target index (N for padding slots)
      plus device-resident combine inputs (piece_target_dev, cell_row0_dev,
      cell_col0_dev, mask_size_dev).
    """
    masks = np.asarray(masks)
    r0s = np.asarray(r0s, np.int64)
    c0s = np.asarray(c0s, np.int64)
    N, h, w = masks.shape
    H, W = shape
    nbr, nbc = H // BH, W // TW
    n_cells = nbr * nbc

    # Vectorized piece table: every (target, intersected cell) pair.
    b0 = r0s // BH
    nb = (r0s + h - 1) // BH - b0 + 1
    t0 = c0s // TW
    nt = (c0s + w - 1) // TW - t0 + 1
    npieces = nb * nt
    tgt = np.repeat(np.arange(N, dtype=np.int64), npieces)
    starts = np.concatenate([[0], np.cumsum(npieces)[:-1]])
    k = np.arange(int(npieces.sum()), dtype=np.int64) - np.repeat(starts, npieces)
    cell = ((b0[tgt] + k // nt[tgt]) * nbc + (t0[tgt] + k % nt[tgt]))
    order = np.argsort(cell, kind="stable")
    cell = cell[order]
    tgt = tgt[order]
    counts = np.bincount(cell, minlength=n_cells)
    M = max(int(counts.max()) if len(cell) else 1, 1)
    M = int(np.ceil(M / 8) * 8)  # sublane-friendly piece count
    cell_first = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot = np.arange(len(cell), dtype=np.int64) - cell_first[cell]

    piece_target = np.full((n_cells, M), N, np.int32)
    piece_dr = np.zeros((n_cells, M), np.int32)  # stamp r0 - cell r0
    piece_dc = np.zeros((n_cells, M), np.int32)
    piece_target[cell, slot] = tgt
    piece_dr[cell, slot] = r0s[tgt] - (cell // nbc) * BH
    piece_dc[cell, slot] = c0s[tgt] - (cell % nbc) * TW
    cell_idx = np.arange(n_cells)
    patches = _patches_device(
        jnp.asarray(masks.astype(np.uint8)),
        jnp.asarray(piece_target.reshape(-1)),
        jnp.asarray(piece_dr.reshape(-1)), jnp.asarray(piece_dc.reshape(-1)),
        n_cells=n_cells, M=M)
    # Device-resident copies of the combine-step inputs, so per-time-block
    # extraction calls involve no host<->device transfers (the axon tunnel
    # RTT per transfer would otherwise dominate streamed extraction):
    return {
        "patches": patches,
        "piece_target": piece_target.reshape(-1),
        "piece_target_dev": jnp.asarray(piece_target.reshape(-1)),
        "cell_row0_dev": jnp.asarray(((cell_idx // nbc) * BH), jnp.float32),
        "cell_col0_dev": jnp.asarray(((cell_idx % nbc) * TW), jnp.float32),
        "mask_size_dev": jnp.asarray(
            masks.reshape(N, -1).sum(axis=1), jnp.float32),
        "n_targets": N,
        "M": M,
    }


@functools.partial(jax.jit, static_argnames=("n_cells", "M"))
def _patches_device(masks_u8, piece_target, piece_dr, piece_dc,
                    n_cells: int, M: int):
    """(n_cells*M,) piece table -> (n_cells, M, BH*TW) patch tensor, on device.

    patch[p, r, l] = 2*window + mask, where window = stamp covers cell pixel
    (r, l) and mask = masks[target, r - dr, l - dc].  The (dr, dc) placement
    runs as two one-hot batched matmuls on the MXU — a naive XLA gather of
    the ~1 GB patch tensor is ~20x slower on TPU.
    """
    N, h, w = masks_u8.shape
    msel = masks_u8[piece_target.clip(0, N - 1)].astype(jnp.float32)  # (P,h,w)
    r_idx = jnp.arange(BH, dtype=jnp.int32)[None, :, None]
    l_idx = jnp.arange(TW, dtype=jnp.int32)[None, None, :]
    dr = piece_dr[:, None, None]
    dc = piece_dc[:, None, None]
    rowoh = (r_idx - dr == jnp.arange(h, dtype=jnp.int32)[None, None, :])
    coloh = (jnp.arange(w, dtype=jnp.int32)[None, :, None] + dc == l_idx)
    tmp = jnp.einsum("pri,pij->prj", rowoh.astype(jnp.float32), msel)
    patch = jnp.einsum("prj,pjl->prl", tmp, coloh.astype(jnp.float32))
    win = ((r_idx >= dr) & (r_idx < dr + h) & (l_idx >= dc) & (l_idx < dc + w)
           & (piece_target[:, None, None] < N))
    out = jnp.where(win, 2.0 + patch, 0.0)
    return out.reshape(n_cells, M, BH * TW)


def _band_kernel(img_ref, err_ref, bkg_ref, flg_ref, p_ref, out_ref):
    """One (cell, time-block) instance: NQ masked reductions on the MXU.

    Cube refs are (t_block, BH, TW) cell blocks DMA'd straight from the
    (T, H, W) layout; flattening the (BH, TW) cell to one K=8192 axis is a
    cheap in-VMEM relayout (measured: the whole kernel runs at ~160 GB/s
    effective, ~7x the scattered-gather formulation at 10k targets).
    """
    K = BH * TW
    x = img_ref[...].reshape(img_ref.shape[0], K).astype(jnp.float32)  # (T_b, K)
    fin = jnp.isfinite(x)
    x0 = jnp.where(fin, x, 0.0)
    rx = jnp.maximum(x0, 0.0)
    # lane/row index of each flat-cell pixel (Mosaic iota is integer-typed):
    k_io = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    l_io = (k_io % TW).astype(jnp.float32)
    r_io = (k_io // TW).astype(jnp.float32)
    e = err_ref[...].reshape(x.shape).astype(jnp.float32)
    e0 = jnp.where(jnp.isfinite(e), e, 0.0)
    b = bkg_ref[...].reshape(x.shape).astype(jnp.float32)
    finb = jnp.isfinite(b)
    b0 = jnp.where(finb, b, 0.0)
    sh = (flg_ref[...].reshape(x.shape)
          & PixelQualityFlags.BackgroundShenanigans) != 0

    p2 = p_ref[0]                                  # (M, K) in {0, 2, 3}
    pm = jnp.maximum(p2 - 2.0, 0.0)                # mask patch
    pw = jnp.minimum(p2, 1.0)                      # window patch

    def red(patch, operand):
        return jax.lax.dot_general(
            patch, operand, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)   # (M, T_b)

    out_ref[0, 0] = red(pm, x0)                            # flux total
    out_ref[1, 0] = red(pm, fin.astype(jnp.float32))       # n finite
    out_ref[2, 0] = red(pm, (x == 0).astype(jnp.float32))  # n exactly zero
    out_ref[3, 0] = red(pm, rx)                            # wsum
    out_ref[4, 0] = red(pm, rx * l_io)                     # col moment (local)
    out_ref[5, 0] = red(pm, rx * r_io)                     # row moment (local)
    out_ref[6, 0] = red(pm, e0 * e0)                       # err^2
    out_ref[7, 0] = red(pm, b0)                            # background sum
    out_ref[8, 0] = red(pm, finb.astype(jnp.float32))      # background n
    out_ref[9, 0] = red(pw, sh.astype(jnp.float32))        # shenanigans (window)


@functools.partial(jax.jit, static_argnames=("t_block", "interpret"))
def _band_launch(images, images_err, backgrounds, pixelflags, patches,
                 t_block: int = 128, interpret: bool = False):
    """Run the band kernel over a (T, H, W) cube -> Q (NQ, n_cells, M, T)."""
    from jax.experimental import pallas as pl
    T, H, W = images.shape
    n_cells, M = patches.shape[0], patches.shape[1]
    K = BH * TW
    n_tb = T // t_block
    nbc = W // TW

    cube_spec = pl.BlockSpec((t_block, BH, TW),
                             lambda c, t: (t, c // nbc, c % nbc))
    kwargs = {}
    if not interpret:
        # The kernel materialises several (t_block, K) operand variants;
        # the default 16 MB scoped-VMEM budget is too small (v5e has 128 MB).
        from jax.experimental.pallas import tpu as pltpu
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024)
    return pl.pallas_call(
        _band_kernel,
        grid=(n_cells, n_tb),
        in_specs=[cube_spec, cube_spec, cube_spec, cube_spec,
                  pl.BlockSpec((1, M, K), lambda c, t: (c, 0, 0))],
        out_specs=pl.BlockSpec((NQ, 1, M, t_block), lambda c, t: (0, c, 0, t)),
        out_shape=jax.ShapeDtypeStruct((NQ, n_cells, M, T), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(images, images_err, backgrounds, pixelflags, patches)


@functools.partial(jax.jit, static_argnames=("n_targets",))
def _combine(Q, piece_target, cell_row0, cell_col0, mask_size,
             n_targets: int):
    """Piece quantities -> per-target outputs with extract_flux_core semantics."""
    NQ_, n_cells, M, T = Q.shape
    # centroid moments need the cell origin applied per piece (1-based):
    cx_piece = Q[4] + (cell_col0[:, None, None] + 1.0) * Q[3]
    cy_piece = Q[5] + (cell_row0[:, None, None] + 1.0) * Q[3]
    stacked = jnp.stack(
        [Q[0], Q[1], Q[2], Q[3], cx_piece, cy_piece, Q[6], Q[7], Q[8], Q[9]],
        axis=0).reshape(NQ_, n_cells * M, T)
    seg = jax.ops.segment_sum(
        jnp.transpose(stacked, (1, 0, 2)), piece_target,
        num_segments=n_targets + 1)[:n_targets]          # (N, NQ, T)
    total = seg[:, 0]
    n_fin = seg[:, 1]
    n_zero = seg[:, 2]
    wsum = seg[:, 3]
    cx = seg[:, 4]
    cy = seg[:, 5]
    err2 = seg[:, 6]
    bsum = seg[:, 7]
    bn = seg[:, 8]
    shen = seg[:, 9] > 0.5

    all_zero = n_zero >= mask_size[:, None] - 0.5
    all_bad = (n_fin < 0.5) | all_zero
    flux = jnp.where(all_bad, jnp.nan, total)
    ferr = jnp.where(all_bad, jnp.nan, jnp.sqrt(err2))
    cxn = cx / jnp.maximum(wsum, 1e-30)
    cyn = cy / jnp.maximum(wsum, 1e-30)
    cent = jnp.where(wsum[..., None] > 0,
                     jnp.stack([cxn, cyn], axis=-1), jnp.nan)
    fbkg = jnp.where(bn > 0.5, bsum, jnp.nan)
    return flux, ferr, fbkg, cent, shen


def band_extract_flux_batch(images, images_err, backgrounds, pixelflags,
                            masks, r0s, c0s, h: int, w: int,
                            t_block: int = 128, interpret: bool = False,
                            pieces: dict = None):
    """Full-pass banded extraction; same outputs as extract_flux_core.

    ``pieces`` (from :func:`build_piece_patches`) may be precomputed and
    reused across streamed time blocks.
    """
    T, H, W = images.shape
    if not bands_supported((H, W)):
        raise ValueError(f"banded extraction needs H%{BH}==0, W%{TW}==0; "
                         f"got {(T, H, W)}")
    t_block = min(t_block, T)
    if pieces is None:
        pieces = build_piece_patches(masks, r0s, c0s, (H, W))
    # Arbitrary T: full t_block launches + one remainder launch.
    T_main = (T // t_block) * t_block
    Qs = []
    if T_main:
        Qs.append(_band_launch(images[:T_main], images_err[:T_main],
                               backgrounds[:T_main], pixelflags[:T_main],
                               pieces["patches"], t_block=t_block,
                               interpret=interpret))
    if T_main < T:
        Qs.append(_band_launch(images[T_main:], images_err[T_main:],
                               backgrounds[T_main:], pixelflags[T_main:],
                               pieces["patches"], t_block=T - T_main,
                               interpret=interpret))
    Q = Qs[0] if len(Qs) == 1 else jnp.concatenate(Qs, axis=-1)
    return _combine(Q, pieces["piece_target_dev"], pieces["cell_row0_dev"],
                    pieces["cell_col0_dev"], pieces["mask_size_dev"],
                    n_targets=int(pieces["n_targets"]))
