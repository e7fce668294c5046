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
- Pieces re-assemble into per-target quantities by a static row-gather of
  piece-major (NQ, T)-contiguous rows followed by a dense sum over each
  target's <= P_max pieces (a scatter/segment-sum here was measured ~10x
  slower on TPU), and the NaN/all-bad semantics of extract_flux_core are
  applied.

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


def build_piece_patches(masks, r0s, c0s, shape, windows=None) -> dict:
    """Decompose stamps into per-cell pieces; patches are built ON DEVICE.

    Host work is only the tiny piece table (which stamp intersects which
    cell, at what offset) — computed from ``r0s``/``c0s`` alone; the dense
    (n_cells, M, BH*TW) patch tensor — ~1 GB at 10k targets — is gathered
    from the (N, h, w) mask stack by :func:`_patches_device`, so no bulk
    host->device upload happens.  ``masks`` may be a device array (the
    production path: masks come straight from the batched K2P2 builder and
    never round-trip through the host) or host numpy.

    Returns dict with:
      patches      (n_cells, M, BH*TW) bfloat16 device array — mask + 2*window
                   (values {0, 2, 3}: bf16-exact, halves the kernel's patch
                   DMA traffic vs f32)
      piece_target (n_cells*M,) int32 — target index (N for padding slots)
      plus device-resident combine inputs: the target -> piece-row gather
      table (tp_idx_dev (N, P_max) int32 with tp_valid_dev weights) and
      per-piece cell origins (cell_row0_dev / cell_col0_dev (n_cells*M,)).

    All host-side tables ship in ONE packed int32 upload (the axon tunnel
    costs ~30 ms RTT per transfer; the previous 7 small uploads were ~70%
    of the whole patch-build wall) and are unpacked by a single jitted
    device program (:func:`_unpack_tables`).
    """
    if isinstance(masks, np.ndarray):
        masks_u8 = jnp.asarray(masks.astype(np.uint8))
    else:
        masks_u8 = masks.astype(jnp.uint8)
    if windows is None:
        win_u8 = jnp.ones_like(masks_u8)
    elif isinstance(windows, np.ndarray):
        win_u8 = jnp.asarray(windows.astype(np.uint8))
    else:
        win_u8 = windows.astype(jnp.uint8)
    mask_size = jnp.sum(masks_u8.reshape(masks_u8.shape[0], -1)
                        .astype(jnp.float32), axis=1)
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
    # Target -> flat-piece-row gather table for the combine step: each
    # target's <= P_max piece rows, zero-weight padded (combine multiplies
    # the gathered rows by tp_valid before summing, so the padding index
    # value never leaks through).  Padding slots carry -1 in the packed
    # upload; the device unpack derives the validity weights from the sign.
    flat_rows = (cell * M + slot).astype(np.int64)
    order_t = np.argsort(tgt, kind="stable")
    rows_t = flat_rows[order_t]
    tgt_t = tgt[order_t]
    cnt_t = np.bincount(tgt_t, minlength=N)
    P_max = max(int(cnt_t.max()) if len(cnt_t) else 1, 1)
    first_t = np.concatenate([[0], np.cumsum(cnt_t)[:-1]])
    slot_t = np.arange(len(tgt_t), dtype=np.int64) - first_t[tgt_t]
    tp_idx = np.full((N, P_max), -1, np.int64)
    tp_idx[tgt_t, slot_t] = rows_t
    # ONE host->device upload for every table, then one jitted unpack
    # (cell origins are pure arithmetic on the piece index — no upload):
    packed = jnp.asarray(np.concatenate([
        piece_target.reshape(-1).astype(np.int32),
        piece_dr.reshape(-1).astype(np.int32),
        piece_dc.reshape(-1).astype(np.int32),
        tp_idx.reshape(-1).astype(np.int32),
    ]))
    (pt_dev, pdr_dev, pdc_dev, tp_idx_dev, tp_valid_dev,
     cell_row0_dev, cell_col0_dev) = _unpack_tables(
        packed, n_cells=n_cells, M=M, nbc=nbc, N=N, P_max=P_max)
    patches = _patches_device(masks_u8, win_u8, pt_dev, pdr_dev, pdc_dev,
                              n_cells=n_cells, M=M)
    return {
        "patches": patches,
        "piece_target": piece_target.reshape(-1),
        "tp_idx_dev": tp_idx_dev,
        "tp_valid_dev": tp_valid_dev,
        "cell_row0_dev": cell_row0_dev,
        "cell_col0_dev": cell_col0_dev,
        "mask_size_dev": mask_size,
        "n_targets": N,
        "M": M,
        "P_max": P_max,
    }


@functools.partial(jax.jit,
                   static_argnames=("n_cells", "M", "nbc", "N", "P_max"))
def _unpack_tables(packed, n_cells: int, M: int, nbc: int,
                   N: int, P_max: int):
    """Split the single packed int32 upload into the device-side tables."""
    P = n_cells * M
    pt = packed[:P]
    pdr = packed[P:2 * P]
    pdc = packed[2 * P:3 * P]
    tp = packed[3 * P:3 * P + N * P_max].reshape(N, P_max)
    tp_valid = (tp >= 0).astype(jnp.float32)
    tp_idx = jnp.maximum(tp, 0)
    i = jnp.arange(P, dtype=jnp.int32) // M
    cell_row0 = ((i // nbc) * BH).astype(jnp.float32)
    cell_col0 = ((i % nbc) * TW).astype(jnp.float32)
    return pt, pdr, pdc, tp_idx, tp_valid, cell_row0, cell_col0


@functools.partial(jax.jit, static_argnames=("n_cells", "M"))
def _patches_device(masks_u8, win_u8, piece_target, piece_dr, piece_dc,
                    n_cells: int, M: int):
    """(n_cells*M,) piece table -> (n_cells, M, BH*TW) patch tensor, on device.

    patch[p, r, l] = 2*window + mask, where window = the target's window
    map covers cell pixel (r, l) and mask = masks[target, r - dr, l - dc].
    The window map defaults to the whole stamp rect; the engine passes the
    target's *logical* stamp so the shenanigans flag (the one reduction
    that uses the window, not the mask) is independent of how large the
    shared padded bucket happens to be (reference semantics: "detected
    somewhere in the final stamp", BasePhotometry.py:1446-1451).

    The (dr, dc) placement runs as two one-hot batched matmuls on the MXU —
    a naive XLA gather of the ~1 GB patch tensor is ~20x slower on TPU.
    Everything is bf16: one-hot x {0..3} products have at most one nonzero
    term per output, so the matmuls are exact, and the output values
    {0, 2, 3} are bf16-exact — measured ~25% faster than the f32
    formulation and half the HBM.
    """
    N, h, w = masks_u8.shape
    # combined source in {0, 2, 3}: window >= mask guaranteed by caller:
    src = (2 * jnp.maximum(win_u8, masks_u8) + masks_u8)
    ssel = src[piece_target.clip(0, N - 1)].astype(jnp.bfloat16)  # (P,h,w)
    r_idx = jnp.arange(BH, dtype=jnp.int32)[None, :, None]
    l_idx = jnp.arange(TW, dtype=jnp.int32)[None, None, :]
    dr = piece_dr[:, None, None]
    dc = piece_dc[:, None, None]
    rowoh = (r_idx - dr == jnp.arange(h, dtype=jnp.int32)[None, None, :])
    coloh = (jnp.arange(w, dtype=jnp.int32)[None, :, None] + dc == l_idx)
    tmp = jnp.einsum("pri,pij->prj", rowoh.astype(jnp.bfloat16), ssel,
                     preferred_element_type=jnp.bfloat16)
    patch = jnp.einsum("prj,pjl->prl", tmp, coloh.astype(jnp.bfloat16),
                       preferred_element_type=jnp.bfloat16)
    valid = (piece_target < N).astype(jnp.bfloat16)[:, None, None]
    return (patch * valid).reshape(n_cells, M, BH * TW)


def _split3(v):
    """Exact 3-term bfloat16 split of an f32 tensor: hi + mid + lo == v.

    f32's 24-bit mantissa decomposes into 3 bf16 8-bit chunks; each residual
    is exactly representable, so the split is lossless (bf16 shares f32's
    exponent range — no overflow).  A bf16 x bf16 MXU product of exact terms
    is computed exactly and accumulated in f32, so contracting a patch that
    is itself bf16-exact against the 3 terms reproduces a
    ``Precision.HIGHEST`` f32 matmul at half the passes (3 vs 6).
    """
    hi = v.astype(jnp.bfloat16)
    r1 = v - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _band_kernel(img_ref, err_ref, bkg_ref, flg_ref, p_ref, out_ref):
    """One (cell, time-block) instance: NQ masked reductions on the MXU.

    Cube refs are (t_block, BH, TW) cell blocks DMA'd straight from the
    (T, H, W) layout; flattening the (BH, TW) cell to one K=8192 axis is a
    cheap in-VMEM relayout.

    MXU pass budget: the kernel is MXU-bound, not bandwidth-bound, so every
    reduction is scheduled at the minimum number of bf16 passes that keeps
    f32-exact results:

    - count reductions (finite / zero / background-n / shenanigans) contract
      exactly-bf16 0/1 operands against the exactly-bf16 0/1 patch: ONE pass,
      exact (integer counts up to 256 are bf16-exact; K-sums accumulate f32);
    - value reductions use :func:`_split3` on the operand (3 passes, exact);
    - centroid moments fold the lane/row index into the PATCH side
      (``pm * l`` <= 127 is bf16-exact) so they reuse the one split of ``rx``
      instead of building two extra (T_b, K) f32 temporaries.

    22 equivalent passes vs 60 for the original all-``Precision.HIGHEST``
    formulation (~2x kernel wall-clock on v5e); the passes are FUSED into 8
    dot_generals by concatenating related operands — the 3 moment patches
    (pm / pm*l / pm*r) stack on the M axis against the shared rx split, and
    the value / count operand groups stack on the T axis against the shared
    patch — bit-identical, ~6% fewer kernel cycles than 10 separate dots
    (fewer launches + fewer (T_b, K) temporaries).  The patch ref arrives
    bfloat16 ({0, 2, 3}: exact, half the DMA traffic of the f32 layout).
    """
    K = BH * TW
    Tb = img_ref.shape[0]
    x = img_ref[...].reshape(Tb, K).astype(jnp.float32)  # (T_b, K)
    fin = jnp.isfinite(x)
    x0 = jnp.where(fin, x, 0.0)
    rx = jnp.maximum(x0, 0.0)
    e = err_ref[...].reshape(x.shape).astype(jnp.float32)
    e0 = jnp.where(jnp.isfinite(e), e, 0.0)
    b = bkg_ref[...].reshape(x.shape).astype(jnp.float32)
    finb = jnp.isfinite(b)
    b0 = jnp.where(finb, b, 0.0)
    sh = (flg_ref[...].reshape(x.shape)
          & PixelQualityFlags.BackgroundShenanigans) != 0

    p2 = p_ref[0]                                    # (M, K) bf16 {0, 2, 3}
    M = p2.shape[0]
    pmb = jnp.maximum(p2 - 2, 0).astype(jnp.bfloat16)   # mask patch
    pwb = jnp.minimum(p2, 1).astype(jnp.bfloat16)       # window patch
    # lane/row index folded into the patch (values <= 127: bf16-exact);
    # Mosaic iota must be integer-typed:
    k_io = jax.lax.broadcasted_iota(jnp.int32, p2.shape, 1)
    pmf = pmb.astype(jnp.float32)
    pm_l = (pmf * (k_io % TW).astype(jnp.float32)).astype(jnp.bfloat16)
    pm_r = (pmf * (k_io // TW).astype(jnp.float32)).astype(jnp.bfloat16)

    def red1(patch_bf, op_bf):                     # one bf16 pass, f32 accum
        return jax.lax.dot_general(
            patch_bf, op_bf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    # moments: (3M, K) stacked patch x the shared split of rx -> (3M, T_b)
    L2 = jnp.concatenate([pmb, pm_l, pm_r], axis=0)
    rx3 = _split3(rx)
    G2 = red1(L2, rx3[0]) + red1(L2, rx3[1]) + red1(L2, rx3[2])
    # values: pm x (3T_b, K) stacked split terms of [x0 | e^2 | b0]
    xs = _split3(x0)
    es = _split3(e0 * e0)
    bs = _split3(b0)
    G1 = (red1(pmb, jnp.concatenate([xs[0], es[0], bs[0]], axis=0))
          + red1(pmb, jnp.concatenate([xs[1], es[1], bs[1]], axis=0))
          + red1(pmb, jnp.concatenate([xs[2], es[2], bs[2]], axis=0)))
    # counts: pm x (3T_b, K) stacked 0/1 operands [finite | zero | bkg-finite]
    G3 = red1(pmb, jnp.concatenate([fin.astype(jnp.bfloat16),
                                    (x == 0).astype(jnp.bfloat16),
                                    finb.astype(jnp.bfloat16)], axis=0))
    G4 = red1(pwb, sh.astype(jnp.bfloat16))

    # Piece-major output layout (1, M, NQ, T_b): each piece's NQ x T_b row
    # block is contiguous, which makes the combine step's target gather read
    # whole rows instead of scattered elements.
    out_ref[0, :, 0, :] = G1[:, :Tb]                # flux total
    out_ref[0, :, 1, :] = G3[:, :Tb]                # n finite
    out_ref[0, :, 2, :] = G3[:, Tb:2 * Tb]          # n zero
    out_ref[0, :, 3, :] = G2[:M]                    # wsum
    out_ref[0, :, 4, :] = G2[M:2 * M]               # col moment
    out_ref[0, :, 5, :] = G2[2 * M:]                # row moment
    out_ref[0, :, 6, :] = G1[:, Tb:2 * Tb]          # err^2
    out_ref[0, :, 7, :] = G1[:, 2 * Tb:]            # bkg sum
    out_ref[0, :, 8, :] = G3[:, 2 * Tb:]            # bkg n
    out_ref[0, :, 9, :] = G4                        # shenanigans


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
        out_specs=pl.BlockSpec((1, M, NQ, t_block), lambda c, t: (c, 0, 0, t)),
        out_shape=jax.ShapeDtypeStruct((n_cells, M, NQ, T), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(images, images_err, backgrounds, pixelflags, patches)


@jax.jit
def _combine(Q, tp_idx, tp_valid, cell_row0, cell_col0, mask_size):
    """Piece quantities -> per-target outputs with extract_flux_core semantics.

    ``Q`` is piece-major (n_cells, M, NQ, T): each target's pieces are pulled
    out with one static row-gather of contiguous (NQ, T) rows (tp_idx, padded
    rows zero-weighted by tp_valid) and summed densely over the P_max piece
    axis — measured ~10x faster on TPU than a segment-sum scatter over the
    flat piece axis.
    """
    n_cells, M, NQ_, T = Q.shape
    N, P_max = tp_idx.shape
    Qp = Q.reshape(n_cells * M, NQ_, T)
    Qg = jnp.take(Qp, tp_idx.reshape(-1), axis=0)
    Qg = (Qg * tp_valid.reshape(-1)[:, None, None]).reshape(N, P_max, NQ_, T)
    # centroid moments need the cell origin applied per piece (1-based);
    # padded rows are already zeroed, so unmasked origins cannot leak:
    col0 = jnp.take(cell_col0, tp_idx.reshape(-1)).reshape(N, P_max)
    row0 = jnp.take(cell_row0, tp_idx.reshape(-1)).reshape(N, P_max)
    seg = jnp.sum(Qg, axis=1)                            # (N, NQ, T)
    cx = jnp.sum(Qg[:, :, 4] + (col0 + 1.0)[:, :, None] * Qg[:, :, 3], axis=1)
    cy = jnp.sum(Qg[:, :, 5] + (row0 + 1.0)[:, :, None] * Qg[:, :, 3], axis=1)
    total = seg[:, 0]
    n_fin = seg[:, 1]
    n_zero = seg[:, 2]
    wsum = seg[:, 3]
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
                            pieces: dict = None, windows=None):
    """Full-pass banded extraction; same outputs as extract_flux_core.

    ``pieces`` (from :func:`build_piece_patches`) may be precomputed and
    reused across streamed time blocks.  ``windows`` (N, h, w) bool limits
    the shenanigans reduction to each target's logical stamp.
    """
    T, H, W = images.shape
    if not bands_supported((H, W)):
        raise ValueError(f"banded extraction needs H%{BH}==0, W%{TW}==0; "
                         f"got {(T, H, W)}")
    if tuple(masks.shape[1:]) != (h, w):
        raise ValueError(f"masks shape {masks.shape[1:]} != stamp ({h}, {w})")
    t_block = min(t_block, T)
    if pieces is None:
        pieces = build_piece_patches(masks, r0s, c0s, (H, W), windows=windows)
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
    return _combine(Q, pieces["tp_idx_dev"], pieces["tp_valid_dev"],
                    pieces["cell_row0_dev"], pieces["cell_col0_dev"],
                    pieces["mask_size_dev"])
