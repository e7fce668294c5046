#!/usr/bin/env python3
"""
Benchmark: batched aperture light-curve extraction throughput.

Measures the primary BASELINE.json metric — targets/sec/chip for aperture
extraction (K2P2 mask building + masked flux/err/bkg/centroid sums) at the
north-star configuration: a full sector-CCD time axis (T=1312 ~ one 1800s
sector) and >10k targets on a 2048x2048 CCD — on whatever device JAX
provides (the real TPU under the driver).

The full three-cube sector stack (~65 GB f32) exceeds both HBM and this
host's RAM, so the time axis is processed in 128-frame blocks like the
production streamed path (core.engine._extract_flux_streamed).  The blocks
are device-resident and reused: per-block device work (bytes read, flops)
is identical to a real streamed sector, while host->device streaming —
which production overlaps with compute and which here would only measure
the axon tunnel — is excluded.

``vs_baseline`` is the speedup over a faithful single-target-at-a-time
NumPy implementation of the same extraction (KDE-mode threshold, connected
components via scipy.ndimage, per-frame masked sums over the same T) on
this host.  This comparator is *kind* to the reference: its real pipeline
re-reads every stamp from HDF5 per frame (BasePhotometry.py:720-751)
while the proxy gets in-RAM numpy arrays.

Also measures the secondary BASELINE.json metric: FFI backgrounds/sec per
CCD stack (radial KDE-mode + tiled SExtractor mode, ops.background).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import sys
import time

import numpy as np

T_SECTOR = 1312          #: full-sector cadences (1800 s cadence, ~27 d)
T_BLOCK = 128            #: streamed block length
N_TARGETS = 10240        #: north-star ">10k targets per CCD"
H = W = 2048
STAMP = 17


def make_field(n_stars=12000, seed=7):
    """Synthetic sum-image star field (host) + star table."""
    rng = np.random.default_rng(seed)
    rows = rng.uniform(10, H - 10, n_stars)
    cols = rng.uniform(10, W - 10, n_stars)
    tmag = np.sort(rng.uniform(7.5, 13.0, n_stars))
    flux = np.clip(10 ** (-0.4 * (tmag - 20.451)), 0, None)
    img0 = rng.normal(0.0, 1.5, (H, W)).astype(np.float32)
    win = 7
    yy, xx = np.mgrid[-win:win + 1, -win:win + 1]
    for r, c, f in zip(rows, cols, flux):
        ri, ci = int(r), int(c)
        g = f * np.exp(-0.5 * ((yy + ri - r) ** 2 + (xx + ci - c) ** 2) / 1.2 ** 2)
        g *= 1.0 / (2 * np.pi * 1.2 ** 2)
        r0, r1 = max(ri - win, 0), min(ri + win + 1, H)
        c0, c1 = max(ci - win, 0), min(ci + win + 1, W)
        img0[r0:r1, c0:c1] += g[(r0 - ri + win):(r1 - ri + win),
                                (c0 - ci + win):(c1 - ci + win)]
    return img0, rows, cols, tmag


def _enable_compile_cache():
    import os
    import jax
    cache = os.path.join(os.path.expanduser("~"), ".photometry_tpu", "jax_cache")
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def bench_tpu(sumimage, rows, cols, tmag, n_targets=N_TARGETS, h=STAMP,
              w=STAMP, mask_chunk=2048):
    import jax
    import jax.numpy as jnp
    _enable_compile_cache()
    sys.path.insert(0, ".")
    from photometry_tpu.models.k2p2 import build_masks_batch, K2P2Params
    from photometry_tpu.ops.bandext import (band_extract_flux_batch,
                                            build_piece_patches)

    N = min(n_targets, len(rows))
    r0s = np.clip(np.round(rows[:N]).astype(np.int32) - h // 2, 0, H - h)
    c0s = np.clip(np.round(cols[:N]).astype(np.int32) - w // 2, 0, W - w)
    K = 8
    cat_col = np.full((N, K), 1e9, np.float32)
    cat_row = np.full((N, K), 1e9, np.float32)
    cat_tmag = np.full((N, K), 30.0, np.float32)
    cat_valid = np.zeros((N, K), bool)
    cat_sid = np.zeros((N, K), np.int64)
    cat_col[:, 0] = cols[:N] - c0s
    cat_row[:, 0] = rows[:N] - r0s
    cat_tmag[:, 0] = tmag[:N]
    cat_valid[:, 0] = True
    cat_sid[:, 0] = np.arange(N) + 1

    sums = jnp.asarray(sumimage)

    def gather(img, r0, c0):
        return jax.lax.dynamic_slice(img, (r0, c0), (h, w))

    @jax.jit
    def masks_fn(sums, r0s_, c0s_, cc, cr, ct, cs, cv, tr, tc, tt):
        stamps = jax.vmap(lambda r0, c0: gather(sums, r0, c0))(r0s_, c0s_)
        out = build_masks_batch(stamps, cc, cr, ct, cs, cv, tr, tc, tt,
                                params=K2P2Params())
        return out["mask"]

    # Device-resident per-chunk inputs, built once: production keeps the
    # catalog tables on device across batches (core.cache.ContextCache), and
    # per-call jnp.asarray uploads through the ~30 ms-RTT tunnel would
    # otherwise dominate the mask phase (CLAUDE.md).
    chunks = []
    for i0 in range(0, N, mask_chunk):
        i1 = min(i0 + mask_chunk, N)
        chunks.append(tuple(jnp.asarray(a) for a in (
            r0s[i0:i1], c0s[i0:i1], cat_col[i0:i1], cat_row[i0:i1],
            cat_tmag[i0:i1], cat_sid[i0:i1], cat_valid[i0:i1],
            cat_row[i0:i1, 0], cat_col[i0:i1, 0], cat_tmag[i0:i1, 0])))

    def all_masks():
        return jnp.concatenate([masks_fn(sums, *ch) for ch in chunks])

    # One streamed block of the sector cube, synthesized on device
    # (host->device transfers through the TPU tunnel must stay out):
    key = jax.random.PRNGKey(0)
    imgs = (sums[None] + 0.5 * jax.random.normal(key, (T_BLOCK, H, W), jnp.float32))
    imgs = imgs.block_until_ready()
    errs = jnp.sqrt(jnp.abs(imgs)) + 1.0
    bkgs = jnp.zeros_like(imgs)
    pflags = jnp.zeros((T_BLOCK, H, W), jnp.uint8)
    n_blocks = (T_SECTOR + T_BLOCK - 1) // T_BLOCK

    def full_sector(masks):
        # Piece decomposition is rebuilt per batch (masks change); the mask
        # stack stays ON DEVICE (build_piece_patches only needs host
        # r0s/c0s for the piece table), and the per-block loop involves no
        # host<->device traffic:
        pieces = build_piece_patches(masks, r0s, c0s, (H, W))
        outs = None
        for _ in range(n_blocks):
            outs = band_extract_flux_batch(imgs, errs, bkgs, pflags,
                                           masks, r0s, c0s, h, w,
                                           pieces=pieces)
        return outs

    # warmup/compile (np.asarray forces completion — through the TPU tunnel,
    # block_until_ready alone does not reliably synchronise):
    masks = all_masks()
    np.asarray(masks[0])
    _ = np.asarray(full_sector(masks)[0])

    # timed: masks + piece decomposition + full-sector extraction.  The
    # completion-forcing fetch reads ONE target's row: pulling the full
    # (N, T_block) flux matrix through the ~12 MB/s axon tunnel would add
    # ~0.45 s of pure development-tunnel transfer that a production host
    # (local PCIe) does not pay.  Repeated until the relative spread of the
    # last 3 passes is <10% (max 6) so one tunnel hiccup or compile-cache
    # miss cannot distort the recorded headline (VERDICT r2 weak #1: the
    # round-2 driver number landed 1.7x below the builder's).
    times = []
    flux = None
    for _ in range(6):
        tic = time.perf_counter()
        masks = all_masks()
        out = full_sector(masks)
        flux = np.asarray(out[0][:1])
        times.append(time.perf_counter() - tic)
        if len(times) >= 3:
            last = sorted(times[-3:])
            if (last[-1] - last[0]) / last[0] < 0.10:
                break
    dt = float(np.median(times[-3:] if len(times) >= 3 else times))
    stamp_bytes = N * T_SECTOR * h * w * (3 * 4 + 1)
    return {
        "rate": N / dt,
        "seconds": dt,
        # Spread of the window the median is taken from (the convergence
        # criterion) — the first pass routinely pays residual cache warmup
        # and would dominate an all-passes spread:
        "spread": round((max(times[-3:]) - min(times[-3:]))
                        / max(min(times[-3:]), 1e-9), 3),
        "effective_gbps": stamp_bytes / dt / 1e9,
        "flux": flux,
    }


def _table_prf():
    """Catmull-Rom table PRF (production path for real calibrated .mat
    files): a Gaussian-sampled table WITHOUT the analytic-sigma shortcut,
    so evaluation/gradients go through the SVD-separable table kernels."""
    from photometry_tpu.models.prf import PRF
    g = PRF.gaussian(sigma=1.1)
    return PRF(g.iprf, g.oversample, g.center_x, g.center_y, info={})


def bench_psf(n_targets=1024, T=128, h=13, w=13, S=4, prf=None, reps=3):
    """PSF-extraction throughput (BASELINE.json primary metric includes
    PSF): batched warm-started LM fits at a representative crowded
    configuration, data synthesized on device."""
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, ".")
    from photometry_tpu.models.prf import PRF
    from photometry_tpu.models.psf_fit import fit_psf_timeseries_batch

    if prf is None:
        prf = PRF.gaussian(sigma=1.1)
    key = jax.random.PRNGKey(2)
    rows = 6.0 + jax.random.uniform(key, (n_targets, S), minval=-2, maxval=2)
    cols = 6.0 + jax.random.uniform(jax.random.fold_in(key, 1), (n_targets, S),
                                    minval=-2, maxval=2)
    fluxes = 1000.0 + 4000.0 * jax.random.uniform(jax.random.fold_in(key, 2),
                                                  (n_targets, S))
    p0 = jnp.concatenate([rows, cols, fluxes], axis=1)
    valid = jnp.ones((n_targets, S), bool)
    base = prf.integrate_to_image(jnp.stack([rows[0], cols[0], fluxes[0]], 1),
                                  (h, w), 5.0)
    imgs = jnp.broadcast_to(base, (n_targets, T, h, w)) + 1.0
    imgs = (imgs + 0.5 * jax.random.normal(jax.random.fold_in(key, 3),
                                           (n_targets, T, h, w)))
    imgs = imgs.block_until_ready()
    bkgs = jnp.zeros((n_targets, T, h, w))
    mini = jnp.ones((n_targets, h, w), bool)
    tidx = jnp.zeros((n_targets,), jnp.int32)

    def run():
        out = fit_psf_timeseries_batch(imgs, bkgs, 1.0, p0, valid, mini,
                                       tidx, prf, (h, w), S)
        return np.asarray(out["flux"][:1, 0])

    run()                                # warmup/compile + completion fetch
    rates = []
    for _ in range(reps):                # median-of-N: tunnel RTT noise ~±25%
        tic = time.perf_counter()
        run()
        rates.append(n_targets / (time.perf_counter() - tic))
    return float(np.median(rates))


def bench_psf_production(n_targets=4096, T=T_SECTOR, h=13, w=13, S=4,
                         chunk=96):
    """Table-PRF PSF fits at the production sector configuration
    (BASELINE.md config 4): full sector time axis, >=4k targets, the
    Catmull-Rom table-PRF path real calibrated .mat files use, chunked to
    the production per-group device budget (psf_fit._group_chunks).  One
    chunk's stamp cube is synthesized on device and reused across chunks —
    per-chunk device work is identical to a fresh chunk, while the
    host->device streaming the production loader overlaps stays out
    (matching the aperture bench methodology)."""
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, ".")
    from photometry_tpu.models.psf_fit import fit_psf_timeseries_batch

    prf = _table_prf()
    key = jax.random.PRNGKey(5)
    rows = 6.0 + jax.random.uniform(key, (chunk, S), minval=-2, maxval=2)
    cols = 6.0 + jax.random.uniform(jax.random.fold_in(key, 1), (chunk, S),
                                    minval=-2, maxval=2)
    fluxes = 1000.0 + 4000.0 * jax.random.uniform(jax.random.fold_in(key, 2),
                                                  (chunk, S))
    p0 = jnp.concatenate([rows, cols, fluxes], axis=1)
    valid = jnp.ones((chunk, S), bool)
    base = prf.integrate_to_image(jnp.stack([rows[0], cols[0], fluxes[0]], 1),
                                  (h, w), 5.0)
    imgs = jnp.broadcast_to(base, (chunk, T, h, w)) + 1.0
    imgs = (imgs + 0.5 * jax.random.normal(jax.random.fold_in(key, 3),
                                           (chunk, T, h, w))).block_until_ready()
    bkgs = jnp.zeros((chunk, T, h, w))
    mini = jnp.ones((chunk, h, w), bool)
    tidx = jnp.zeros((chunk,), jnp.int32)

    def run_chunk():
        out = fit_psf_timeseries_batch(imgs, bkgs, 1.0, p0, valid, mini,
                                       tidx, prf, (h, w), S)
        return out["flux"]

    np.asarray(run_chunk()[:1, 0])       # warmup/compile
    n_chunks = (n_targets + chunk - 1) // chunk
    tic = time.perf_counter()
    out = None
    for _ in range(n_chunks):
        out = run_chunk()
    np.asarray(out[:1, 0])               # force completion through the tunnel
    dt = time.perf_counter() - tic
    return n_chunks * chunk / dt


def bench_linpsf_production(n_targets=4096, T=T_SECTOR, h=13, w=13, S=4,
                            chunk=256):
    """Linear-PSF photometry at the production sector configuration
    (BASELINE.md config 3): per-frame design-matrix solves, table PRF,
    full sector time axis.  Same reuse methodology as bench_psf_production."""
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, ".")
    from photometry_tpu.models.linpsf import linpsf_timeseries_batch

    prf = _table_prf()
    key = jax.random.PRNGKey(7)
    rows = 6.0 + jax.random.uniform(key, (chunk, T, S), minval=-0.3, maxval=0.3)
    cols = 6.0 + jax.random.uniform(jax.random.fold_in(key, 1),
                                    (chunk, T, S), minval=-0.3, maxval=0.3)
    valid = jnp.ones((chunk, S), bool)
    star = prf.integrate_to_image(
        jnp.asarray([[6.0, 6.0, 3000.0]], jnp.float32), (h, w), 5.0)
    imgs = jnp.broadcast_to(star + 10.0, (chunk, T, h, w))
    imgs = (imgs + 0.5 * jax.random.normal(jax.random.fold_in(key, 2),
                                           (chunk, T, h, w))).block_until_ready()

    def run_chunk():
        out = linpsf_timeseries_batch(imgs, rows, cols, valid, prf, (h, w), S)
        return out["fluxes"]

    np.asarray(run_chunk()[:1, 0])
    n_chunks = (n_targets + chunk - 1) // chunk
    tic = time.perf_counter()
    out = None
    for _ in range(n_chunks):
        out = run_chunk()
    np.asarray(out[:1, 0])
    dt = time.perf_counter() - tic
    return n_chunks * chunk / dt


def bench_halo(n_targets=8, T=T_SECTOR, side=22):
    """Halo photometry on saturated-star stamps (BASELINE.md config 5 /
    VERDICT r2: 22x22 saturated target, full sector): the production
    batched TV-min program (models/halo.tvmin_weights_batch — the exact
    function extract_halo_batch dispatches per time segment), normalised
    pixel flux synthesized on device."""
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, ".")
    from photometry_tpu.models.halo import tvmin_weights_batch

    P = side * side
    key = jax.random.PRNGKey(9)
    # median-normalised flux: ~1 + smooth systematics + noise
    t = jnp.linspace(0.0, 6.28, T)[None, :, None]
    sens = 1.0 + 0.01 * jnp.sin(t + jnp.linspace(0, 3, P)[None, None, :])
    flux_norm = (sens + 0.002 * jax.random.normal(key, (n_targets, T, P))
                 ).astype(jnp.float32).block_until_ready()
    good = jnp.ones((n_targets, T), bool)
    pix_ok = jnp.ones((n_targets, P), bool)

    w, tv = tvmin_weights_batch(flux_norm, good, pix_ok)
    np.asarray(w[0, 0])                  # warmup/compile
    tic = time.perf_counter()
    w, tv = tvmin_weights_batch(flux_norm, good, pix_ok)
    np.asarray(w[0, 0])
    dt = time.perf_counter() - tic
    return n_targets / dt


def bench_tpf(n_targets=1024, T=13056, h=11, w=11, grid=32, t_block=816):
    """TPF/short-cadence aperture extraction (VERDICT r3 #7): the 13k-
    cadence long time axis (120 s TPF cadence over ~27 d; BASELINE.md
    config 1, SURVEY long-context case) measured on the production
    extraction program.

    The kernel timed IS the production one — core.engine.extract_flux_core,
    which every TPF context dispatches (N=1 per postage file; N>1 for
    tpf:NNN secondary groups, taskmanager.get_task_batch) — fed N
    independent 11x11 TPF stamp cubes laid out as a grid x grid mosaic:
    per target the bytes read and FLOPs are identical to N separate TPF
    extractions, while one program serves the whole batch the way a TPU
    wants.  The time axis streams through device-resident t_block-frame
    blocks exactly like the production long-axis tier
    (core.engine._extract_flux_streamed); blocks are reused so the dev
    tunnel stays out of the measurement (same methodology as bench_tpu).
    Each pass includes the per-target K2P2 mask build on the sum-image
    stamps.
    """
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, ".")
    from photometry_tpu.core.engine import _extract_flux_batch
    from photometry_tpu.models.k2p2 import build_masks_batch, K2P2Params

    assert n_targets == grid * grid and T % t_block == 0
    Hm, Wm = grid * h, grid * w
    key = jax.random.PRNGKey(11)

    # Mosaic sum-image: one star per 11x11 cell, synthesized on device.
    yy, xx = jnp.mgrid[0:h, 0:w]
    star = jnp.exp(-0.5 * ((yy - h // 2) ** 2 + (xx - w // 2) ** 2) / 1.2 ** 2)
    star = star / (2 * jnp.pi * 1.2 ** 2)
    tmag = 9.0 + 2.0 * jax.random.uniform(key, (grid, grid))
    amp = 10 ** (-0.4 * (tmag - 20.451))
    sumimage = (jnp.kron(amp, star)
                + 1.5 * jax.random.normal(jax.random.fold_in(key, 1),
                                          (Hm, Wm))).astype(jnp.float32)
    sumimage = sumimage.block_until_ready()

    N = n_targets
    r0s = (np.arange(N, dtype=np.int32) // grid) * h
    c0s = (np.arange(N, dtype=np.int32) % grid) * w
    r0s_d, c0s_d = jnp.asarray(r0s), jnp.asarray(c0s)
    K = 8
    cat_col = np.full((N, K), 1e9, np.float32)
    cat_row = np.full((N, K), 1e9, np.float32)
    cat_tmag = np.full((N, K), 30.0, np.float32)
    cat_valid = np.zeros((N, K), bool)
    cat_sid = np.zeros((N, K), np.int64)
    cat_row[:, 0], cat_col[:, 0] = h // 2, w // 2
    cat_tmag[:, 0] = np.asarray(tmag).ravel()
    cat_valid[:, 0] = True
    cat_sid[:, 0] = np.arange(N) + 1
    cat_dev = tuple(jnp.asarray(a) for a in (
        cat_col, cat_row, cat_tmag, cat_sid, cat_valid,
        cat_row[:, 0], cat_col[:, 0], cat_tmag[:, 0]))

    @jax.jit
    def masks_fn(sums, r0s_, c0s_, cc, cr, ct, cs, cv, tr, tc, tt):
        def one(r0, c0):
            return jax.lax.dynamic_slice(sums, (r0, c0), (h, w))
        stamps = jax.vmap(one)(r0s_, c0s_)
        out = build_masks_batch(stamps, cc, cr, ct, cs, cv, tr, tc, tt,
                                params=K2P2Params())
        return out["mask"]

    # One device-resident time block of the N stamp cubes:
    imgs = (sumimage[None]
            + 0.5 * jax.random.normal(jax.random.fold_in(key, 2),
                                      (t_block, Hm, Wm), jnp.float32))
    imgs = imgs.block_until_ready()
    errs = jnp.sqrt(jnp.abs(imgs)) + 1.0
    bkgs = jnp.zeros_like(imgs)
    pflags = jnp.zeros((t_block, Hm, Wm), jnp.uint8)
    windows = jnp.ones((N, h, w), bool)
    n_blocks = T // t_block

    def one_pass():
        masks = masks_fn(sumimage, r0s_d, c0s_d, *cat_dev)
        out = None
        for _ in range(n_blocks):
            out = _extract_flux_batch(imgs, errs, bkgs, pflags, masks,
                                      r0s_d, c0s_d, h, w, windows)
        return np.asarray(out[0][:1, :1])

    one_pass()                           # warmup/compile
    times = []
    for _ in range(6):
        tic = time.perf_counter()
        one_pass()
        times.append(time.perf_counter() - tic)
        if len(times) >= 3:
            last = sorted(times[-3:])
            if (last[-1] - last[0]) / last[0] < 0.10:
                break
    dt = float(np.median(times[-3:]))
    return N / dt


def bench_prepare(chunk=16, T=T_SECTOR):
    """Device wall of the whole prepare stage per sector-CCD (VERDICT r4 #2):
    backgrounds (radial KDE + tiled SExtractor mode), background time
    smoothing, the Background-Shenanigans 15x15 median-filter residual, and
    sumimage accumulation, at production scale (2048^2, T=1312 in
    ``chunk``-frame streamed blocks, reference prepare.py:202-701).

    One chunk of frames is synthesized on device and reused: per-chunk
    device work equals a real chunk's while the host FITS ingestion —
    which production overlaps via the loader thread pool and which here
    would measure the dev tunnel — stays out.  The stage-3 robust-mean
    block medians and per-frame HDF5 writes are host work on the real
    pipeline (native moving medians / h5py) and are reported separately by
    the e2e drain build, not here.  WCS round-trip checks are microseconds
    of host trig per frame and are ignored.
    """
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, ".")
    from photometry_tpu.ops.background import estimate_background, radial_coordinates
    from photometry_tpu.ops.filters import time_moving_nanmean
    from photometry_tpu.core.pixelflags import shenanigans_residual
    _enable_compile_cache()

    key = jax.random.PRNGKey(3)
    imgs = 100.0 + 10.0 * jax.random.normal(key, (chunk, H, W), jnp.float32)
    imgs = imgs.block_until_ready()
    radius = radial_coordinates((H, W), camera=1, ccd=1)
    n_chunks = -(-T // chunk)

    stages = {}

    def timed(name, fn, reps=2):
        fn()                              # warmup/compile
        walls = []
        for _ in range(reps):
            tic = time.perf_counter()
            fn()
            walls.append(time.perf_counter() - tic)
        stages[name] = min(walls)

    def run_bkg():
        bkg, _ = estimate_background(imgs, radius_image=radius, tile=64)
        np.asarray(bkg[0, 0, 0])

    def run_smooth():
        np.asarray(time_moving_nanmean(imgs, 3)[0, 0, 0])

    @jax.jit
    def _sum_update(s, n, blk):
        fin = jnp.isfinite(blk)
        return s + jnp.sum(jnp.where(fin, blk, 0.0), 0), n + jnp.sum(fin, 0)

    def run_sumimage():
        s = jnp.zeros((H, W), jnp.float32)
        n = jnp.zeros((H, W), jnp.int32)
        s, n = _sum_update(s, n, imgs)
        np.asarray(s[0, 0])

    timed("backgrounds", run_bkg)
    timed("smoothing", run_smooth)
    timed("sumimage", run_sumimage)
    # shenanigans_residual is host-orchestrated (median_filter2d_chunked);
    # on the dev tunnel the per-block input transfers would swamp the
    # kernel, so time ONE FRAME's worth of device programs (all row
    # blocks, dispatched async, one completion fetch — exactly the
    # production fetch pattern) on a device-resident padded frame:
    from photometry_tpu.ops.filters import _median_block
    half = 7
    rows = max(8, int(3e8 / (15 * 15 * 4 * (W + 2 * half))))
    padded = jnp.pad(imgs[0], half, mode="symmetric").block_until_ready()
    starts = list(range(0, H, rows))

    def run_median_frame():
        devs = [_median_block(
            jax.lax.dynamic_slice_in_dim(padded, r0,
                                         min(rows, H - r0) + 2 * half, 0),
            15, min(rows, H - r0), W) for r0 in starts]
        for d in devs:
            d.copy_to_host_async()
        for d in devs:
            np.asarray(d)

    timed("shenanigans_median_frame", run_median_frame)
    per_chunk = (stages["backgrounds"] + stages["smoothing"]
                 + stages["sumimage"])
    per_frame_median = stages["shenanigans_median_frame"]
    total = per_chunk * n_chunks + per_frame_median * T
    return {
        "sec_per_sector_ccd": total,
        "stage_sec_per_frame": {
            "backgrounds": stages["backgrounds"] / chunk,
            "smoothing": stages["smoothing"] / chunk,
            "sumimage": stages["sumimage"] / chunk,
            "shenanigans_median": per_frame_median,
        },
    }


def bench_backgrounds(n_frames=64, tile=64):
    """Secondary metric: FFI backgrounds/sec per CCD stack (prepare stage).

    ``n_frames=64`` is the production prepare chunk (prepare_one default):
    most of the stage's cost is per-op overhead amortised by batching
    frames into one program (16-frame chunks measured ~18 frames/s vs
    ~28 at 64 on the same kernels)."""
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, ".")
    from photometry_tpu.ops.background import estimate_background, radial_coordinates

    key = jax.random.PRNGKey(1)
    imgs = 100.0 + 10.0 * jax.random.normal(key, (n_frames, H, W), jnp.float32)
    imgs = imgs.block_until_ready()
    radius = radial_coordinates((H, W), camera=1, ccd=1)
    # warmup/compile:
    bkg, _ = estimate_background(imgs, radius_image=radius, tile=tile)
    np.asarray(bkg[0, 0, 0])
    rates = []
    for _ in range(3):                   # median-of-3: tunnel RTT noise ~±25%
        tic = time.perf_counter()
        bkg, _ = estimate_background(imgs, radius_image=radius, tile=tile)
        np.asarray(bkg[0, 0, 0])
        rates.append(n_frames / (time.perf_counter() - tic))
    return float(np.median(rates))


DRAIN_CACHE_VERSION = "v1"
DRAIN_SHAPE = (256, 256)     #: largest CCD the ~12 MB/s dev tunnel tolerates
DRAIN_T = T_SECTOR           #: full-sector cadence count (product length)
DRAIN_STARS = 600


def _drain_input_folder():
    """Build (once, cached on disk) a synthetic prepared sector for the
    end-to-end drain bench: sim FFIs -> prepare -> todo, the exact
    production ingestion pathway.

    The CCD is 256x256 rather than 2048x2048 ONLY because the dev-tunnel
    upload of a full sector cube (~66 GB) is impossible here; the
    per-target host product work (T=1312-row FITS + gzip + sqlite row) is
    identical to production, and the 600 stars sit at ~4x the real
    per-pixel target density (10k per 2048^2), which biases the mask/blend
    work *against* us.
    """
    import shutil
    root = os.path.join(os.path.expanduser("~"), ".photometry_tpu",
                        f"bench_drain_{DRAIN_CACHE_VERSION}")
    marker = os.path.join(root, "BUILD_DONE")
    ffi_marker = os.path.join(root, "FFIS_DONE")
    pristine = os.path.join(root, "todo.sqlite.pristine")
    if not os.path.isfile(marker):
        # Step-resumable: the sim/FFI step has its own marker and prepare is
        # stage-resumable via cube markers, so an interrupted build resumes
        # where it stopped instead of regenerating ~2 GB of sector.
        os.makedirs(root, exist_ok=True)
        sys.path.insert(0, ".")
        from photometry_tpu.sim.simulator import SimConfig, simulate_sector
        from photometry_tpu.cli import prepare_cmd, todo_cmd
        if not os.path.isfile(ffi_marker):
            for name in os.listdir(root):   # clear any partial FFI step
                os.unlink(os.path.join(root, name))
            sim = simulate_sector(SimConfig(
                shape=DRAIN_SHAPE, n_times=DRAIN_T, n_stars=DRAIN_STARS,
                seed=17, tmag_range=(5.5, 13.5)))
            sim.write_ffis(root, gzip=False)
            sim.write_catalog(root)
            del sim
            with open(ffi_marker, "w") as fh:
                fh.write("ok\n")
        # The CLIs print their output paths on stdout; bench.py's contract
        # is ONE JSON line there, so route the build chatter to stderr:
        import contextlib
        with contextlib.redirect_stdout(sys.stderr):
            if prepare_cmd.main(["-q", root]) != 0:
                raise RuntimeError("drain-bench prepare failed")
            if todo_cmd.main(["-q", root]) != 0:
                raise RuntimeError("drain-bench todo failed")
        # FFI FITS files are only needed by prepare; drop them so the cache
        # holds just the cube + catalog + todo (~1.5 GB):
        for name in os.listdir(root):
            if name.endswith("_ffic.fits"):
                os.unlink(os.path.join(root, name))
        shutil.copyfile(os.path.join(root, "todo.sqlite"), pristine)
        with open(marker, "w") as fh:
            fh.write("ok\n")
    return root, pristine


def bench_drain():
    """End-to-end production drain (BASELINE.md config 5): TaskManager
    lease batches -> batch dispatcher (masks + extraction + auto-switches
    on device) -> per-target gzipped FITS light curves -> sqlite
    diagnostics, through the same core.drain.run_drain loop the CLI and
    scheduler workers use (reference unit of work: run_tessphot.py:124-166,
    BasePhotometry.py:1417-1728, taskmanager.py:435-603).

    Returns the drain rate and its wall decomposition.  The headline rate
    excludes the one-time sector-cube device upload ("context"): through
    the dev tunnel it runs at ~12 MB/s vs a production host's local PCIe,
    and production amortises it over whole-CCD (>10k-target) drains.  A
    warmup drain absorbs jit compiles; the measured drain starts from a
    pristine TODO with warm programs, like every batch after the first in
    a production multi-CCD run.
    """
    import shutil
    _enable_compile_cache()
    root, pristine = _drain_input_folder()
    from photometry_tpu.core.drain import new_timers, run_drain

    def one_drain():
        shutil.copyfile(pristine, os.path.join(root, "todo.sqlite"))
        for sub in ("c1800",):
            shutil.rmtree(os.path.join(root, sub), ignore_errors=True)
        t = new_timers()
        n = run_drain(root, 99, timers=t,
                      summary=os.path.join(root, "summary.json"))
        return n, t

    one_drain()                          # warmup: jit compiles
    n, t = one_drain()
    host_wall = t["wall"] - t["context"]
    return {
        "rate": n / host_wall if host_wall > 0 else float("nan"),
        "rate_incl_context": n / t["wall"],
        "n_done": n,
        "decomposition_s": {k: round(t[k], 3) for k in
                            ("lease", "context", "photometry", "save",
                             "sqlite", "wall")},
        "save_ms_per_product": round(1e3 * t["save"] / max(t.get("n_products", 1), 1), 3),
    }


def bench_reference_numpy(sumimage, rows, cols, n_targets=2, h=STAMP, w=STAMP):
    """Single-target-at-a-time NumPy extraction (the reference's design),
    at the SAME full-sector T as the TPU measurement."""
    from scipy import ndimage
    from scipy.stats import gaussian_kde
    images = np.broadcast_to(sumimage, (T_SECTOR, H, W))
    N = min(n_targets, len(rows))
    tic = time.perf_counter()
    for i in range(N):
        r0 = int(np.clip(round(rows[i]) - h // 2, 0, H - h))
        c0 = int(np.clip(round(cols[i]) - w // 2, 0, W - w))
        stamp_sum = sumimage[r0:r0 + h, c0:c0 + w]
        flx = stamp_sum[stamp_sum > 0].ravel()
        kde = gaussian_kde(flx[flx <= np.quantile(flx, 0.85)])
        grid = np.linspace(flx.min(), flx.max(), 100)
        mode = grid[np.argmax(kde(grid))]
        mad = 1.4826 * np.median(np.abs(flx[flx < mode] - mode))
        cut = mode + 0.8 * mad
        above = stamp_sum > cut
        lab, _ = ndimage.label(above, structure=np.ones((3, 3)))
        main = lab[h // 2, w // 2]
        mask = lab == main if main > 0 else np.zeros_like(above)
        # per-frame masked sums, one frame at a time (reference hot loop),
        # incl. the error/background sums the reference also computes:
        out = np.empty(T_SECTOR)
        for k in range(T_SECTOR):
            stamp = images[k, r0:r0 + h, c0:c0 + w]
            vals = stamp[mask]
            out[k] = np.nansum(vals)
            _err = np.sqrt(np.nansum(np.abs(vals)))
            _pos = vals[vals > 0]
    dt = time.perf_counter() - tic
    return N / dt


def _row_in_subprocess(fn_name: str, timeout_s: int):
    """Run one bench row in a killable subprocess, returning its dict.

    The prepare/drain rows are the long ones and touch the device for
    minutes; a mid-run tunnel stall inside them would otherwise hang the
    WHOLE bench past the driver's timeout and lose every row (the
    contract is one JSON line at the end).  A timed-out or crashed row
    returns None and the rest of the bench still reports.
    """
    import os
    import subprocess
    code = ("import sys, json; sys.path.insert(0, '.'); import bench; "
            f"print('ROW::' + json.dumps(bench.{fn_name}()))")
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True,
                              timeout=timeout_s, env=dict(os.environ),
                              cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        sys.stderr.write(f"bench row {fn_name} timed out after {timeout_s}s\n")
        return None
    sys.stderr.write(proc.stderr[-2000:] + "\n")
    for line in proc.stdout.splitlines():
        if line.startswith("ROW::"):
            return json.loads(line[5:])
    sys.stderr.write(f"bench row {fn_name} produced no result "
                     f"(exit {proc.returncode})\n")
    return None


def _wait_for_device(total_wait_s=1500, probe_timeout_s=120):
    """Block until ``jax.devices()`` responds; ride out transient tunnel
    outages instead of hanging the whole bench.

    On the axon backend the first ``jax.devices()`` call can sleep
    *indefinitely* while the TPU tunnel is down (observed: a bench run
    parked in a claim-retry loop for 25+ minutes with zero progress, which
    would eat the driver's entire timeout and record no result).  Probing
    in a subprocess keeps the hang killable; a successful probe exits
    immediately, releasing the single-tenant device before the real run.
    """
    import os
    import subprocess
    deadline = time.time() + total_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            proc = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout_s, capture_output=True,
                env=dict(os.environ))
            if proc.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            sys.stderr.write(
                "bench.py: device backend unreachable after %d probe(s) over "
                "%.0f s (TPU tunnel down?) — aborting instead of hanging.\n"
                % (attempt, total_wait_s))
            sys.exit(2)
        sys.stderr.write("bench.py: device probe %d failed; retrying "
                         "(tunnel outage?)\n" % attempt)
        time.sleep(30)


def main():
    import warnings
    _wait_for_device()
    # nanmean/nanmedian of all-NaN tiles is expected (excluded-tile
    # bridging); keep the driver log to the one JSON line:
    warnings.filterwarnings("ignore", message="Mean of empty slice")
    warnings.filterwarnings("ignore", message="All-NaN slice encountered")
    warnings.filterwarnings("ignore",
                            message="invalid value encountered in divide")

    sumimage, rows, cols, tmag = make_field()
    tpu = bench_tpu(sumimage, rows, cols, tmag)
    bkg_rate = bench_backgrounds()
    psf_rate = bench_psf()
    psf_prod_rate = bench_psf_production()
    linpsf_rate = bench_linpsf_production()
    halo_rate = bench_halo()
    halo_batch_rate = bench_halo(n_targets=32)
    tpf_rate = bench_tpf()
    # The two long rows run in killable subprocesses so a mid-row device
    # stall cannot take down the whole bench (see _row_in_subprocess):
    prepare = _row_in_subprocess("bench_prepare", timeout_s=900)
    drain = _row_in_subprocess("bench_drain", timeout_s=2100)
    ref_rate = bench_reference_numpy(sumimage, rows, cols)
    result = {
        "metric": "aperture_extraction_targets_per_sec_per_chip",
        "value": round(float(tpu["rate"]), 2),
        "unit": "targets/s",
        "vs_baseline": round(float(tpu["rate"] / ref_rate), 2),
        "config": f"T={T_SECTOR} full-sector, N={N_TARGETS}, {H}x{W} CCD, "
                  f"stamp {STAMP}px, f32 cubes, streamed {T_BLOCK}-frame "
                  f"blocks, banded MXU extraction kernel",
        "spread": tpu["spread"],
        "extraction_effective_gbps": round(float(tpu["effective_gbps"]), 2),
        "backgrounds_per_sec_per_ccd_stack": round(float(bkg_rate), 2),
        "psf_targets_per_sec_per_chip": round(float(psf_rate), 2),
        "psf_table_sector_targets_per_sec": round(float(psf_prod_rate), 2),
        "linpsf_table_sector_targets_per_sec": round(float(linpsf_rate), 2),
        "halo_sector_targets_per_sec": round(float(halo_rate), 2),
        "halo_sector_batch32_targets_per_sec": round(float(halo_batch_rate), 2),
        "tpf_short_cadence_targets_per_sec": round(float(tpf_rate), 2),
        "prepare_device_sec_per_sector_ccd": (
            round(float(prepare["sec_per_sector_ccd"]), 2) if prepare else None),
        "prepare_stage_sec_per_frame": (
            {k: round(float(v), 4) for k, v in
             prepare["stage_sec_per_frame"].items()} if prepare else None),
        "e2e_drain_targets_per_sec": (round(float(drain["rate"]), 2)
                                      if drain else None),
        "e2e_drain": ({k: drain[k] for k in
                       ("rate_incl_context", "n_done", "decomposition_s",
                        "save_ms_per_product")} if drain else None),
        "method_configs": {
            "psf_table_sector": f"T={T_SECTOR}, 4096 targets, 13px stamps, "
                                "S=4, Catmull-Rom table PRF, 96-target chunks",
            "linpsf_table_sector": f"T={T_SECTOR}, 4096 targets, 13px stamps, "
                                   "S=4, table PRF, per-frame linear solves",
            "halo_sector": f"T={T_SECTOR}, 22x22 saturated stamps, one "
                           "batched TV-min descent program (8 targets; "
                           "batch32 row = same program at 32 — the "
                           "descent is latency-bound below ~32 targets)",
            "tpf_short_cadence": "T=13056 (120 s cadence, ~27 d), 1024 "
                                 "independent 11px TPF stamp cubes, K2P2 "
                                 "masks + production extraction program, "
                                 "816-frame streamed blocks",
            "e2e_drain": f"TODO lease batches -> dispatcher -> gzipped "
                         f"FITS products -> sqlite diagnostics via "
                         f"core.drain.run_drain; {DRAIN_STARS}-star sim "
                         f"sector, {DRAIN_SHAPE[0]}^2 CCD (dev-tunnel "
                         f"bound; ~4x real target density), T={DRAIN_T}; "
                         "rate excludes the one-time cube upload "
                         "('context' in the decomposition)",
        },
        "cpu_baseline_targets_per_sec": round(float(ref_rate), 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
