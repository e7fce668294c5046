#!/usr/bin/env python3
"""
Benchmark: batched aperture light-curve extraction throughput.

Measures the primary BASELINE.json metric — targets/sec/chip for aperture
extraction (K2P2 mask building + masked flux sums over a sector-CCD cube) —
on whatever device JAX provides (the real TPU under the driver).

``vs_baseline`` is the speedup over a faithful single-target-at-a-time NumPy
implementation of the same extraction (KDE-mode threshold, connected
components via scipy.ndimage, per-frame masked sums) timed on this host —
the reference pipeline's design (one star at a time on CPU; its own code
cannot run here since astropy/photutils are not installed).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def make_data(T=128, H=2048, W=2048, n_stars=1200, seed=7):
    """Synthetic sector-CCD cube with injected stars.

    The sum-image with stars is rendered on the host (small); the full time
    cube is synthesised ON DEVICE — host->device transfers through the TPU
    tunnel are far slower than device HBM and must stay out of the setup.
    """
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
    return T, img0, rows, cols, tmag


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


def bench_tpu(T, sumimage, rows, cols, tmag, n_targets=1024, h=17, w=17):
    import jax
    import jax.numpy as jnp
    _enable_compile_cache()
    sys.path.insert(0, ".")
    from photometry_tpu.models.k2p2 import build_masks_batch, K2P2Params
    from photometry_tpu.core.engine import _extract_flux_batch

    H, W = sumimage.shape
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

    # Synthesize the time cube on device (sum-image + per-frame noise):
    sums = jnp.asarray(sumimage)
    key = jax.random.PRNGKey(0)
    imgs = (sums[None] + 0.5 * jax.random.normal(key, (T, H, W), jnp.float32))
    imgs = imgs.block_until_ready()
    errs = jnp.sqrt(jnp.abs(imgs)) + 1.0
    bkgs = jnp.zeros_like(imgs)
    pflags = jnp.zeros((T, H, W), jnp.uint8)

    def gather(img, r0, c0):
        return jax.lax.dynamic_slice(img, (r0, c0), (h, w))

    @jax.jit
    def masks_fn(sums, r0s_, c0s_, cc, cr, ct, cs, cv, tr, tc, tt):
        stamps = jax.vmap(lambda r0, c0: gather(sums, r0, c0))(r0s_, c0s_)
        out = build_masks_batch(stamps, cc, cr, ct, cs, cv, tr, tc, tt,
                                params=K2P2Params())
        return out["mask"]

    args = (sums, jnp.asarray(r0s), jnp.asarray(c0s),
            jnp.asarray(cat_col), jnp.asarray(cat_row), jnp.asarray(cat_tmag),
            jnp.asarray(cat_sid), jnp.asarray(cat_valid),
            jnp.asarray(cat_row[:, 0]), jnp.asarray(cat_col[:, 0]),
            jnp.asarray(cat_tmag[:, 0]))

    def full_extract():
        masks = masks_fn(*args)
        flux, ferr, fbkg, cent, shen = _extract_flux_batch(
            imgs, errs, bkgs, pflags, masks, jnp.asarray(r0s),
            jnp.asarray(c0s), h, w)
        return flux

    # warmup/compile (np.asarray forces completion — through the TPU tunnel,
    # block_until_ready alone does not reliably synchronise):
    flux = np.asarray(full_extract())
    # timed runs: reps stay queued on device (production is pipelined);
    # one final fetch forces completion of the whole chain:
    n_rep = 10
    tic = time.perf_counter()
    for _ in range(n_rep):
        out = full_extract()
    flux = np.asarray(out)
    dt = (time.perf_counter() - tic) / n_rep
    return N / dt, flux


def bench_reference_numpy(T, sumimage, rows, cols, n_targets=8, h=17, w=17):
    """Single-target-at-a-time NumPy extraction (the reference's design)."""
    from scipy import ndimage
    from scipy.stats import gaussian_kde
    H, W = sumimage.shape
    rng = np.random.default_rng(1)
    images = np.broadcast_to(sumimage, (T, H, W))
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
        # per-frame masked sums, one frame at a time (reference hot loop):
        out = np.empty(T)
        for k in range(T):
            stamp = images[k, r0:r0 + h, c0:c0 + w]
            out[k] = np.nansum(stamp[mask])
    dt = time.perf_counter() - tic
    return N / dt


def main():
    T, sumimage, rows, cols, tmag = make_data()
    tpu_rate, flux = bench_tpu(T, sumimage, rows, cols, tmag)
    ref_rate = bench_reference_numpy(T, sumimage, rows, cols)
    result = {
        "metric": "aperture_extraction_targets_per_sec_per_chip",
        "value": round(float(tpu_rate), 2),
        "unit": "targets/s",
        "vs_baseline": round(float(tpu_rate / ref_rate), 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
