#!/usr/bin/env python3
"""Break down the sector-scale PSF fit cost on the current device.

bench.py's ``psf_table_sector_targets_per_sec`` (BASELINE.md config 4:
T=1312, table PRF, 13 px, S=4, 96-target chunks) is the slowest row of the
method matrix relative to its FLOP count.  This tool times the pieces so
kernel work targets the real bottleneck instead of a guess:

  full        fit_psf_timeseries_batch, one chunk (phase 1 + phase 2)
  phase2      the vmapped warm-start LM over all cadences only
  render      S-star table-PRF render (model_and_jac), same batch extent
  lm_algebra  J build + JtJ/Jtr + unrolled-Cholesky solve on fixed inputs

Each timing pipelines ``reps`` calls and forces completion with a host
fetch (CLAUDE.md: block_until_ready does not synchronise through the axon
tunnel).  Prints one JSON line.

Usage: python tools/profile_psf.py [--chunk 96] [--T 1312] [--reps 3]
       [--jax-platform cpu]   # CPU smoke run
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=96)
    ap.add_argument("--T", type=int, default=1312)
    ap.add_argument("--S", type=int, default=4)
    ap.add_argument("--side", type=int, default=13)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--jax-platform", default=None)
    args = ap.parse_args(argv)

    import jax
    if args.jax_platform:
        jax.config.update("jax_platforms", args.jax_platform)
    import jax.numpy as jnp
    import functools
    from photometry_tpu.models.prf import PRF
    from photometry_tpu.models.psf_fit import (fit_psf_timeseries_batch,
                                               make_psf_fitter, LM_ITERS_WARM)

    N, T, S, h = args.chunk, args.T, args.S, args.side
    w = h
    g = PRF.gaussian(sigma=1.1)
    prf = PRF(g.iprf, g.oversample, g.center_x, g.center_y, info={})

    key = jax.random.PRNGKey(5)
    rows = 6.0 + jax.random.uniform(key, (N, S), minval=-2, maxval=2)
    cols = 6.0 + jax.random.uniform(jax.random.fold_in(key, 1), (N, S),
                                    minval=-2, maxval=2)
    fluxes = 1000.0 + 4000.0 * jax.random.uniform(jax.random.fold_in(key, 2),
                                                  (N, S))
    p0 = jnp.concatenate([rows, cols, fluxes], axis=1)
    valid = jnp.ones((N, S), bool)
    base = prf.integrate_to_image(jnp.stack([rows[0], cols[0], fluxes[0]], 1),
                                  (h, w), 5.0)
    imgs = jnp.broadcast_to(base, (N, T, h, w)) + 1.0
    imgs = (imgs + 0.5 * jax.random.normal(jax.random.fold_in(key, 3),
                                           (N, T, h, w)))
    bkgs = jnp.zeros((N, T, h, w))
    mini = jnp.ones((N, h, w), bool)
    tidx = jnp.zeros((N,), jnp.int32)
    np.asarray(imgs[0, 0, 0])  # materialize inputs before timing

    def timed(fn, *a, reps=args.reps):
        out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])  # warmup + compile
        tic = time.perf_counter()
        for _ in range(reps):
            out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        return (time.perf_counter() - tic) / reps

    # --- full chunk ---------------------------------------------------------
    full_fn = functools.partial(fit_psf_timeseries_batch, prf=prf,
                                shape=(h, w), S=S)
    t_full = timed(lambda: full_fn(imgs, bkgs, 1.0, p0, valid, mini, tidx))

    # --- phase 2 only (warm LM over all N*T cadences) ------------------------
    fit_warm = make_psf_fitter(prf, (h, w), S, n_iters=LM_ITERS_WARM)

    @jax.jit
    def phase2(imgs, bkgs, p0):
        def one(img_t, bkg_t, p):
            return jax.vmap(lambda i, b: fit_warm(i, b, 1.0, p, valid[0])[0]
                            )(img_t, bkg_t)
        return jax.vmap(one)(imgs, bkgs, p0)

    t_phase2 = timed(lambda: phase2(imgs, bkgs, p0))

    # --- render only: model+jac pieces over the same (N, T) extent ----------
    @jax.jit
    def render_all(p0):
        def one_t(p):
            q, qr, qc = prf.render_separable_with_grads(
                p[:S], p[S:2 * S], (h, w), 5.0)
            return q.sum() + qr.sum() + qc.sum()
        return jax.vmap(lambda p: jnp.sum(jax.vmap(lambda _: one_t(p))(
            jnp.arange(T))))(p0)

    t_render = timed(lambda: render_all(p0))

    # --- LM algebra only: J build + normal equations + solve ----------------
    from photometry_tpu.ops.smallsolve import solve_spd_small
    q0 = jax.random.normal(jax.random.fold_in(key, 7), (N, T, h * w, 3 * S))
    r0 = jax.random.normal(jax.random.fold_in(key, 8), (N, T, h * w))

    @jax.jit
    def lm_algebra(J, r):
        JtJ = jnp.einsum("ntpi,ntpj->ntij", J, J)
        Jtr = jnp.einsum("ntpi,ntp->nti", J, r)
        dp = solve_spd_small(JtJ + 1e-3 * jnp.eye(3 * S), Jtr)
        return dp.sum()

    t_alg = timed(lambda: lm_algebra(q0, r0))

    rate = N / t_full
    print(json.dumps({
        "config": {"chunk": N, "T": T, "S": S, "side": h,
                   "backend": jax.default_backend()},
        "full_s": round(t_full, 4),
        "targets_per_s": round(rate, 1),
        "phase2_s": round(t_phase2, 4),
        "phase1_s_approx": round(max(t_full - t_phase2, 0.0), 4),
        "render_all_s": round(t_render, 4),
        "lm_algebra_1iter_s": round(t_alg, 4),
        "lm_algebra_x_warm_iters_s": round(t_alg * LM_ITERS_WARM, 4),
    }))


if __name__ == "__main__":
    main()
