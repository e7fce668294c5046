#!/usr/bin/env python
"""Stage-level TPU profile of the K2P2 batched mask builder.

VERDICT r2 item 2: mask building is 0.24 s of the 0.47 s full-sector wall.
This times each internal stage of models/k2p2.build_mask separately on a
production-shaped batch (2048 stamps of 17x17, the bench chunk), so the
kernel-optimisation effort lands on the stage that actually costs.

Run on an idle host (never while a pytest suite runs — CLAUDE.md):
    python tools/profile_k2p2.py            # real TPU (axon default)
    python tools/profile_k2p2.py --cpu
"""

import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("-n", type=int, default=2048, help="stamps per batch")
    ap.add_argument("--hw", type=int, default=17, help="stamp side")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import functools

    from photometry_tpu.models import k2p2
    from photometry_tpu.ops.filters import gaussian_blur2d
    from photometry_tpu.ops.labeling import (dbscan_labels, label_components,
                                             watershed_segment)
    from photometry_tpu.core.engine import DEFAULT_K2P2_PARAMS as P

    N, hw = args.n, args.hw
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:hw, 0:hw].astype(np.float64)
    imgs = rng.normal(0, 1.5, (N, hw, hw)).astype(np.float32)
    K = 8
    cat_col = np.full((N, K), 1e9, np.float32)
    cat_row = np.full((N, K), 1e9, np.float32)
    cat_tmag = np.full((N, K), 30.0, np.float32)
    cat_valid = np.zeros((N, K), bool)
    for i in range(N):
        ns = int(rng.integers(1, 4))
        for j in range(ns):
            r = rng.uniform(4, hw - 5)
            c = rng.uniform(4, hw - 5)
            a = rng.uniform(100, 4000)
            imgs[i] += (a * np.exp(-0.5 * ((yy - r) ** 2 + (xx - c) ** 2) / 1.3 ** 2)
                        ).astype(np.float32)
            cat_row[i, j] = r
            cat_col[i, j] = c
            cat_tmag[i, j] = 12.0
            cat_valid[i, j] = True
    t_row = cat_row[:, 0].copy()
    t_col = cat_col[:, 0].copy()
    t_tmag = cat_tmag[:, 0].copy()
    cat_sid = np.arange(1, K + 1, dtype=np.int64)[None].repeat(N, 0)
    coll = np.ones((N, hw, hw), bool)

    dev = {k: jnp.asarray(v) for k, v in dict(
        imgs=imgs, cat_col=cat_col, cat_row=cat_row, cat_tmag=cat_tmag,
        cat_sid=cat_sid, cat_valid=cat_valid, t_row=t_row, t_col=t_col,
        t_tmag=t_tmag, coll=coll).items()}

    def timed(name, fn, *a):
        out = fn(*a)                       # compile
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ts = []
        for _ in range(args.reps):
            tic = time.perf_counter()
            out = fn(*a)
            np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
            ts.append(time.perf_counter() - tic)
        print(f"{name:34s} {1e3 * float(np.median(ts)):8.2f} ms")
        return out

    # full pipeline
    full = jax.jit(jax.vmap(lambda s, cc, cr, ct, cs, cv, tr, tc, tt, col:
                            k2p2.build_mask(s, cc, cr, ct, cs, cv, tr, tc,
                                            tt, col, P)))
    timed("build_mask (full)", full, dev["imgs"], dev["cat_col"],
          dev["cat_row"], dev["cat_tmag"], dev["cat_sid"], dev["cat_valid"],
          dev["t_row"], dev["t_col"], dev["t_tmag"], dev["coll"])

    # stage: threshold (KDE mode + MAD)
    thr = jax.jit(jax.vmap(lambda s: k2p2._threshold(s, P)))
    cut = timed("threshold (KDE mode + MAD)", thr, dev["imgs"])[0]

    above = jnp.isfinite(dev["imgs"]) & (dev["imgs"] > cut[:, None, None]) & dev["coll"]
    abT = jnp.transpose(above, (1, 2, 0))  # batch-last

    dbs = jax.jit(lambda a: dbscan_labels(a, min_samples=P.min_for_cluster))
    labT = timed("dbscan_labels (batch-last)", dbs, abT)

    lab = jnp.transpose(labT, (2, 0, 1))
    above2 = above & (lab > 0)

    blur = jax.jit(jax.vmap(lambda s, a2: gaussian_blur2d(
        jnp.where(a2, jnp.nan_to_num(s), 0.0), P.ws_blur)))
    blurred = timed("gaussian blur", blur, dev["imgs"], above2)

    lm = jax.jit(jax.vmap(lambda b, a2: k2p2._local_maxima(
        jnp.where(a2, b, -jnp.inf), P.ws_footprint, P.ws_thres)))
    timed("local maxima", lm, blurred, above2)

    mk = jax.jit(jax.vmap(lambda b, a2, cc, cr, ct, cv: k2p2._catalog_markers(
        b, a2, cc, cr, ct, cv, P)))
    markers = timed("catalog markers", mk, blurred, above2, dev["cat_col"],
                    dev["cat_row"], dev["cat_tmag"], dev["cat_valid"])

    ws = jax.jit(lambda b, m, a: watershed_segment(b, m, a, connectivity=1))
    timed("watershed (batch-last)", ws,
          jnp.transpose(blurred, (1, 2, 0)),
          jnp.transpose(markers, (1, 2, 0)),
          jnp.transpose(above2, (1, 2, 0)))

    sat = jax.jit(jax.vmap(k2p2._saturated_pixel_map))
    timed("saturated map", sat, dev["imgs"], above2)

    fh = jax.jit(jax.vmap(k2p2._fill_holes_4))
    timed("fill holes", fh, above2)


if __name__ == "__main__":
    main()
