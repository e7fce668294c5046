#!/usr/bin/env python3
"""Corpus-scale evidence for the watershed tie-break bound (VERDICT r4 #8).

Scales the tests/test_tiebreak_corpus.py experiment to ~10,000 stamps and
adds the decisive control: the reference's OWN flood re-run with a
different — but equally valid — tie order.  skimage's watershed floods a
heap ordered by (elevation, insertion age) (k2p2v2.py:227 via
skimage.segmentation.watershed); FIFO age is an implementation accident,
not a specification.  Re-flooding with LIFO age (and reversed neighbor
scan order) measures how many cluster pixels the reference itself would
move under an arbitrary tie-order change.  If our deterministic
steepest-ascent rule disagrees with the FIFO flood at ~the same rate the
LIFO flood does, the disagreement is the intrinsic plateau/ridge ambiguity
of the algorithm — no deterministic parallel rule can beat it, because the
"truth" itself is not unique at those pixels.

Usage:
    python tools/tiebreak_corpus_scale.py [N_STAMPS] [--jax-platform cpu]

Writes one JSON summary line; runtime ~minutes at N=10,000 on one core.
"""

import importlib.util
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_corpus_module():
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tests", "test_tiebreak_corpus.py")
    spec = importlib.util.spec_from_file_location("tiebreak_corpus", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _flood_watershed_lifo(elev, markers, mask, connectivity: int = 1):
    """The same Vincent-Soille heap flood, with the OTHER valid tie order:
    LIFO insertion age and reversed neighbor scan.  Any (elevation, age)
    priority is a legal watershed; differences vs the FIFO flood are pixels
    whose label is tie-order-dependent even inside the reference."""
    import heapq
    Hh, Ww = elev.shape
    labels = np.where(mask, markers, 0).astype(np.int32)
    nbrs = ([(0, 1), (0, -1), (1, 0), (-1, 0)] if connectivity == 1 else
            [(dy, dx) for dy in (1, 0, -1) for dx in (1, 0, -1)
             if (dy, dx) != (0, 0)])
    heap = []
    age = 0
    for y, x in zip(*np.nonzero((markers > 0) & mask)):
        heapq.heappush(heap, (elev[y, x], -age, int(y), int(x)))
        age += 1
    while heap:
        _, _, y, x = heapq.heappop(heap)
        lab = labels[y, x]
        for dy, dx in nbrs:
            ny, nx = y + dy, x + dx
            if (0 <= ny < Hh and 0 <= nx < Ww and mask[ny, nx]
                    and labels[ny, nx] == 0):
                labels[ny, nx] = lab
                heapq.heappush(heap, (elev[ny, nx], -age, ny, nx))
                age += 1
    return labels


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    platform = "cpu"
    if "--jax-platform" in argv:
        i = argv.index("--jax-platform")
        platform = argv[i + 1]
        del argv[i:i + 2]
    n_total = int(argv[0]) if argv else 10000

    import jax
    jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp

    tb = _load_corpus_module()
    from photometry_tpu.models.k2p2 import build_mask
    from photometry_tpu.core.engine import DEFAULT_K2P2_PARAMS

    CHUNK = 1000                       # one compiled batch shape, reused
    tb.N_STAMPS = CHUNK
    H, W, K = tb.H, tb.W, tb.K

    fn = jax.jit(jax.vmap(lambda s, cc, cr, ct, cs, cv, tr, tc, tt, col:
                          build_mask(s, cc, cr, ct, cs, cv, tr, tc, tt, col,
                                     DEFAULT_K2P2_PARAMS, debug=True)))

    # Aggregates.  "cluster pixel" denominators follow PARITY.md: pixels in
    # the union of the two masks being compared.
    agg = {
        "single_exact": 0, "single_total": 0,
        "multi_total": 0,
        "ours_diff_pix": 0, "ours_union_pix": 0,
        "ref_selfdiff_pix": 0, "ref_union_pix": 0,
        "flux_delta": [], "ref_self_flux_delta": [],
    }

    done = 0
    chunk_idx = 0
    while done < n_total:
        rng = np.random.default_rng(10_000 + chunk_idx)
        imgs, cat_col, cat_row, cat_tmag, cat_valid, _, _ = tb._corpus(rng)
        cat_sid = np.arange(1, K + 1, dtype=np.int64)[None].repeat(CHUNK, 0)
        t_row, t_col, t_tmag = cat_row[:, 0], cat_col[:, 0], cat_tmag[:, 0]
        collected = np.ones((CHUNK, H, W), bool)
        out = fn(jnp.asarray(imgs), jnp.asarray(cat_col), jnp.asarray(cat_row),
                 jnp.asarray(cat_tmag), jnp.asarray(cat_sid),
                 jnp.asarray(cat_valid), jnp.asarray(t_row),
                 jnp.asarray(t_col), jnp.asarray(t_tmag),
                 jnp.asarray(collected))
        ours = np.asarray(out["mask"])
        cuts = np.asarray(out["cut"])

        for i in range(CHUNK):
            if done + i >= n_total:
                break
            multi = int(cat_valid[i].sum()) > 1
            ref, _ = tb._ref_mask(imgs[i], cuts[i], cat_col[i], cat_row[i],
                                  cat_tmag[i], cat_valid[i], t_row[i], t_col[i])
            union = ours[i] | ref
            nu = int(union.sum())
            if nu == 0:
                continue
            ndiff = int((ours[i] ^ ref).sum())
            if not multi:
                agg["single_total"] += 1
                agg["single_exact"] += int(ndiff == 0)
                continue
            agg["multi_total"] += 1
            agg["ours_diff_pix"] += ndiff
            agg["ours_union_pix"] += nu
            f_ref = float(imgs[i][ref].sum())
            if f_ref > 0:
                agg["flux_delta"].append(
                    abs(float(imgs[i][ours[i]].sum()) - f_ref) / f_ref)

            # Reference self-disagreement under the alternate tie order,
            # through the same target-label + hole-fill decoration:
            ref2 = _ref_mask_with_flood(tb, imgs[i], cuts[i], cat_col[i],
                                        cat_row[i], cat_tmag[i], cat_valid[i],
                                        t_row[i], t_col[i])
            u2 = ref | ref2
            agg["ref_selfdiff_pix"] += int((ref ^ ref2).sum())
            agg["ref_union_pix"] += int(u2.sum())
            if f_ref > 0:
                agg["ref_self_flux_delta"].append(
                    abs(float(imgs[i][ref2].sum()) - f_ref) / f_ref)
        done += CHUNK
        chunk_idx += 1
        print(f"  {min(done, n_total)}/{n_total} stamps...", file=sys.stderr)

    fd = np.asarray(agg["flux_delta"])
    sd = np.asarray(agg["ref_self_flux_delta"])
    result = {
        "n_stamps": n_total,
        "single_star": {"stamps": agg["single_total"],
                        "exact": agg["single_exact"]},
        "multi_star": {
            "stamps": agg["multi_total"],
            "ours_vs_flood_pixel_rate":
                agg["ours_diff_pix"] / max(agg["ours_union_pix"], 1),
            "flood_self_disagreement_rate":
                agg["ref_selfdiff_pix"] / max(agg["ref_union_pix"], 1),
            "ours_flux_delta_mean": float(fd.mean()) if len(fd) else None,
            "ours_flux_delta_p99": float(np.percentile(fd, 99)) if len(fd) else None,
            "flood_self_flux_delta_mean": float(sd.mean()) if len(sd) else None,
            "flood_self_flux_delta_p99": float(np.percentile(sd, 99)) if len(sd) else None,
        },
    }
    print(json.dumps(result))
    return result


def _ref_mask_with_flood(tb, img, cut, cols, rows, tmags, valid, tr, tc):
    """tb._ref_mask with the LIFO flood substituted (same decoration)."""
    orig = tb._flood_watershed
    tb._flood_watershed = _flood_watershed_lifo
    try:
        mask, _ = tb._ref_mask(img, cut, cols, rows, tmags, valid, tr, tc)
    finally:
        tb._flood_watershed = orig
    return mask


if __name__ == "__main__":
    main()
