"""Statistical bound on mask tie-break deltas vs the reference composition.

Our DBSCAN adopts border pixels deterministically (smallest adjacent
cluster label) where sklearn's is insertion-order dependent, and our
steepest-ascent watershed can differ from skimage flooding on plateau/ridge
pixels (TODO.md "Numerics").  Per-case containment is asserted in
test_parity_numerics; THIS test bounds the aggregate photometric impact:
1,000 random star stamps are segmented by both (a) the production
build_mask and (b) a faithful sklearn-DBSCAN + scipy-blur + skimage-
watershed composition of the reference algorithm (k2p2v2.py:344-633),
sharing the same threshold; the pixel- and flux-level delta distributions
are bounded.  The measured bound is quoted in PARITY.md.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from photometry_tpu.models.k2p2 import build_mask
from photometry_tpu.core.engine import DEFAULT_K2P2_PARAMS

N_STAMPS = 1000
H = W = 21
K = 4  # catalog slots


def _corpus(rng):
    """Random 1-3 star stamps + padded catalogs (background-subtracted).

    Also returns the injected per-star amplitude/sigma tables (amp 0 marks
    an empty slot) so the delivered-quality gate can compute the production
    completeness metric with truth fluxes.
    """
    imgs = np.zeros((N_STAMPS, H, W), np.float32)
    cat_col = np.full((N_STAMPS, K), 1e9, np.float32)
    cat_row = np.full((N_STAMPS, K), 1e9, np.float32)
    cat_tmag = np.full((N_STAMPS, K), 30.0, np.float32)
    cat_valid = np.zeros((N_STAMPS, K), bool)
    star_amp = np.zeros((N_STAMPS, K), np.float64)
    star_sigma = np.zeros((N_STAMPS, K), np.float64)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    for i in range(N_STAMPS):
        n_star = int(rng.integers(1, 4))
        amps = rng.uniform(80, 4000, n_star)
        amps[::-1].sort()
        for j in range(n_star):
            r = rng.uniform(5.0, H - 6.0)
            c = rng.uniform(5.0, W - 6.0)
            s = rng.uniform(1.0, 1.6)
            imgs[i] += (amps[j] * np.exp(
                -0.5 * ((yy - r) ** 2 + (xx - c) ** 2) / s ** 2)).astype(np.float32)
            cat_row[i, j] = r
            cat_col[i, j] = c
            cat_tmag[i, j] = rng.uniform(10.0, 14.0)  # faint: no overflow lanes
            cat_valid[i, j] = True
            star_amp[i, j] = amps[j]
            star_sigma[i, j] = s
        imgs[i] += rng.normal(0, 3.0, (H, W)).astype(np.float32)
    return imgs, cat_col, cat_row, cat_tmag, cat_valid, star_amp, star_sigma


def _flood_watershed(elev, markers, mask, connectivity: int = 1):
    """skimage.segmentation.watershed re-implemented faithfully (this image
    has no skimage): Vincent-Soille heap flooding — seeds pushed with their
    own elevation, neighbors labeled at push time, heap ordered by
    (elevation, insertion age) so ties resolve FIFO, default 4-connectivity
    — matching skimage's _watershed.pyx semantics."""
    import heapq
    Hh, Ww = elev.shape
    labels = np.where(mask, markers, 0).astype(np.int32)
    nbrs = ([(-1, 0), (1, 0), (0, -1), (0, 1)] if connectivity == 1 else
            [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
             if (dy, dx) != (0, 0)])
    heap = []
    age = 0
    for y, x in zip(*np.nonzero((markers > 0) & mask)):
        heapq.heappush(heap, (elev[y, x], age, int(y), int(x)))
        age += 1
    while heap:
        _, _, y, x = heapq.heappop(heap)
        lab = labels[y, x]
        for dy, dx in nbrs:
            ny, nx = y + dy, x + dx
            if (0 <= ny < Hh and 0 <= nx < Ww and mask[ny, nx]
                    and labels[ny, nx] == 0):
                labels[ny, nx] = lab
                heapq.heappush(heap, (elev[ny, nx], age, ny, nx))
                age += 1
    return labels


def _ref_mask(img, cut, cols, rows, tmags, valid, tr, tc):
    """Reference-composed mask: sklearn DBSCAN + scipy blur + flooding
    watershed + hole fill (k2p2v2.py:344-633 pipeline on one stamp)."""
    from scipy.ndimage import gaussian_filter, maximum_filter
    from sklearn.cluster import DBSCAN

    p = DEFAULT_K2P2_PARAMS
    above = np.isfinite(img) & (img > cut)
    lab_img = np.zeros((H, W), np.int32)
    ys, xs = np.nonzero(above)
    if len(ys):
        db = DBSCAN(eps=np.sqrt(2) + 1e-9, min_samples=p.min_for_cluster
                    ).fit(np.stack([xs, ys], axis=1))
        lab_img[ys, xs] = db.labels_ + 1
    above2 = above & (lab_img > 0)

    flux_above = np.where(above2, np.nan_to_num(img), 0.0)
    blur = gaussian_filter(flux_above.astype(np.float64), p.ws_blur,
                           mode="mirror", truncate=4.0)
    fp = np.ones((3, 3), bool)
    fp[1, 1] = False
    best = maximum_filter(blur, footprint=fp, mode="constant", cval=-np.inf)
    maxima = (blur >= best) & above2

    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    markers = np.zeros((H, W), np.int32)
    for k in range(K):
        if not valid[k]:
            continue
        d2 = np.where(maxima, (xx - cols[k]) ** 2 + (yy - rows[k]) ** 2, np.inf)
        i = int(np.argmin(d2))
        if not np.isfinite(d2.flat[i]):
            continue
        dist_factor = 2.0 if tmags[k] > 7.0 else 5.0
        if np.sqrt(d2.flat[i]) < dist_factor * np.sqrt(2.0):
            markers.flat[i] = k + 1
    seg = _flood_watershed(-blur, markers, above2)

    ti, tj = int(np.clip(round(tr), 0, H - 1)), int(np.clip(round(tc), 0, W - 1))
    lab = seg[ti, tj]
    mask = (seg == lab) & (lab > 0)
    found = (lab > 0) and mask.sum() >= p.min_no_pixels_in_mask
    # 4-neighbor hole fill (k2p2v2.py:546-557):
    m = mask.astype(float)
    pd = np.pad(m, 1)
    s = pd[:-2, 1:-1] + pd[2:, 1:-1] + pd[1:-1, :-2] + pd[1:-1, 2:]
    mask = mask | ((s > 3.8) & ~mask)
    if not found:
        mask = (np.abs(xx - tc) <= 1) & (np.abs(yy - tr) <= 1)
    return mask, found


@pytest.fixture(scope="module")
def corpus_run():
    """One shared corpus evaluation: our masks, reference-composed masks,
    and per-stamp pixel/flux deltas (the expensive part of this module)."""
    rng = np.random.default_rng(99)
    imgs, cat_col, cat_row, cat_tmag, cat_valid, star_amp, star_sigma = \
        _corpus(rng)
    cat_sid = np.arange(1, K + 1, dtype=np.int64)[None].repeat(N_STAMPS, 0)
    t_row = cat_row[:, 0]
    t_col = cat_col[:, 0]
    t_tmag = cat_tmag[:, 0]
    collected = np.ones((N_STAMPS, H, W), bool)

    fn = jax.jit(jax.vmap(lambda s, cc, cr, ct, cs, cv, tr, tc, tt, col:
                          build_mask(s, cc, cr, ct, cs, cv, tr, tc, tt, col,
                                     DEFAULT_K2P2_PARAMS, debug=True)))
    out = fn(jnp.asarray(imgs), jnp.asarray(cat_col), jnp.asarray(cat_row),
             jnp.asarray(cat_tmag), jnp.asarray(cat_sid),
             jnp.asarray(cat_valid), jnp.asarray(t_row), jnp.asarray(t_col),
             jnp.asarray(t_tmag), jnp.asarray(collected))
    ours = np.asarray(out["mask"])
    cuts = np.asarray(out["cut"])
    founds = np.asarray(out["found_mask"])

    pix_rate = np.full(N_STAMPS, np.nan)
    flux_delta = np.full(N_STAMPS, np.nan)
    for i in range(N_STAMPS):
        ref, ref_found = _ref_mask(imgs[i], cuts[i], cat_col[i], cat_row[i],
                                   cat_tmag[i], cat_valid[i],
                                   t_row[i], t_col[i])
        union = ours[i] | ref
        if union.sum() == 0:
            continue
        pix_rate[i] = (ours[i] ^ ref).sum() / union.sum()
        f_ours = float(imgs[i][ours[i]].sum())
        f_ref = float(imgs[i][ref].sum())
        flux_delta[i] = abs(f_ours - f_ref) / f_ref if f_ref > 0 else 0.0
    return dict(imgs=imgs, cat_col=cat_col, cat_row=cat_row,
                cat_tmag=cat_tmag, cat_valid=cat_valid, star_amp=star_amp,
                star_sigma=star_sigma, t_row=t_row, t_col=t_col, ours=ours,
                founds=founds, pix_rate=pix_rate, flux_delta=flux_delta)


@pytest.mark.slow
def test_tiebreak_delta_bound(corpus_run):
    cr = corpus_run
    classes = {"single": {"pix": [], "flux": []},
               "multi": {"pix": [], "flux": []}}
    for i in range(N_STAMPS):
        if not np.isfinite(cr["pix_rate"][i]):
            continue
        d = classes["single" if int(cr["cat_valid"][i].sum()) == 1 else "multi"]
        d["pix"].append(cr["pix_rate"][i])
        d["flux"].append(cr["flux_delta"][i])

    stats = {}
    for name, d in classes.items():
        p = np.array(d["pix"])
        f = np.array(d["flux"])
        stats[name] = {
            "stamps": len(p),
            "mean_pixel_diff_rate": float(p.mean()),
            "p99_pixel_diff_rate": float(np.percentile(p, 99)),
            "mean_flux_delta": float(f.mean()),
            "p99_flux_delta": float(np.percentile(f, 99)),
            "max_flux_delta": float(f.max()),
        }
        print(f"\ntie-break corpus [{name}]:",
              {k: round(v, 5) for k, v in stats[name].items()})

    # The documented bounds (PARITY.md "Mask tie-break bound"):
    #
    # 1. Isolated targets (one catalog star in the stamp) are EXACT — zero
    #    differing pixels across the corpus.  Threshold, DBSCAN, hole fill
    #    and fallback carry no tie-break or precision sensitivity at all.
    assert stats["single"]["stamps"] >= 300
    assert stats["single"]["max_flux_delta"] == 0.0
    assert stats["single"]["mean_pixel_diff_rate"] == 0.0
    # 2. Multi-star stamps: the pop-order watershed (maximin pop
    #    priorities + argmax-priority adoption, ops/labeling) reproduces
    #    the reference flood's split boundaries up to exact float ties in
    #    the pop priority — 0.038% of cluster pixels and p99 flux delta
    #    0.0 on the 10k corpus (tools/tiebreak_corpus_scale.py, PARITY.md).
    #    The bounds below are deliberately loose CI tripwires.
    assert stats["multi"]["mean_pixel_diff_rate"] < 0.005
    assert stats["multi"]["mean_flux_delta"] < 0.005
    assert stats["multi"]["p99_flux_delta"] < 0.02
    assert stats["multi"]["max_flux_delta"] < 0.10


@pytest.mark.slow
def test_delivered_blend_quality(corpus_run):
    """Delivered-light-curve gate (VERDICT r3 #4): with the dispatcher's
    deblend auto-switch (production predicate: a neighbour holding >= 10%
    of the target's flux within 6 px, or a truncated mask with any
    neighbour that close, re-runs as linPSF), the stamps DELIVERED as
    aperture must keep p99 |flux| delta vs the reference composition < 5%
    — the un-fixed corpus p99 is ~13% (max 23%, PARITY.md)."""
    from photometry_tpu.core.metrics import crowding_metrics_batch

    cr = corpus_run
    # Production completeness metric with truth fluxes (engine computes the
    # same from catalog tmags; the corpus' analytic star fluxes play the
    # catalog role here — its tmag slots are random corpus padding) at the
    # production default PSF sigma:
    flux_slots = (cr["star_amp"] * 2 * np.pi * cr["star_sigma"] ** 2
                  ).astype(np.float32)
    istgt = np.zeros_like(cr["cat_valid"])
    istgt[:, 0] = True
    cm = crowding_metrics_batch(
        jnp.asarray(cr["ours"], jnp.float32),
        jnp.asarray(cr["cat_row"], jnp.float32),
        jnp.asarray(cr["cat_col"], jnp.float32),
        jnp.asarray(flux_slots),
        jnp.asarray(cr["cat_valid"]), jnp.asarray(istgt),
        jnp.asarray(cr["t_row"], jnp.float32),
        jnp.asarray(cr["t_col"], jnp.float32),
        jnp.asarray(flux_slots[:, 0]), jnp.float32(1.25))
    comp = np.asarray(cm["completeness"])

    # nearest neighbour distances (px), inf when absent — 'any' and
    # 'significant' (>= 10% of the target's flux), as the engine records:
    near_any = np.full(N_STAMPS, np.inf)
    near_sig = np.full(N_STAMPS, np.inf)
    for i in range(N_STAMPS):
        v = cr["cat_valid"][i].copy()
        v[0] = False
        if not v.any():
            continue
        d = np.hypot(cr["cat_row"][i, v] - cr["t_row"][i],
                     cr["cat_col"][i, v] - cr["t_col"][i])
        near_any[i] = d.min()
        sig = flux_slots[i, v] >= 0.1 * flux_slots[i, 0]
        if sig.any():
            near_sig[i] = d[sig].min()

    multi = cr["cat_valid"].sum(axis=1) > 1
    ok = multi & cr["founds"].astype(bool) & np.isfinite(cr["flux_delta"])
    switch = ok & ((near_sig <= 6.0) | ((comp < 0.9) & (near_any <= 6.0)))
    delivered = ok & ~switch
    fd = cr["flux_delta"]
    print(f"\ndelivered-blend gate: {ok.sum()} blends, "
          f"{switch.sum()} auto-switched to linPSF "
          f"({100 * switch.sum() / max(ok.sum(), 1):.0f}%), "
          f"delivered p99 {np.percentile(fd[delivered], 99):.4f} "
          f"max {fd[delivered].max():.4f} "
          f"(unfixed p99 {np.percentile(fd[ok], 99):.4f} "
          f"max {fd[ok].max():.4f})")
    assert delivered.sum() >= 150
    assert switch.sum() >= 10, "the switch predicate never fires on the corpus"
    # the gate of record:
    assert np.percentile(fd[delivered], 99) < 0.05
    # and the switch must be catching the bad tail, not random stamps —
    # unless there IS no bad tail: with the pop-order watershed
    # (ops/labeling.watershed_segment) the corpus masks match the reference
    # flood exactly (p99 flux delta 0.0), so equality is the success case:
    assert (np.percentile(fd[ok], 99) < 0.01
            or np.percentile(fd[ok], 99) > np.percentile(fd[delivered], 99))
