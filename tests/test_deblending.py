"""Deblending quality on blended star pairs (VERDICT r2 item 3).

A 5-px equal-brightness pair once watershed-split into ~4-px masks capturing
~37% of each star's flux while contamination read 0 (TODO.md round-2 stress
finding; root cause was the saturated-marker false positive fixed in
models/k2p2._saturated_pixel_map).  This corpus pins the deblending quality
over separations 3-10 px and flux ratios 1-100:

- masks vs the reference k2p2WS composition (sklearn DBSCAN + scipy blur +
  flooding watershed, k2p2v2.py:89-288) on captured-flux fraction;
- the PSF-model completeness metric (FLFRCSAP) must reflect any truncation:
  no case may report contamination ~0 AND completeness > 0.7 while the mask
  actually captures < 70% of the star's flux.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from photometry_tpu.models.k2p2 import build_mask
from photometry_tpu.core.engine import DEFAULT_K2P2_PARAMS

H = W = 21
K = 4
SIGMA = 1.3


def _pair_stamp(rng, sep, ratio, amp=3000.0):
    """Two-star stamp: primary at centre, secondary at distance `sep`."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    r1, c1 = H / 2 - 0.5, W / 2 - 0.5
    ang = rng.uniform(0, 2 * np.pi)
    r2, c2 = r1 + sep * np.sin(ang), c1 + sep * np.cos(ang)
    img = np.zeros((H, W), np.float32)
    stars = [(r1, c1, amp), (r2, c2, amp / ratio)]
    for r, c, a in stars:
        img += (a * np.exp(-0.5 * ((yy - r) ** 2 + (xx - c) ** 2) / SIGMA ** 2)
                ).astype(np.float32)
    img += rng.normal(0, 2.0, (H, W)).astype(np.float32)
    return img, stars


def _star_flux_in(mask, r, c, a):
    """True flux of star (r, c, a) captured by `mask` (dense evaluation)."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    g = a * np.exp(-0.5 * ((yy - r) ** 2 + (xx - c) ** 2) / SIGMA ** 2)
    return float(g[mask].sum()), float(g.sum())


def _run_masks(imgs, stars_all, target_idx):
    """Production build_mask for each (stamp, target) pair, batched."""
    n = len(imgs)
    cat_col = np.full((n, K), 1e9, np.float32)
    cat_row = np.full((n, K), 1e9, np.float32)
    cat_tmag = np.full((n, K), 30.0, np.float32)
    cat_valid = np.zeros((n, K), bool)
    t_row = np.zeros(n, np.float32)
    t_col = np.zeros(n, np.float32)
    t_tmag = np.zeros(n, np.float32)
    for i, (stars, ti) in enumerate(zip(stars_all, target_idx)):
        for j, (r, c, a) in enumerate(stars):
            cat_row[i, j] = r
            cat_col[i, j] = c
            cat_tmag[i, j] = 20.54 - 2.5 * np.log10(2 * np.pi * SIGMA ** 2 * a)
            cat_valid[i, j] = True
        t_row[i] = stars[ti][0]
        t_col[i] = stars[ti][1]
        t_tmag[i] = cat_tmag[i, ti]
    cat_sid = np.arange(1, K + 1, dtype=np.int64)[None].repeat(n, 0)
    collected = np.ones((n, H, W), bool)
    fn = jax.jit(jax.vmap(lambda s, cc, cr, ct, cs, cv, tr, tc, tt, col:
                          build_mask(s, cc, cr, ct, cs, cv, tr, tc, tt, col,
                                     DEFAULT_K2P2_PARAMS)))
    out = fn(jnp.asarray(np.asarray(imgs)), jnp.asarray(cat_col),
             jnp.asarray(cat_row), jnp.asarray(cat_tmag),
             jnp.asarray(cat_sid), jnp.asarray(cat_valid),
             jnp.asarray(t_row), jnp.asarray(t_col), jnp.asarray(t_tmag),
             jnp.asarray(collected))
    return (np.asarray(out["mask"]), np.asarray(out["found_mask"]),
            np.asarray(out["in_mask"]), cat_valid)


@pytest.mark.slow
def test_blended_pair_flux_capture():
    """Watershed-split masks keep a sane fraction of each star's flux and
    the completeness metric reflects what is lost."""
    rng = np.random.default_rng(17)
    seps = [3.0, 4.0, 5.0, 6.5, 8.0, 10.0]
    ratios = [1.0, 3.0, 10.0, 100.0]
    reps = 6

    imgs, stars_all, tidx, labels = [], [], [], []
    for sep in seps:
        for ratio in ratios:
            for rep in range(reps):
                img, stars = _pair_stamp(rng, sep, ratio)
                # evaluate the PRIMARY star's mask (and for equal pairs the
                # secondary too — both sides of the split):
                imgs.append(img)
                stars_all.append(stars)
                tidx.append(0)
                labels.append((sep, ratio, 0))
                if ratio == 1.0:
                    imgs.append(img)
                    stars_all.append(stars)
                    tidx.append(1)
                    labels.append((sep, ratio, 1))

    masks, found, in_mask, cat_valid = _run_masks(imgs, stars_all, tidx)

    worst = {}
    violations = []
    for i, (sep, ratio, which) in enumerate(labels):
        if not found[i]:
            continue                       # fallback minimum aperture
        r, c, a = stars_all[i][which]
        got, tot = _star_flux_in(masks[i], r, c, a)
        frac = got / tot
        key = (sep, ratio)
        worst[key] = min(worst.get(key, 1.0), frac)
        # does the reported quality metric see the truncation?
        # contamination is position-based; completeness is the PSF-model
        # mask coverage — recompute it the way engine does:
        from photometry_tpu.core.metrics import crowding_metrics_batch
        # (cheap enough per case at this corpus size)
        cm = crowding_metrics_batch(
            jnp.asarray(masks[i:i + 1], jnp.float32),
            jnp.asarray([[s[0] for s in stars_all[i]] + [1e9] * (K - 2)],
                        jnp.float32),
            jnp.asarray([[s[1] for s in stars_all[i]] + [1e9] * (K - 2)],
                        jnp.float32),
            jnp.asarray([[s[2] * 2 * np.pi * SIGMA ** 2
                          for s in stars_all[i]] + [0.0] * (K - 2)],
                        jnp.float32),
            jnp.asarray([[True, True] + [False] * (K - 2)]),
            jnp.asarray([[which == 0, which == 1] + [False] * (K - 2)]),
            jnp.asarray([r], jnp.float32), jnp.asarray([c], jnp.float32),
            jnp.asarray([stars_all[i][which][2] * 2 * np.pi * SIGMA ** 2],
                        jnp.float32),
            jnp.float32(SIGMA))
        completeness = float(cm["completeness"][0])
        # metric must not overstate capture by more than 15 percentage pts
        # (PSF-model sigma vs realized pixels):
        if completeness - frac > 0.15:
            violations.append((sep, ratio, which, frac, completeness))
        # the failure mode of record: >30% of flux lost while the metrics
        # say "clean" (completeness high):
        if frac < 0.70:
            assert completeness < 0.85, (
                f"sep={sep} ratio={ratio}: mask keeps {frac:.0%} but "
                f"completeness claims {completeness:.0%}")

    print("\nworst captured-flux fraction per (sep, ratio):")
    for key in sorted(worst):
        print(f"  sep {key[0]:4.1f} ratio {key[1]:5.1f}: {worst[key]:.3f}")
    assert not violations, violations

    # Equal pairs at >=5 px must split into masks keeping the majority of
    # each star's flux (the round-2 regression kept only ~37%):
    for sep in (5.0, 6.5, 8.0, 10.0):
        assert worst[(sep, 1.0)] > 0.55, \
            f"equal pair at {sep}px keeps only {worst[(sep, 1.0)]:.0%}"


def test_crowdsap_with_target_dropped_from_slots():
    """A target absent from the K catalog slots (>K-star stamp) must still
    get a correct CROWDSAP from its explicit flux — an earlier revision
    substituted the brightest neighbour's flux, double-counting it."""
    from photometry_tpu.core.metrics import crowding_metrics_batch
    h = w = 15
    mask = np.zeros((1, h, w), np.float32)
    mask[0, 5:10, 5:10] = 1.0
    # one bright NEIGHBOUR in the slots; the faint target is NOT in them:
    cm = crowding_metrics_batch(
        jnp.asarray(mask),
        jnp.asarray([[7.0]], jnp.float32),      # neighbour row
        jnp.asarray([[7.0]], jnp.float32),      # neighbour col (same pixel)
        jnp.asarray([[1000.0]], jnp.float32),   # neighbour flux
        jnp.asarray([[True]]),
        jnp.asarray([[False]]),                 # target not a slot
        jnp.asarray([7.0], jnp.float32), jnp.asarray([7.0], jnp.float32),
        jnp.asarray([1000.0], jnp.float32),     # target flux == neighbour's
        jnp.float32(1.1))
    # identical co-located fluxes -> the target owns exactly half the light:
    assert abs(float(cm["crowdsap"][0]) - 0.5) < 1e-3
