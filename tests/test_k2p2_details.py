"""Focused K2P2 behavior tests: thresholds, saturated columns, fallbacks."""

import numpy as np
import pytest
import jax.numpy as jnp

from photometry_tpu.models.k2p2 import build_mask, K2P2Params


def _call(sumimage, stars, target_idx=0, params=K2P2Params(), collected=None):
    """stars: list of (row, col, tmag)."""
    K = max(len(stars), 4)
    cat_col = np.full(K, 1e9, np.float32)
    cat_row = np.full(K, 1e9, np.float32)
    cat_tmag = np.full(K, 30.0, np.float32)
    cat_valid = np.zeros(K, bool)
    cat_sid = np.zeros(K, np.int64)
    for i, (r, c, m) in enumerate(stars):
        cat_row[i], cat_col[i], cat_tmag[i] = r, c, m
        cat_valid[i] = True
        cat_sid[i] = i + 1
    tr, tc, tm = stars[target_idx]
    out = build_mask(jnp.asarray(sumimage, jnp.float32), jnp.asarray(cat_col),
                     jnp.asarray(cat_row), jnp.asarray(cat_tmag),
                     jnp.asarray(cat_sid), jnp.asarray(cat_valid),
                     jnp.float32(tr), jnp.float32(tc), jnp.float32(tm),
                     None if collected is None else jnp.asarray(collected),
                     params)
    return {k: np.asarray(v) for k, v in out.items()}


def _gauss_star(img, r, c, flux, sigma=1.2):
    H, W = img.shape
    yy, xx = np.mgrid[0:H, 0:W]
    img += flux * np.exp(-0.5 * ((yy - r) ** 2 + (xx - c) ** 2) / sigma ** 2) \
        / (2 * np.pi * sigma ** 2)


def test_basic_mask_found():
    rng = np.random.default_rng(0)
    img = rng.normal(0, 0.3, (21, 21))
    _gauss_star(img, 10, 10, 5000)
    out = _call(img, [(10.0, 10.0, 9.0)])
    assert out["found_mask"]
    assert out["mask"][10, 10]
    assert 8 <= out["mask_size"] <= 100
    assert not out["no_flux"]
    assert out["in_mask"][0]


def test_minimum_aperture_fallback_when_no_flux():
    rng = np.random.default_rng(1)
    img = rng.normal(0, 0.3, (15, 15))  # no star
    out = _call(img, [(7.0, 7.0, 14.0)])
    # Either no mask found -> 2x2-ish minimum aperture around the target:
    if not out["found_mask"]:
        assert 1 <= out["mask_size"] <= 9
        assert out["mask"][7, 7]


def test_saturated_column_extension():
    """A bright star with a flat-topped bleed column gets the column added."""
    rng = np.random.default_rng(2)
    img = rng.normal(0, 0.5, (31, 31)).astype(np.float64)
    _gauss_star(img, 15, 15, 3e6)  # very bright (tmag ~ 4.5)
    # Saturated bleed: clamp the core column to a flat level over many rows:
    img[5:27, 15] = 50000.0
    out_ext = _call(img, [(15.0, 15.0, 4.5)],
                    params=K2P2Params(extend_overflow=True))
    out_no = _call(img, [(15.0, 15.0, 4.5)],
                   params=K2P2Params(extend_overflow=False))
    assert out_ext["found_mask"] and out_no["found_mask"]
    # The extension must add the bleed rows of column 15:
    assert out_ext["mask"][:, 15].sum() >= out_no["mask"][:, 15].sum()
    assert out_ext["mask"][6, 15] and out_ext["mask"][26, 15]


def test_overflow_gated_on_brightness():
    """Faint targets (combined mag > 7) never get overflow extension:
    the mask is identical whether or not extension is enabled."""
    rng = np.random.default_rng(3)
    img = rng.normal(0, 0.5, (31, 31))
    _gauss_star(img, 15, 15, 2000)
    img[12:19, 15] = 400.0  # small flat-topped core (tmag 12 -> gate closed)
    out_ext = _call(img, [(15.0, 15.0, 12.0)],
                    params=K2P2Params(extend_overflow=True))
    out_no = _call(img, [(15.0, 15.0, 12.0)],
                   params=K2P2Params(extend_overflow=False))
    np.testing.assert_array_equal(out_ext["mask"], out_no["mask"])


def test_two_stars_segmented():
    rng = np.random.default_rng(4)
    img = rng.normal(0, 0.3, (25, 25))
    _gauss_star(img, 12, 8, 4000)
    _gauss_star(img, 12, 16, 4000)
    out_a = _call(img, [(12.0, 8.0, 10.0), (12.0, 16.0, 10.0)], target_idx=0)
    out_b = _call(img, [(12.0, 8.0, 10.0), (12.0, 16.0, 10.0)], target_idx=1)
    assert out_a["found_mask"] and out_b["found_mask"]
    assert out_a["mask"][12, 8] and not out_a["mask"][12, 16]
    assert out_b["mask"][12, 16] and not out_b["mask"][12, 8]
    # Each star's mask excludes the other -> in_mask reflects that:
    assert out_a["in_mask"][0] and not out_a["in_mask"][1]


def test_edge_flags():
    rng = np.random.default_rng(5)
    img = rng.normal(0, 0.3, (17, 17))
    _gauss_star(img, 2, 8, 5000)  # near the bottom edge
    out = _call(img, [(2.0, 8.0, 9.0)])
    assert out["edge"][0]  # bottom edge touched
    assert not out["edge"][1]


def test_clean_background_clump_mode_not_below_data():
    """A well-subtracted stamp has its positive pixels in a tight clump
    near zero plus a wide star tail.  The coarse KDE grid spacing then
    exceeds the Scott bandwidth and the coarse argmax can land BELOW all
    data, where the guarded Newton step freezes; the mode must still land
    inside the noise clump so the below-mode MAD (and so the cut) stays
    finite and a real mask is found (the failure produced NaN cuts and
    2x2 fallback masks on clean pipeline sum images; reference behavior
    k2p2v2.py:401-427 refines with a Powell minimizer)."""
    rng = np.random.default_rng(5)
    img = rng.normal(0.0, 0.08, (15, 15))   # clean background, half <= 0
    _gauss_star(img, 7, 7, 3000, sigma=1.0)
    _gauss_star(img, 12, 5, 1200, sigma=1.0)

    from photometry_tpu.models.k2p2 import _threshold
    cut, bw, any_flux = _threshold(jnp.asarray(img, jnp.float32),
                                   K2P2Params(thresh=0.8))
    assert np.isfinite(float(cut))
    assert bool(any_flux)

    params = K2P2Params(thresh=0.8, min_no_pixels_in_mask=4,
                        min_for_cluster=4, ws_blur=0.5, ws_thres=0.0,
                        ws_footprint=3, segmentation=True,
                        extend_overflow=True)
    out = _call(img, [(7.0, 7.0, 10.7), (12.0, 5.0, 11.4)], params=params)
    assert out["found_mask"], "mask must not fall back to the 2x2 minimum"
    assert out["mask_size"] >= 15
    assert out["mask"][7, 7]


def test_mask_robustness_fuzz():
    """Randomized stamp corpus: every high-SNR target must get a real mask
    containing its position, and the threshold must never go NaN — across
    noise scales spanning 300x, background offsets, PSF widths 0.9-1.6 px
    and random near neighbors (the corpus family that exposed the
    clean-stamp KDE-mode freeze)."""
    from photometry_tpu.models.k2p2 import build_masks_batch

    params = K2P2Params(thresh=0.8, min_no_pixels_in_mask=4,
                        min_for_cluster=4, ws_blur=0.5, ws_thres=0.0,
                        ws_footprint=3, segmentation=True,
                        extend_overflow=True)
    H = W = 17
    N, K = 128, 4
    imgs = np.zeros((N, H, W), np.float32)
    cc = np.full((N, K), 1e9, np.float32); cr = np.full((N, K), 1e9, np.float32)
    ct = np.full((N, K), 30.0, np.float32); cv = np.zeros((N, K), bool)
    cs = np.zeros((N, K), np.int64)
    tr = np.zeros(N, np.float32); tc = np.zeros(N, np.float32)
    tt = np.zeros(N, np.float32); snrs = np.zeros(N)
    for t in range(N):
        rng = np.random.default_rng(t)
        noise = float(rng.choice([0.02, 0.08, 0.3, 1.5, 6.0]))
        img = rng.normal(0.0, noise, (H, W))
        img += float(rng.choice([0.0, -0.5, 0.5, 3.0]))
        tmag = rng.uniform(8.0, 13.5)
        flux = 10 ** (-0.4 * (tmag - 20.451)) / 12
        sig = rng.uniform(0.9, 1.6)
        r0 = H / 2 + rng.uniform(-0.5, 0.5)
        c0 = W / 2 + rng.uniform(-0.5, 0.5)
        _gauss_star(img, r0, c0, flux, sigma=sig)
        stars = [(r0, c0, tmag)]
        if rng.random() < 0.5:
            dist = rng.uniform(3.0, 8.0); ang = rng.uniform(0, 2 * np.pi)
            r1, c1 = r0 + dist * np.sin(ang), c0 + dist * np.cos(ang)
            tm1 = tmag + rng.uniform(-1, 2)
            if 1 <= r1 < H - 1 and 1 <= c1 < W - 1:
                _gauss_star(img, r1, c1, 10 ** (-0.4 * (tm1 - 20.451)) / 12)
                stars.append((r1, c1, tm1))
        imgs[t] = img
        for i, (r, c, m) in enumerate(stars):
            cr[t, i], cc[t, i], ct[t, i], cv[t, i], cs[t, i] = r, c, m, True, i + 1
        tr[t], tc[t], tt[t] = r0, c0, tmag
        snrs[t] = flux / (2 * np.pi * sig ** 2) / noise

    out = build_masks_batch(jnp.asarray(imgs), jnp.asarray(cc), jnp.asarray(cr),
                            jnp.asarray(ct), jnp.asarray(cs), jnp.asarray(cv),
                            jnp.asarray(tr), jnp.asarray(tc), jnp.asarray(tt),
                            params=params)
    cut = np.asarray(out["cut"]); found = np.asarray(out["found_mask"])
    masks = np.asarray(out["mask"])
    for t in range(N):
        assert np.isfinite(cut[t]), f"trial {t}: NaN threshold"
        if snrs[t] > 30:
            assert found[t], f"trial {t}: no mask at SNR {snrs[t]:.0f}"
            assert masks[t, int(round(tr[t])), int(round(tc[t]))], \
                f"trial {t}: target outside its mask"


def test_batch_pipeline_matches_per_stamp_vmap():
    """build_masks_batch (batch-last label stages, core restructure for TPU
    lane utilization) is bit-identical to a plain vmap of build_mask."""
    import jax
    from photometry_tpu.models.k2p2 import build_mask, build_masks_batch

    params = K2P2Params(thresh=0.8, min_no_pixels_in_mask=4,
                        min_for_cluster=4, ws_blur=0.5, ws_thres=0.0,
                        ws_footprint=3, segmentation=True,
                        extend_overflow=True)
    H = W = 17
    N, K = 64, 4
    rng = np.random.default_rng(5)
    imgs = rng.normal(0, 1.5, (N, H, W)).astype(np.float32)
    cc = np.full((N, K), 1e9, np.float32); cr = np.full((N, K), 1e9, np.float32)
    ct = np.full((N, K), 30.0, np.float32); cv = np.zeros((N, K), bool)
    cs = np.zeros((N, K), np.int64)
    tr = np.zeros(N, np.float32); tc = np.zeros(N, np.float32)
    tt = np.zeros(N, np.float32)
    for t in range(N):
        ns = int(rng.integers(1, 4))
        for i in range(ns):
            r, c = rng.uniform(3, H - 4, 2)
            _gauss_star(imgs[t], r, c, rng.uniform(300, 60000))
            cr[t, i], cc[t, i], ct[t, i] = r, c, rng.uniform(6.0, 13.0)
            cv[t, i], cs[t, i] = True, i + 1
        tr[t], tc[t], tt[t] = cr[t, 0], cc[t, 0], ct[t, 0]
    args = tuple(jnp.asarray(a) for a in
                 (imgs, cc, cr, ct, cs, cv, tr, tc, tt))
    coll = jnp.ones((N, H, W), bool)

    batched = build_masks_batch(*args, collected=coll, params=params)
    ref = jax.vmap(lambda s, a1, a2, a3, a4, a5, a6, a7, a8, col: build_mask(
        s, a1, a2, a3, a4, a5, a6, a7, a8, col, params))(*args, coll)
    for key in ("mask", "found_mask", "no_flux", "edge", "in_mask", "mask_size"):
        np.testing.assert_array_equal(np.asarray(batched[key]),
                                      np.asarray(ref[key]), err_msg=key)
    # The cut may differ at the last ulp: XLA fuses the threshold reductions
    # differently in the two programs (bit-stability across compilations is
    # not an XLA guarantee).  The discrete outputs above are what must (and
    # do) agree exactly.
    np.testing.assert_allclose(np.asarray(batched["cut"]),
                               np.asarray(ref["cut"]), rtol=3e-6)
